package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, n)` — the DISTINCT sorted md5-leading-60-bit
  * hashes of a document's n-character shingles, computed PER ROW as a
  * native codegen expression. The decontamination primitive: exact
  * n-gram overlap between a training corpus and an eval set needs only
  * "how many distinct shingles do the two documents share", and a
  * 60-bit hash equi-join computes exactly that count on both engines
  * (DuckDB twin: `('0x' || substr(md5(substr(text, i, n)), 1, 15))
  * ::BIGINT` — the same head-60 convention as [[MinhashSigs]], so a
  * hash collision is part of the SPEC, not a divergence; at 2^-60 per
  * pair it never fires at any real corpus size).
  *
  * Why an expression and not explode→substring→md5→distinct: the
  * explode shape allocates a 12-char UTF8String per corpus CHARACTER
  * and dedupes (train_doc, eval_doc, shingle) STRING rows after the
  * join — at a ~78% shingle match rate (boilerplate-heavy corpora)
  * that "matched sliver" is most of the corpus, and the distinct
  * shuffles it. Here dedup happens in-row (sort + unique on a long[]),
  * the array is returned UNboxed (UnsafeArrayData), the join probes
  * 8-byte longs, and the downstream pair count partial-aggregates
  * map-side — nothing wider than (doc_a, doc_b, count) ever shuffles.
  *
  * Shingle positions are 1..max(chars−(n−1), 1) with the final shingle
  * clipped at the text end, exactly like `substring(text, i, n)` (and
  * like [[MinhashSigs]] at n=5). Empty text hashes the empty shingle;
  * null text or null n → null.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (string, int), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, n: Any): Any = {
    val width = n match {
      case i: Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
    }
    ShingleHashes.compute(t.asInstanceOf[UTF8String], width)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.ShingleHashes.compute($t, (int)($n))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {

  /** Leading 60 bits of an md5 digest — the integer value of the first
    * 15 hex characters (same convention as [[MinhashSigs]]). */
  private def head60(d: Array[Byte]): Long = {
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
    (h << 4) | ((d(7) & 0xFF) >>> 4)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // Allocation-free Md5Kernel over the row's byte buffer (see
    // Md5Kernel scaladoc) — same digests as the former MessageDigest +
    // substringSQL + getBytes per-shingle path.
    val md = new Md5Kernel
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val count = math.max(nc - (n - 1), 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val s = starts(i)
      val e = starts(math.min(i + n, nc))
      md.digest(base, off + s, e - s)
      hs(i) = md.head60
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place unique on the sorted buffer
    var w = 0
    var r = 1
    while (r < count) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    val distinct = if (w + 1 == count) hs else java.util.Arrays.copyOf(hs, w + 1)
    UnsafeArrayData.fromPrimitiveArray(distinct)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def shingle_hashes(text: Column, n: Column): Column =
    call_function("shingle_hashes", text, n)
}
