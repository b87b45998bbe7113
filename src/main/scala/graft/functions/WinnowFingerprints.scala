package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprints(text, k, w)` — the winnowing document
  * fingerprints of Schleimer, Wilkerson & Aiken ("Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm), as one native codegen expression: hash every k-char
  * gram (md5 leading-60-bit, the [[ShingleHashes]]/[[MinhashSigs]]
  * convention), slide a w-gram window, select each window's minimum
  * hash breaking ties RIGHTMOST, and emit the selected fingerprints in
  * position order (selected positions are non-decreasing as the window
  * slides, so consecutive-position dedup is total dedup).
  *
  * The guarantee that makes winnowing THE copy-detection selector: any
  * substring of length ≥ w + k − 1 shared by two documents contributes
  * at least one SHARED selected fingerprint (every length-w gram window
  * inside the shared region selects the same local minimum in both
  * documents), while storage stays a fraction of the grams — expected
  * density 2/(w+1), guaranteed ≥ 1/w. WinnowSpec pins both bounds and
  * the theorem on planted documents.
  *
  * Why in-row and not explode→window→argmin: the relational encoding
  * explodes one row per corpus CHARACTER and then runs a per-doc
  * ordered window — a corpus-cardinality sort for what is a local
  * streaming pass. Here the whole selection runs in generated code per
  * document, returns an unboxed long[], and only the selected ~2/(w+1)
  * fraction ever reaches the plan (the same design argument as
  * [[ShingleHashes]], plus selection pushed in-row).
  *
  * Gram positions are 1..max(chars−k+1, 1) with the final gram clipped
  * at the text end (substring semantics, identical to DuckDB's
  * `substr`); a document with fewer than w grams is a single window.
  * Null text / k / w → null; k ≥ 1 and w ≥ 1 required.
  */
case class WinnowFingerprints(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType | LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects (string, int, int), got ($a, $b, $c)")
    }

  private def asInt(v: Any): Int = v match {
    case i: Integer => i.intValue()
    case l: java.lang.Long => l.intValue()
  }

  override def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowFingerprints.compute(t.asInstanceOf[UTF8String], asInt(k), asInt(w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"graft.functions.WinnowFingerprints.compute($t, (int)($k), (int)($w))")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFingerprints {

  /** Leading 60 bits of an md5 digest (first 15 hex chars), the shared
    * convention with [[ShingleHashes]] / [[MinhashSigs]]. */
  private def head60(d: Array[Byte]): Long = {
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
    (h << 4) | ((d(7) & 0xFF) >>> 4)
  }

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1, s"winnow_fingerprints needs k ≥ 1, w ≥ 1 (got $k, $w)")
    // Allocation-free Md5Kernel over the row's byte buffer (see
    // Md5Kernel scaladoc) — same digests as the former MessageDigest path.
    val md = new Md5Kernel
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val g = math.max(nc - (k - 1), 1)
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      val s = starts(i)
      val e = starts(math.min(i + k, nc))
      md.digest(base, off + s, e - s)
      hs(i) = md.head60
      i += 1
    }
    val nw = math.max(g - (w - 1), 1)
    val out = new Array[Long](nw)
    var nOut = 0
    var lastPos = -1
    var j = 0
    while (j < nw) {
      val end = math.min(j + w, g)
      // rightmost minimum: <= keeps the later position on ties
      var m = hs(j)
      var p = j
      var t = j + 1
      while (t < end) {
        if (hs(t) <= m) { m = hs(t); p = t }
        t += 1
      }
      if (p != lastPos) { out(nOut) = m; nOut += 1; lastPos = p }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nw) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def winnow_fingerprints(text: Column, k: Column, w: Column): Column =
    call_function("winnow_fingerprints", text, k, w)
}
