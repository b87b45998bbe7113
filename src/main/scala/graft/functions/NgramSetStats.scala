package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_set_stats(text)` — the per-document 12-gram set statistics of
  * the exact-Jaccard candidate chain, computed PER ROW:
  *
  *   - `shs`: the SORTED array of DISTINCT 12-char shingles
  *     `substring(text, i, 12)`, i = 1..greatest(chars−11, 1) —
  *     value-identical to `sort_array(collect_set(shingle))` over the
  *     exploded positions (UTF8String binary order).
  *   - `s1`: `min(md5(shingle))` as lowercase hex (string min ≡ unsigned
  *     digest min — hex is monotonic in digest bytes).
  *   - `s2`: `min(md5('x' || shingle))` likewise.
  *
  * This replaces the explode(positions) → substring → groupBy(doc_id)
  * {collect_set, min(md5)} shape, which allocated one UTF8String per
  * corpus CHARACTER and ran one JCA md5 per shingle OCCURRENCE inside
  * the partial aggregate — measured as the bench's dominant allocation
  * source at local[32] (task-cpu ×7 vs 8 cores, GC storms landing on
  * whichever query ran next). Here occurrences dedup FIRST through a
  * zero-copy open-addressing probe over the row's byte buffer; md5 runs
  * once per DISTINCT shingle via [[Md5Kernel]]; the only allocations are
  * the per-distinct output copies the array must carry anyway. No row
  * amplification, no exchange, no aggregate — a stateless projection.
  *
  * Shingle positions/clipping follow `substring(text, i, 12)` exactly
  * ([[Md5Kernel.charStarts]] ranges); empty text yields the set {""},
  * like the SQL path. Null text → null (UnaryExpression default).
  */
case class NgramSetStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = NgramSetStats.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"ngram_set_stats expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    NgramSetStats.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.NgramSetStats.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramSetStats {
  val Schema: StructType = StructType(Seq(
    StructField("shs", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("s1", StringType, nullable = false),
    StructField("s2", StringType, nullable = false)))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(hi: Long, lo: Long): UTF8String = {
    val out = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      val v = (if (b < 8) hi >>> ((7 - b) * 8) else lo >>> ((15 - b) * 8)).toInt & 0xFF
      out(2 * b) = HexDigits(v >>> 4).toByte
      out(2 * b + 1) = HexDigits(v & 0x0F).toByte
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String): InternalRow = {
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = math.max(nc - 11, 1)

    // open-addressing dedup over (start,end) byte ranges; indices into
    // the parallel distinct arrays, -1 = empty slot
    // start small: distinct count ≪ positions on natural corpora; the
    // grow-on-half-full rehash below absorbs all-distinct adversaries
    var cap = math.min(java.lang.Integer.highestOneBit(math.max(n, 8)) * 2, 2048)
    var table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    var dStart = new Array[Int](math.min(n, 1024))
    var dEnd = new Array[Int](dStart.length)
    var dHash = new Array[Long](dStart.length)
    var count = 0

    val md = new Md5Kernel
    var min1Hi = -1L; var min1Lo = -1L // unsigned max
    var min2Hi = -1L; var min2Lo = -1L
    // 'x'-prefixed scratch for s2; sized to the widest shingle as we go
    var scratch = new Array[Byte](64)
    scratch(0) = 'x'.toByte

    var i = 0
    while (i < n) {
      val s = starts(i)
      val e = starts(math.min(i + 12, nc))
      // byte hash of [s, e)
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var p = s
      while (p < e) {
        h = (h ^ (Platform.getByte(base, off + p) & 0xFFL)) * 1099511628211L
        p += 1
      }
      var slot = (h.toInt ^ (h >>> 32).toInt) & (cap - 1)
      var idx = table(slot)
      var isNew = false
      while (idx != -1 && !{
        // verify: same hash, same length, same bytes
        dHash(idx) == h && (dEnd(idx) - dStart(idx)) == (e - s) && {
          var q = 0; val len = e - s
          var eq = true
          while (eq && q < len) {
            eq = Platform.getByte(base, off + dStart(idx) + q) ==
              Platform.getByte(base, off + s + q)
            q += 1
          }
          eq
        }
      }) {
        slot = (slot + 1) & (cap - 1)
        idx = table(slot)
      }
      if (idx == -1) {
        isNew = true
        if (count == dStart.length) {
          dStart = java.util.Arrays.copyOf(dStart, count * 2)
          dEnd = java.util.Arrays.copyOf(dEnd, count * 2)
          dHash = java.util.Arrays.copyOf(dHash, count * 2)
        }
        dStart(count) = s; dEnd(count) = e; dHash(count) = h
        table(slot) = count
        count += 1
        if (count * 2 > cap) { // grow + rehash
          cap *= 2
          table = new Array[Int](cap)
          java.util.Arrays.fill(table, -1)
          var r = 0
          while (r < count) {
            var sl = (dHash(r).toInt ^ (dHash(r) >>> 32).toInt) & (cap - 1)
            while (table(sl) != -1) sl = (sl + 1) & (cap - 1)
            table(sl) = r
            r += 1
          }
        }
      }
      if (isNew) {
        val len = e - s
        // s1: md5 over the shingle bytes in place
        md.digest(base, off + s, len)
        var hi = md.hi; var lo = md.lo
        var cmp = java.lang.Long.compareUnsigned(hi, min1Hi)
        if (cmp < 0 || (cmp == 0 && java.lang.Long.compareUnsigned(lo, min1Lo) < 0)) {
          min1Hi = hi; min1Lo = lo
        }
        // s2: md5 over 'x' || shingle via the prefixed scratch copy
        if (len + 1 > scratch.length) {
          val ns = new Array[Byte](java.lang.Integer.highestOneBit(len + 1) * 2)
          ns(0) = 'x'.toByte
          scratch = ns
        }
        var q = 0
        while (q < len) {
          scratch(q + 1) = Platform.getByte(base, off + s + q); q += 1
        }
        md.digest(scratch, Platform.BYTE_ARRAY_OFFSET, len + 1)
        hi = md.hi; lo = md.lo
        cmp = java.lang.Long.compareUnsigned(hi, min2Hi)
        if (cmp < 0 || (cmp == 0 && java.lang.Long.compareUnsigned(lo, min2Lo) < 0)) {
          min2Hi = hi; min2Lo = lo
        }
      }
      i += 1
    }

    // materialize + sort the distinct shingles (UTF8String binary order
    // ≡ sort_array's StringType ordering)
    val arr = new Array[AnyRef](count)
    var r = 0
    while (r < count) {
      val len = dEnd(r) - dStart(r)
      val bytes = new Array[Byte](len)
      Platform.copyMemory(base, off + dStart(r), bytes, Platform.BYTE_ARRAY_OFFSET, len)
      arr(r) = UTF8String.fromBytes(bytes)
      r += 1
    }
    java.util.Arrays.sort(arr, (a: AnyRef, b: AnyRef) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))

    new GenericInternalRow(Array[Any](
      new GenericArrayData(arr), hex(min1Hi, min1Lo), hex(min2Hi, min2Lo)))
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def ngram_set_stats(text: Column): Column = call_function("ngram_set_stats", text)
}
