package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sigs(text)` — the k=8 minhash signature of a document's
  * 5-char shingle set, computed PER ROW as a native codegen expression:
  * one md5 per shingle, the leading 60 bits fed through 8 affine hash
  * functions `((h mod p)·(2k+3) + 31k) mod p`, minimum per k.
  *
  * This replaces the explode(positions) → substring → md5 → groupBy(doc)
  * 8-way-min shape: same arithmetic, same oracle
  * ([[graft.operators.TextQueries.MinhashBandsCte]]), but a stateless
  * projection pipelined into the scan — no row amplification (one
  * shingle row per corpus CHARACTER) and no aggregate before the band
  * table. Shingle positions are 1..max(chars−4, 1) with the final
  * shingles clipped at the text end, exactly like
  * `substring(text, i, 5)`; empty text hashes the empty shingle, like
  * the SQL path. Null text → null (UnaryExpression default).
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    MinhashSigs.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.MinhashSigs.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {
  /** Same modulus as the SQL oracle. */
  val P = 1000000007L

  /** Leading 60 bits of an md5 digest — the integer value of the first
    * 15 hex characters, i.e. `conv(substring(md5(x), 1, 15), 16, 10)`.
    * Shared with [[OphSlots]]. */
  private[functions] def head60(digest: Array[Byte]): Long = {
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (digest(b) & 0xFFL); b += 1 }
    (h << 4) | ((digest(7) & 0xFF) >>> 4)
  }

  def compute(text: UTF8String): ArrayData = {
    // Allocation-free per shingle: one Md5Kernel digest over the row's
    // byte buffer (char offsets walked once) replaces the former
    // MessageDigest + substringSQL + getBytes per-shingle allocations —
    // same digests, same head-60 convention, ~5× less task CPU on the
    // dedup family (OPTIMIZATION_r15.md).
    val md = new Md5Kernel
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = math.max(nc - 4, 1)
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = starts(i)
      val e = starts(math.min(i + 5, nc))
      md.digest(base, off + s, e - s)
      val hm = md.head60 % P
      var k = 0
      while (k < 8) {
        val v = (hm * (2 * k + 3) + 31 * k) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def minhash_sigs(text: Column): Column = call_function("minhash_sigs", text)
}

/** `min_shingle_md5(text)` — the k=1 minhash: the lexicographic minimum
  * of the 5-char shingles' md5 hex strings (≡ unsigned minimum of the
  * 128-bit digests), matching `list_min([md5(substr(text, i, 5)) …])`.
  * Same per-row replacement of the explode → groupBy(min) shape as
  * [[MinhashSigs]]; shares its shingle-position conventions.
  */
case class MinShingleMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"min_shingle_md5 expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    MinShingleMd5.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.MinShingleMd5.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleMd5 {
  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(text: UTF8String): UTF8String = {
    // Allocation-free Md5Kernel digests; the unsigned 128-bit minimum is
    // tracked as two big-endian longs ((hi, lo) compare ≡ the former
    // byte-array compare ≡ hex-string order).
    val md = new Md5Kernel
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = math.max(nc - 4, 1)
    var minHi = -1L // unsigned max
    var minLo = -1L
    var i = 0
    while (i < n) {
      val s = starts(i)
      val e = starts(math.min(i + 5, nc))
      md.digest(base, off + s, e - s)
      val hi = md.hi
      val lo = md.lo
      val cmp = java.lang.Long.compareUnsigned(hi, minHi)
      if (cmp < 0 || (cmp == 0 && java.lang.Long.compareUnsigned(lo, minLo) < 0)) {
        minHi = hi; minLo = lo
      }
      i += 1
    }
    val out = new Array[Char](32)
    var b = 0
    while (b < 16) {
      val v = (if (b < 8) minHi >>> ((7 - b) * 8) else minLo >>> ((15 - b) * 8)).toInt & 0xFF
      out(2 * b) = HexDigits(v >>> 4)
      out(2 * b + 1) = HexDigits(v & 0x0F)
      b += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def min_shingle_md5(text: Column): Column = call_function("min_shingle_md5", text)
}

/** `simhash_sig(tokens)` — the 60-bit simhash of a token array, computed
  * PER ROW: tokens dedupe in-row, each distinct token contributes its
  * md5's leading 60 bits to per-bit one-counts, and signature bit j is
  * set when 2·ones_j > n (vote_j = 2·ones_j − n > 0). Identical
  * signatures to the former explode(array_distinct) → 21-packed-column
  * vote aggregate (and to the DuckDB oracle's 60 explicit sums), but a
  * stateless projection: no per-token row amplification and no wide
  * hash-aggregate, and the packed accumulator's 2^20-tokens-per-field
  * capacity caveat disappears (plain int counters per row). Null array
  * → null; null elements are skipped (split output never contains
  * them on the query paths). */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash_sig expects array<string>, got $dt")
  }

  override def nullSafeEval(a: Any): Any =
    SimhashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimhashSig.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {
  def compute(toks: ArrayData): Long = {
    val md = new Md5Kernel
    val seen = new java.util.HashSet[UTF8String]()
    val ones = new Array[Int](60)
    var n = 0
    val len = toks.numElements()
    var i = 0
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (seen.add(t)) {
          n += 1
          md.digest(t) // zero-copy over the token's backing buffer
          val h = md.head60
          var j = 0
          while (j < 60) { if (((h >>> j) & 1L) == 1L) ones(j) += 1; j += 1 }
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (2 * ones(j) > n) sig |= 1L << j; j += 1 }
    sig
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def simhash_sig(toks: Column): Column = call_function("simhash_sig", toks)
}

/** `rolling_hash(text)` — Rabin–Karp polynomial rolling hash over the
  * text's code points: h = fold(h·B + cp mod M) with B = 257 and
  * M = 2³¹−1, so `acc·B + cp < 2⁴⁰` never overflows int64 on either
  * engine. The incremental-fingerprint primitive (content-addressed
  * chunking, delta detection) next to the md5 content fingerprint;
  * matches DuckDB `list_reduce([unicode(c) …], (acc, x) ->
  * (acc*257 + x) % 2147483647)`. Empty text → 0; null → null.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    RollingHash.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RollingHash.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val B = 257L
  val M = 2147483647L

  def compute(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def rolling_hash(text: Column): Column = call_function("rolling_hash", text)
}

/** `oph_slots(text)` — the densified one-permutation-hashing signature
  * (8 slot values `v·8 + offset`) of a document's 5-char shingles,
  * computed PER ROW in ONE md5 pass: bin = (h mod p) mod 8, min per
  * bin, then Shrivastava–Li rotation densification (empty slot j
  * borrows the nearest non-empty bin to the right, offset-stamped).
  *
  * This replaces the higher-order-function formulation of
  * [[graft.operators.TextQueries.ophBandsOf]]'s first generation,
  * which re-scanned the hash array 8× per document
  * (`transform(sequence(0,7), j -> array_min(filter(...)))`) and
  * allocated a transformed copy — measured 6.3 s at sf0.1 where the
  * 8-affine [[MinhashSigs]] path took 1.4 s, inverting OPH's whole
  * premise. One pass restores it: per shingle ONE md5, one mod, one
  * compare — k-fold fewer hash-function evaluations than MinhashSigs
  * by construction. Same shingle-position conventions; same DuckDB
  * oracle chain (the relational bin-min + rotation in
  * `TextQueries.OphFlagsCtes`); null text → null.
  */
case class OphSlots(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"oph_slots expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    OphSlots.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.OphSlots.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OphSlots {
  def compute(text: UTF8String): ArrayData = {
    val md = new Md5Kernel
    val starts = Md5Kernel.charStarts(text)
    val nc = starts.length - 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = math.max(nc - 4, 1)
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = starts(i)
      val e = starts(math.min(i + 5, nc))
      md.digest(base, off + s, e - s)
      val v = md.head60 % MinhashSigs.P
      val b = (v % 8).toInt
      if (v < mins(b)) mins(b) = v
      i += 1
    }
    // rotation densification: ≥1 bin is non-empty (n ≥ 1 shingles)
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      var t = 0
      while (mins((j + t) % 8) == Long.MaxValue) t += 1
      out(j) = mins((j + t) % 8) * 8 + t
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def oph_slots(text: Column): Column = call_function("oph_slots", text)
}
