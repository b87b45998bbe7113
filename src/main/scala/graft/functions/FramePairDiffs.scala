package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `frame_pair_diffs(payload)` — all consecutive-frame L1 energies of a
  * 32-char-frame video payload, computed PER ROW as a native codegen
  * expression: element i of the result packs pair index and energy as
  * `(i << 32) | Σ_p |code(frame_i[p]) − code(frame_{i+1}[p])|`.
  *
  * Why an expression and not window+explode+aggregate: the relational
  * encoding needs a doc-keyed `lead()` WINDOW (one full shuffle of the
  * frame rows) plus a 32-way position explode and a (doc, idx)
  * re-aggregate — three corpus-scale stages for what is a single
  * sequential pass over each payload. Here the pass happens in-row
  * (one codepoint-array scan), the kernel becomes a STATELESS MAP
  * (scan → generate), and the only shuffle left in the consumers is
  * their own per-video mean join. Energy fits 32 bits for any Unicode
  * input (≤ 32·0x10FFFF), so the pack is lossless; unpack with
  * `div/% 4294967296`.
  *
  * Payloads under two frames yield an empty array (no pairs); null in →
  * null out. Frames are CODEPOINT-indexed, exactly like the SQL twin's
  * `substring(payload, i, 32)` + `ord(...)` chain.
  */
case class FramePairDiffs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"frame_pair_diffs expects string, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    FramePairDiffs.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.FramePairDiffs.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FramePairDiffs {

  private val Frame = 32

  def compute(text: UTF8String): ArrayData = {
    // one codepoint scan; the corpus is BMP text, but supplementary
    // chars still index identically to substring()'s codepoint counting
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val nframes = n / Frame
    if (nframes < 2) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](nframes - 1)
    var i = 0
    while (i < nframes - 1) {
      var d = 0L
      var p = 0
      val a = i * Frame
      while (p < Frame) {
        val delta = cps(a + p) - cps(a + Frame + p)
        d += (if (delta < 0) -delta else delta)
        p += 1
      }
      out(i) = (i.toLong << 32) | d
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def frame_pair_diffs(payload: Column): Column =
    call_function("frame_pair_diffs", payload)
}
