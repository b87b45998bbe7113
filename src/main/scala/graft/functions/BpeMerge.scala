package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_merge_pair(syms, a, b)` — one greedy-leftmost byte-pair-encoding
  * merge pass over a symbol array: every non-overlapping adjacent
  * `(a, b)` becomes the single symbol `a||b`, scanning left to right
  * (so in a run like `[a,a,a]` with merge `(a,a)` the FIRST pair wins:
  * `[aa, a]` — the overlap-parity rule every BPE implementation shares,
  * Sennrich et al. 2016 §3.2). A native codegen expression (one static
  * call per row) because this is the inner step of both BPE training
  * (one pass per learned merge over the word-frequency vocab) and
  * corpus encoding; the DuckDB oracle reproduces the same parity rule
  * relationally (candidate islands + even-offset keep —
  * `BpeQueries.applyBlock`).
  *
  * Null array → null (TernaryExpression default); `a`/`b` are always
  * literals from the training loop. Symbols never contain whitespace
  * (words are whitespace-split upstream), which [[BpeMerge.applyMerges]]
  * relies on for its space-joined merge encoding.
  */
case class BpeMergePair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_pair expects (array<string>, string, string), got $other")
    }

  override def nullSafeEval(s: Any, a: Any, b: Any): Any =
    BpeMerge.mergePair(s.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) =>
      s"graft.functions.BpeMerge.mergePair($s, $a, $b)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `bpe_apply_merges(syms, merges)` — full BPE encode of a symbol array:
  * applies each merge of the rank-ordered list (elements `"a b"`,
  * space-joined — symbols never contain whitespace) as one greedy pass.
  * One pass per merge in rank order is EXACT, not an approximation: a
  * merge can only create adjacencies involving its new symbol, and any
  * merge consuming that symbol was necessarily learned later, so no
  * earlier merge ever becomes applicable again. This is the corpus-side
  * encode primitive — a stateless projection pipelined into the scan
  * (the training loop uses [[BpeMergePair]] once per iteration instead).
  */
case class BpeApplyMerges(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply_merges expects (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(s: Any, m: Any): Any =
    BpeMerge.applyMerges(s.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, m) =>
      s"graft.functions.BpeMerge.applyMerges($s, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeMerge {

  /** One greedy-leftmost merge pass (see [[BpeMergePair]]). */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      // split/regexp arrays never carry null elements, but the function
      // is SQL-callable with anything — fail typed, not NPE
      require(s != null, "bpe_merge_pair: null symbol in the input array")
      if (i + 1 < n && s.equals(a) && b.equals(syms.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(s)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Rank-ordered full encode (see [[BpeApplyMerges]]). */
  def applyMerges(syms: ArrayData, merges: ArrayData): ArrayData = {
    var cur = syms
    val m = merges.numElements()
    var r = 0
    val space = UTF8String.fromString(" ")
    while (r < m) {
      val pair = merges.getUTF8String(r)
      require(pair != null, "bpe_apply_merges: null merge entry")
      // unlimited split so a 3-token entry like 'a b c' is length 3 and
      // fails here, instead of silently no-op-ing as the unmatchable
      // symbol 'b c' (symbols never contain whitespace)
      val parts = pair.split(space, -1)
      require(parts.length == 2 && parts(0).numBytes() > 0 && parts(1).numBytes() > 0,
        s"bpe_apply_merges: malformed merge '$pair' (expected 'a b', space-joined)")
      cur = mergePair(cur, parts(0), parts(1))
      r += 1
    }
    cur
  }

  /** Column-API entry points — resolve through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def bpe_merge_pair(syms: Column, a: Column, b: Column): Column =
    call_function("bpe_merge_pair", syms, a, b)
  def bpe_apply_merges(syms: Column, merges: Column): Column =
    call_function("bpe_apply_merges", syms, merges)
}
