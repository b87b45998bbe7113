package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `max_bigram_run(tokens)` — the count of a token array's most frequent
  * bigram, as a native Catalyst expression that stays inside whole-stage
  * codegen (the generated code calls [[MaxBigramRun.compute]], one
  * static call per row).
  *
  * This replaces an `aggregate(sort_array(transform(...)))` higher-order
  * chain: HOFs are CodegenFallback, so every row paid interpreted lambda
  * dispatch per element AND broke the surrounding codegen stage — worse,
  * the optimizer happily pushes/duplicates such filters (measured ~1 ms
  * per 50-token row; this runs the same contract in ~2 µs). Semantics
  * are those of the Gopher-style repetition gate and the DuckDB oracle's
  * `max(count(*)) GROUP BY bigram`: bigrams joined with a single space,
  * exact integer count, 0 when fewer than 2 tokens. Null array → null
  * (UnaryExpression default); null ELEMENTS are skipped pairwise (a
  * bigram needs two adjacent non-null tokens), which matches `split`
  * output (never null) on every query path.
  */
case class MaxBigramRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"max_bigram_run expects array<string>, got $dt")
  }

  override def nullSafeEval(a: Any): Any =
    MaxBigramRun.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MaxBigramRun.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxBigramRun {
  /** Bigram special case of [[MaxNgramRun.compute]]. */
  def compute(toks: ArrayData): Long = MaxNgramRun.compute(toks, 2)

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def max_bigram_run(toks: Column): Column = call_function("max_bigram_run", toks)
}

/** `max_ngram_run(tokens, n)` — the count of a token array's most
  * frequent n-gram (space-joined), the generalization behind the
  * Gopher-style top-2/3/4-gram repetition fractions. Same codegen
  * strategy and conventions as [[MaxBigramRun]] (which is the n=2
  * special case): 0 when fewer than n tokens, n-grams need n adjacent
  * non-null tokens, null array → null.
  *
  * `ImplicitCastInputTypes` so SQL calls with integral literals of other
  * widths (`max_ngram_run(tk, 2L)`) coerce instead of failing analysis.
  */
case class MaxNgramRun(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def dataType: DataType = LongType

  // return type left inferred: the declared Seq[AbstractDataType] is
  // private[sql]; Seq[DataType] conforms.
  override def inputTypes =
    Seq(ArrayType(StringType, containsNull = true),
      org.apache.spark.sql.types.IntegerType)

  override def nullSafeEval(a: Any, b: Any): Any =
    MaxNgramRun.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MaxNgramRun.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaxNgramRun {
  /** Shared by the interpreted and generated paths: sort the n-grams,
    * then the longest equal-adjacent run is the max n-gram count.
    * O(k log k) in document tokens with no hash-map churn. */
  def compute(toks: ArrayData, n: Int): Long = {
    val len = toks.numElements()
    if (n < 1 || len < n) return 0L
    val grams = new java.util.ArrayList[UTF8String](len - n + 1)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= len - n) {
      var ok = true
      var k = 0
      while (ok && k < n) { if (toks.isNullAt(i + k)) ok = false; k += 1 }
      if (ok) {
        val parts = new Array[UTF8String](2 * n - 1)
        var p = 0
        while (p < n) {
          parts(2 * p) = toks.getUTF8String(i + p)
          if (p < n - 1) parts(2 * p + 1) = space
          p += 1
        }
        grams.add(UTF8String.concat(parts: _*))
      }
      i += 1
    }
    if (grams.isEmpty) return 0L
    java.util.Collections.sort(grams)
    var best = 1L
    var run = 1L
    var j = 1
    while (j < grams.size()) {
      if (grams.get(j).equals(grams.get(j - 1))) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      j += 1
    }
    best
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def max_ngram_run(toks: Column, n: Column): Column =
    call_function("max_ngram_run", toks, n)
}
