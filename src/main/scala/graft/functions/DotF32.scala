package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_f32(a, b)` — dot product of two float32 arrays in double
  * precision, as a native Catalyst expression with whole-stage codegen.
  *
  * This is the "custom Expression where built-ins can't express it
  * efficiently" tier (SURVEY §7.3): the composable alternatives are
  * higher-order functions (`aggregate`/`zip_with` — CodegenFallback,
  * interpreted per row) or a 64-term `element_at` chain (codegen'd but
  * with per-element null/bounds checks). `doGenCode` emits one tight
  * primitive loop over the unsafe array data.
  *
  * Null semantics: null if either input is null (BinaryExpression
  * default). Accumulation is the sequential i=0..n-1 fold, matching the
  * engine's other dot products and the DuckDB oracle.
  *
  * Registered on the session by [[graft.GraftExtensions]]; use from SQL
  * as `dot_f32(a, b)` or via [[DotF32.dot_f32]].
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    // Null elements contribute 0 (skipped) — identically in both the
    // interpreted and codegen paths (getFloat on a null slot would NPE
    // here but silently read 0.0 in generated code).
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotF32 {
  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def dot_f32(a: Column, b: Column): Column = call_function("dot_f32", a, b)
}
