package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** `dot_i8(a, b)` — EXACT integer dot product of two int8-quantized
  * vectors (`array<tinyint>`), as a native codegen expression — the
  * scoring kernel of the scalar-quantized ANN path
  * ([[graft.operators.SignatureStore.ensureQuantizedVectors]]).
  *
  * Sibling of [[DotF32]] (same tier rationale: HOF alternatives are
  * CodegenFallback). Products are ≤ 127² and the sum of any realistic
  * dimension count fits a long with ~2⁴⁸ headroom, so the result is an
  * exact integer — which is what makes quantized candidate ranking
  * reproducible in the DuckDB oracle (integer arithmetic has no
  * summation-order sensitivity at all, unlike float dots).
  */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 expects array<tinyint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotI8 {
  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def dot_i8(a: Column, b: Column): Column = call_function("dot_i8", a, b)
}
