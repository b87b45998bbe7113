package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_head60(str)` ≡
  * `CAST(conv(substring(md5(CAST(str AS BINARY)), 1, 15), 16, 10) AS BIGINT)`
  * — the leading 60 bits of the md5 of a string's UTF-8 bytes, the
  * hash-bucket convention shared with the DuckDB oracles'
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * Why: the builtin chain allocates a 32-char hex UTF8String per call
  * (`md5`), slices it (`substring`), and radix-parses it back
  * (`conv`) — three string round-trips per TOKEN row in the
  * sketch/DSIR/HLL families. This is one [[Md5Kernel]] digest over the
  * value's existing bytes, no strings at all. Md5Head60Spec
  * property-checks the equivalence. Null → null.
  */
case class Md5Head60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"md5_head60 expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    Md5Head60.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Md5Head60.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Head60 {
  // One kernel per thread: this expression hashes ONE value per call
  // (unlike the per-row shingle loops, which amortize a fresh kernel
  // over a whole document), so a per-call allocation would be the
  // dominant cost again. The kernel holds no data across calls.
  private val kernel = new ThreadLocal[Md5Kernel] {
    override def initialValue(): Md5Kernel = new Md5Kernel
  }

  def compute(text: UTF8String): Long = {
    val md = kernel.get()
    md.digest(text)
    md.head60
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def md5_head60(text: Column): Column = call_function("md5_head60", text)
}
