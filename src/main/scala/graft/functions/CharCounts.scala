package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_counts(text)` — per-row code-point frequency map, replacing
  * the `explode(split(text, ''))` per-CHARACTER row amplification in
  * `text_char_entropy`: a corpus-wide scan exploded to one row per
  * character shuffles the whole corpus through a hash aggregate
  * (guide §2.3 — aggregate before you shuffle); this emits one row per
  * DISTINCT character per document and the downstream groupBy sums
  * bounded-cardinality (source, char, n) rows instead.
  *
  * Equivalence: Java's `Pattern.split("", -1)` is code-point aware
  * (zero-width matches never split a surrogate pair) and yields [""]
  * for empty input, which the query filters out — so
  * `explode(char_counts(text))` followed by `sum(n)` is exactly
  * `explode(split(text, '')) … filter(c <> '') … count(*)` per
  * (group, char). The walk shares [[Md5Kernel.charStarts]]'s
  * byte-offset convention. Null → null.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"char_counts expects string, got $dt")
  }

  override def nullSafeEval(t: Any): Any =
    CharCounts.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CharCounts.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharCounts {

  def compute(text: UTF8String): ArrayBasedMapData = {
    val bytes = text.getBytes // private copy: the map's key views outlive the row
    val nb = bytes.length
    // boxed values: counts.get on an absent key must be a testable null,
    // not an unboxed 0L accident (scala.Long would unbox null to 0)
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < nb) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      val c = UTF8String.fromBytes(bytes, i, w)
      val prev = counts.get(c)
      counts.put(c, if (prev == null) 1L else prev + 1L)
      i += w
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def char_counts(text: Column): Column = call_function("char_counts", text)
}
