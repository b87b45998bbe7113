package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins Spark lacks natively, in their scalable shapes.
  *
  * Both avoid the per-row probe / inequality-join trap: `asofJoin` is a
  * single partitioned window pass over a union (linear work, one shuffle
  * on the key), `rangeJoin` rewrites the band predicate as an equi-join
  * on a time bucket (hash/sort-merge join, never a nested loop). These
  * are the shapes that survive 100 TB; a naive implementation of either
  * degenerates to a per-key cross product.
  */
object TimeSeriesJoins {

  /** As-of join: every left row gains the LATEST right row of the same
    * `key` with `right.time <= left.time` (its columns returned as
    * `right_<name>`, all-null when no such row exists).
    *
    * Deterministic: among right rows at equal time the greatest
    * `tiebreak` wins; `(key, time, tiebreak)` should be unique on the
    * right side. The matched row travels as ONE struct through
    * `last_value(IGNORE NULLS)`, so its columns can never mix rows even
    * when some right values are null.
    *
    * Plan shape: union → one window partitioned by `key` → filter. No
    * join operator at all — the classic scalable as-of. */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, time: String, tiebreak: String): DataFrame = {
    require(right.columns.contains(tiebreak),
      s"tiebreak column '$tiebreak' must exist on the RIGHT side")
    require(left.columns.contains(key) && left.columns.contains(time) &&
      right.columns.contains(key) && right.columns.contains(time),
      s"both sides must carry '$key' and '$time' columns")
    val rightCols = right.columns.filterNot(_ == key).toSeq
    val leftVals = left.columns.filterNot(Set(key, time)).toSeq
    val rStructType = StructType(rightCols.map(c => right.schema(c)))
    // The tiebreak is a RIGHT-side concept (ordering among right rows at
    // equal time), so it travels in an internal `_tb` column: the left
    // schema need not contain it, and a left column sharing its name is
    // never consulted. Left rows carry null `_tb` — irrelevant, since at
    // equal time `_kind` already sorts every right row before them.
    val l = left
      .withColumn("_kind", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn("_rrow", lit(null).cast(rStructType))
    val r = leftVals.foldLeft(
      right
        .withColumn("_kind", lit(0))
        .withColumn("_tb", col(tiebreak))
        .withColumn("_rrow", struct(rightCols.map(col): _*))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_kind"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols = rightCols.map(c => col(s"_m.$c").as(s"right_$c"))
    l.unionByName(r)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .select(left.columns.map(col).toSeq ++ matchedCols: _*)
  }

  /** Range (band) join: all (left, right) pairs with equal `key` and
    * `right.time` in `[left.time - width, left.time]`. Right columns
    * come back as `right_<name>`.
    *
    * Plan shape: both sides take a `width`-sized time bucket; the left
    * side probes its own and the previous bucket, making the join an
    * EQUI-join on `(key, bucket)` with an exact range post-filter. A
    * right row has exactly one bucket, so a pair can meet only once —
    * no dedup needed. Time values must be non-negative (integer `div`
    * truncates toward zero). */
  def rangeJoin(left: DataFrame, right: DataFrame,
      key: String, time: String, width: Long): DataFrame = {
    require(width > 0, "range width must be positive")
    val rightCols = right.columns.filterNot(_ == key).toSeq
    val r = right.select(
      col(key) +: rightCols.map(c => col(c).as(s"right_$c")): _*)
      .withColumn("_bkt", expr(s"right_$time div ${width}L"))
    val l = left.withColumn("_bkt",
      explode(array(expr(s"$time div ${width}L"), expr(s"$time div ${width}L - 1"))))
    l.join(r, Seq(key, "_bkt"))
      .filter(col(s"right_$time") >= col(time) - width &&
        col(s"right_$time") <= col(time))
      .drop("_bkt")
  }

  /** A band self-join guard note: for heavily skewed keys, compose with
    * [[graft.util.Scale.saltedJoin]] — the bucket explode keeps the join
    * equi-keyed, so AQE's skew split also applies. */
}
