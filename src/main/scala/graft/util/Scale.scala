package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping patterns a 1000-executor run
  * needs that local[32] never forces (SURVEY §7.5 posture).
  */
object Scale {

  /** Two-phase skew-salted aggregation: groupBy (key, salt) partial →
    * groupBy key final. Spreads a hot key over `salts` reducers; the
    * second shuffle carries only (keys × salts) rows. Use when one key
    * holds a large share of rows (AQE skew-join handles joins but not
    * single-key aggregation skew).
    *
    * `aggs` must be decomposable (sum/count/min/max): the caller passes
    * the partial aggregate and the merge expression per output column.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partials: Seq[(String, Column)],
      merges: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(col("_key"))
      .agg(merges.head._2(col(merges.head._1)).as(merges.head._1),
        merges.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
      .withColumnRenamed("_key", "key")
  }

  /** Convenience: skew-safe count per key. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts,
      partials = Seq("n" -> count(lit(1))),
      merges = Seq("n" -> (c => sum(c))))

  /** Broadcast-salted join for a skewed fact⋈dim join where the dim side
    * is too big to broadcast whole but a FEW keys are hot: replicate the
    * dim rows for hot keys `salts` times, salt the fact side randomly —
    * hot keys spread over `salts` tasks. (AQE's skew-join split covers
    * sort-merge joins; this is the explicit variant for when AQE can't
    * see the skew, e.g. after a transform.) */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
