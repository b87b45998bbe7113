package graft.functions

import graft.SparkFunSuite
import graft.operators.SketchQueries
import org.apache.spark.sql.functions._

/** The native count-min fold: exact split-invariance (ADD merge needs
  * no theorem), agreement with the relational cells build, weight
  * handling, and null skipping. */
class CountMinAggSpec extends SparkFunSuite {
  import spark.implicits._

  private def cellsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.agg(call_function("count_min_agg", col("t"), col("w")).as("cells"))
      .select(posexplode(col("cells")).as(Seq("i", "n")))
      .filter(col("n") =!= 0L)
      .select(expr("CAST(i div 1024 AS BIGINT)").as("j"),
        expr("CAST(i % 1024 AS BIGINT)").as("slot"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  private lazy val toks = Seq("spark", "merge", "spark", "slow", "spark",
    "merge", "batch", "über").map(t => (t, 1L)).toDF("t", "w")

  test("split-invariant bit-for-bit: any repartitioning gives identical cells") {
    val base = cellsOf(toks)
    assert(base.nonEmpty)
    assert(cellsOf(toks.repartition(7)) == base)
    assert(cellsOf(toks.repartition(1)) == base)
    assert(cellsOf(toks.coalesce(2)) == base)
  }

  test("agrees with the relational countMinCells build cell-for-cell") {
    val vocab = toks.groupBy("t").agg(sum("w").as("cnt"))
    val relational = SketchQueries.countMinCells(vocab)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(cellsOf(toks) == relational)
  }

  test("weights fold linearly: (t, 3) equals t three times") {
    val weighted = Seq(("spark", 3L), ("merge", 2L)).toDF("t", "w")
    val repeated = Seq("spark", "spark", "spark", "merge", "merge")
      .map(t => (t, 1L)).toDF("t", "w")
    assert(cellsOf(weighted) == cellsOf(repeated))
  }

  test("null tokens and null weights are skipped") {
    val withNulls = Seq(
      (Some("spark"), Some(1L)), (None, Some(1L)), (Some("spark"), None))
      .toDF("t", "w")
    val clean = Seq(("spark", 1L)).toDF("t", "w")
    assert(cellsOf(withNulls) == cellsOf(clean))
  }

  test("grouped fold: one buffer per group through SQL") {
    Seq(("a", "x", 1L), ("a", "x", 1L), ("b", "x", 1L))
      .toDF("g", "t", "w").createOrReplaceTempView("cm_t")
    val rows = spark.sql(
      """SELECT g, aggregate(count_min_agg(t, w), 0L, (acc, c) -> acc + c) AS total
        |FROM cm_t GROUP BY g ORDER BY g""".stripMargin).collect()
    // every token lands in 4 cells, so total = 4 × token occurrences
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 8L), ("b", 4L)))
  }
}
