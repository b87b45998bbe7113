package graft.operators

import graft.SparkFunSuite

/** Pins the conditional-widen contract of [[TextQueries.spread]]: the
  * helper exists to rescue the few-split small-file case (one input
  * split serializes a whole sketch stage onto one task), and must be a
  * NO-OP on inputs that already arrive wide — at 100 TB the scan has
  * thousands of splits and an unconditional repartition would inject a
  * corpus-wide exchange of raw text ahead of every sketch stage.
  */
class SpreadSpec extends SparkFunSuite {

  test("spread is the identity on an input already at cluster parallelism (no Exchange)") {
    val slots = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 10000, 1, slots)
      .selectExpr("id AS doc_id", "cast(id AS string) AS text")
    val out = TextQueries.spread(wide)
    assert(out.rdd.getNumPartitions == slots)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"spread must not inject an exchange on a many-split input:\n$plan")
  }

  test("spread widens a single-split input to cluster parallelism") {
    val narrow = spark.range(0, 1000, 1, 1)
      .selectExpr("id AS doc_id", "cast(id AS string) AS text")
    val out = TextQueries.spread(narrow)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"spread must widen a single-split input:\n$plan")
  }

  test("spread is the identity within 2x of cluster parallelism (half-slots rule)") {
    // a 16-partition scan on 32 slots already saturates the machine
    // within 2×; the repartition would cost a full row-serialized
    // exchange of the input for marginal parallelism (r11:
    // bm25_search_stored paid 38 MB of shuffle to go 16 → 32 wide)
    val slots = spark.sparkContext.defaultParallelism
    val half = math.max(1, (slots + 1) / 2)
    val mid = spark.range(0, 10000, 1, half)
      .selectExpr("id AS doc_id", "cast(id AS string) AS text")
    val out = TextQueries.spread(mid)
    assert(out.rdd.getNumPartitions == half,
      s"spread must not widen $half partitions on $slots slots")
  }

  test("spreadBy hash-partitions the widen so per-key partial aggs collapse") {
    import org.apache.spark.sql.functions.col
    val narrow = spark.range(0, 1000, 1, 1)
      .selectExpr("(id % 7) AS doc_id", "id AS v")
    val out = TextQueries.spreadBy(narrow, col("doc_id"))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(doc_id"),
      s"spreadBy must hash-partition by the key, not round-robin:\n$plan")
    // all rows of one key land in one partition
    val parts = out.select("doc_id").rdd
      .mapPartitionsWithIndex { case (i, it) => it.map(r => (r.getLong(0), i)) }
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(parts.values.forall(_ == 1), s"keys split across partitions: $parts")
  }
}
