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
}
