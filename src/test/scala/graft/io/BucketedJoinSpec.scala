package graft.io

import graft.SparkFunSuite

/** Bucketed layout must remove the user-keyed shuffles entirely: the
  * j12 plan — two per-user aggregates plus their join — may contain no
  * hash-partitioning Exchange (the final ORDER BY's range exchange is
  * the only data movement left).
  */
class BucketedJoinSpec extends SparkFunSuite {

  test("j12 bucketed join: aggregates and join run without any hash Exchange") {
    val sfDir = "/root/testdata/sf0.001"
    val q = graft.operators.RelationalQueries.defs("j12_bucketed_join")
      .build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed scans must serve the aggregate and join partitioning:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scans must actually be bucketed, not plain parquet:\n$plan")
    assert(q.count() > 0)
  }

  test("bucketed tables reuse files across sessions but rebuild catalog entries") {
    val sfDir = "/root/testdata/sf0.001"
    val name = BucketedTables.dailyTable(spark, sfDir)
    assert(spark.catalog.tableExists(name))
    // idempotent: second call returns the same table without rewriting
    assert(BucketedTables.dailyTable(spark, sfDir) == name)
    val n = spark.table(name).count()
    assert(n > 0)
  }
}
