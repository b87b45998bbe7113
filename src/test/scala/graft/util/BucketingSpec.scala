package graft.util

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §7.5 / scale posture): writing both
  * join sides bucketed by the join key lets the sort-merge join run with
  * NO shuffle exchange — the bucketing is the partitioning. At 100 TB
  * this turns every repeated fact⋈fact join into a scan+merge. */
class BucketingSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val n = 1000
    val a = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(n).select(col("id").as("k"), (col("id") * 3).as("vb"))
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
    try {
      val joined = spark.table("bkt_a")
        .join(spark.table("bkt_b").hint("merge"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == n)
      assert(joined.filter(col("k") === 7).select("va", "vb").collect().head
        .toSeq == Seq(14L, 21L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
