package graft.operators

import graft.SparkFunSuite

/** Pins the hint-policy contract from the round-6 broadcast audit:
  * fact-derived / linearly-growing join sides (distinct order keys,
  * customer, supplier, filtered part) carry NO broadcast hint — a
  * forced hint is a driver OOM at 100× — but AQE must still pick a
  * broadcast join while those sides are genuinely small, so dropping
  * the hints costs nothing at today's scale. Asserted on the FINAL
  * adaptive plan (after execution), where AQE's runtime decision is
  * visible.
  */
class AqeJoinSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val q = RelationalQueries.defs(name).build(spark, sfDir)
    q.collect()
    // AdaptiveSparkPlan.toString prints "== Final Plan ==" followed by
    // "== Initial Plan ==" — only the final section shows what actually
    // ran after AQE's runtime conversions.
    q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("f6 unhinted distinct-custkey side broadcasts via AQE at small scale") {
    val plan = finalPlan("f6_nullout_unmatched")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the small distinct side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join expected at this scale:\n$plan")
  }

  test("j7 unhinted customer/supplier dimensions broadcast via AQE at small scale") {
    val plan = finalPlan("j7_star_join")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the pruned dimension sides:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the only shuffle should be the fact-fact join (hash, not SMJ):\n$plan")
  }

  test("j2 unhinted filtered part side broadcasts via AQE at small scale") {
    val plan = finalPlan("j2_equi_lookup")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast filtered part:\n$plan")
  }

  test("j18: AQE splits the planted hot-key partition at runtime (skew=true), same rows") {
    // the absolute byte floor is scaled away (1b — fixture partitions
    // are KBs, production ones 100s of MBs), so the OPERATIVE skew
    // criterion is the production-shaped RELATIVE one: the hot
    // partition must exceed 2x the median for OptimizeSkewedJoin to
    // fire — which is exactly the planted-celebrity-key situation
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1b")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1b")
      // coalescing would fold the tiny fixture partitions into one
      // reader before the skew check can see the hot one
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = RelationalQueries.defs("j18_aqe_skew_join").build(spark, sfDir)
      val rows = q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key SMJ as skew-optimized in the final plan:\n$plan")
      // …and the split changes the plan only, never the rows: every
      // hot-key row's dim total equals the hot-key row count (all even
      // event_ids plus user 0's own odd events)
      val hot = rows.filter(_.getLong(1) == 0L)
      assert(hot.length >= rows.length / 2 &&
        hot.forall(_.getLong(3) == hot.length))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
