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
}
