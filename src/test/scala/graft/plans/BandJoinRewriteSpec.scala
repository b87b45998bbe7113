package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The injected optimizer rule ([[BandJoinRewrite]], registered by
  * GraftExtensions) must turn a naive no-equi-key band join into a
  * bucketed equi-join — same rows, no nested loop.
  */
class BandJoinRewriteSpec extends SparkFunSuite {

  private def pts(vals: Long*) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "pt")
  }
  private def refs(vals: Long*) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rt")
  }

  /** Brute-force expected (pid, rid) pairs for pt ∈ [rt − c, rt]. */
  private def expected(p: Seq[Long], r: Seq[Long], c: Long): Set[(Long, Long)] =
    (for {
      (pv, pi) <- p.zipWithIndex
      (rv, ri) <- r.zipWithIndex
      if pv >= rv - c && pv <= rv
    } yield (pi.toLong, ri.toLong)).toSet

  test("naive band join plans as an equi-join on the bucket, not a nested loop") {
    val p = pts(0L, 5L, 99L, 100L, 101L, 250L)
    val r = refs(100L, 107L, 300L)
    val q = p.join(r, col("pt") >= col("rt") - 100L && col("pt") <= col("rt"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"band join must be rewritten to a bucketed equi-join:\n$plan")
    assert(plan.contains("band_bucket"), s"expected the bucket key in the plan:\n$plan")
    val got = q.select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected(Seq(0L, 5L, 99L, 100L, 101L, 250L), Seq(100L, 107L, 300L), 100L))
  }

  test("boundary and negative values survive the truncating bucket math") {
    val pv = Seq(-150L, -100L, -99L, -1L, 0L, 1L, 49L, 50L, 51L, 200L)
    val rv = Seq(-100L, 0L, 50L, 200L)
    val q = pts(pv: _*).join(refs(rv: _*),
      col("pt") >= col("rt") - 50L && col("pt") <= col("rt"))
    val got = q.select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected(pv, rv, 50L))
    assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
  }

  test("a join that already has an equi key is left alone") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "pt")
    val b = Seq((1L, 12L), (2L, 200L)).toDF("kk", "rt")
    val q = a.join(b, col("k") === col("kk") &&
      col("pt") >= col("rt") - 5L && col("pt") <= col("rt"))
    assert(!q.queryExecution.executedPlan.toString.contains("band_bucket"),
      "rule must not fire when a hash key already exists")
    assert(q.count() == 1)
  }

  test("forward windows (a BETWEEN b AND b + c) are rewritten too") {
    val pv = Seq(0L, 5L, 49L, 50L, 51L, 120L, -30L)
    val rv = Seq(0L, 100L, -50L)
    // pt in [rt, rt + 50]: the forward spelling, Band roles swapped
    val q = pts(pv: _*).join(refs(rv: _*),
      col("pt") >= col("rt") && col("pt") <= col("rt") + 50L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("band_bucket"), s"forward window must rewrite:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    val got = q.select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (p, pi) <- pv.zipWithIndex
      (r, ri) <- rv.zipWithIndex
      if p >= r && p <= r + 50L
    } yield (pi.toLong, ri.toLong)).toSet
    assert(got == want)
  }

  test("the symmetric spelling abs(a - b) <= c is rewritten too") {
    val pv = Seq(-120L, -51L, -50L, 0L, 49L, 50L, 51L, 149L, 150L, 151L, 300L)
    val rv = Seq(-100L, 0L, 100L, 250L)
    val q = pts(pv: _*).join(refs(rv: _*), abs(col("pt") - col("rt")) <= 50L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("band_bucket"), s"abs band must rewrite:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    val got = q.select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (p, pi) <- pv.zipWithIndex
      (r, ri) <- rv.zipWithIndex
      if math.abs(p - r) <= 50L
    } yield (pi.toLong, ri.toLong)).toSet
    assert(got == want)
  }

  test("reversed operand spellings of the same band are recognized") {
    // b − c <= a (lower bound flipped) and b >= a (upper bound flipped)
    val p = pts(10L, 60L, 120L)
    val r = refs(100L)
    val q = p.join(r, col("rt") - 50L <= col("pt") && col("rt") >= col("pt"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("band_bucket"), s"normalized forms must match:\n$plan")
    val got = q.select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 0L)))
  }
}
