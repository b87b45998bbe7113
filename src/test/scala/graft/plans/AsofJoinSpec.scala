package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the native as-of join against hand-computed expectations:
  * carryover within a key group, strict supersession by newer ≤-t rows,
  * cross-key isolation, no-match nulls, and equal-time inclusivity. */
class AsofJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, String)]) = {
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("rk", "rt", "rv")
    Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "lv", "rt", "rv")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) null else java.lang.Long.valueOf(row.getLong(3)),
        row.getString(4)))
      .toSet
  }

  test("picks the largest right time <= left time, per key") {
    val got = run(
      left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c")),
      right = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (1L, 30L, "r30")))
    assert(got == Set(
      (1L, 5L, "c", null, null),
      (1L, 10L, "a", java.lang.Long.valueOf(8L), "r8"),
      (1L, 20L, "b", java.lang.Long.valueOf(15L), "r15")))
  }

  test("equal timestamps match (inclusive bound)") {
    val got = run(Seq((7L, 100L, "x")), Seq((7L, 100L, "same")))
    assert(got == Set((7L, 100L, "x", java.lang.Long.valueOf(100L), "same")))
  }

  test("keys never leak: a right row on another key is invisible") {
    val got = run(
      left = Seq((1L, 50L, "a"), (2L, 50L, "b")),
      right = Seq((1L, 40L, "k1"), (3L, 10L, "k3")))
    assert(got == Set(
      (1L, 50L, "a", java.lang.Long.valueOf(40L), "k1"),
      (2L, 50L, "b", null, null)))
  }

  test("agrees with the window encoding on random data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
    val right = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val got = run(left, right)
    // oracle: for each left row, max-rt right row with rt <= t, same key
    val byKey = right.groupBy(_._1)
    val want = left.map { case (k, t, lv) =>
      byKey.getOrElse(k, Nil).filter(_._2 <= t).sortBy(_._2).lastOption match {
        case Some((_, rt, rv)) => (k, t, lv, java.lang.Long.valueOf(rt), rv)
        case None => (k, t, lv, null, null)
      }
    }.toSet
    assert(got == want)
  }

  private def runFwd(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, String)]) = {
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("rk", "rt", "rv")
    Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt", strategy = "forward")
      .select("k", "t", "lv", "rt", "rv")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) null else java.lang.Long.valueOf(row.getLong(3)),
        row.getString(4)))
      .toSet
  }

  test("forward strategy picks the smallest right time >= left time, per key") {
    val got = runFwd(
      left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 40L, "c")),
      right = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (1L, 30L, "r30")))
    assert(got == Set(
      (1L, 10L, "a", java.lang.Long.valueOf(15L), "r15"),
      (1L, 20L, "b", java.lang.Long.valueOf(30L), "r30"),
      (1L, 40L, "c", null, null)))
  }

  test("forward: consecutive left rows may share one right row (peek, not consume)") {
    val got = runFwd(
      left = Seq((5L, 1L, "x"), (5L, 2L, "y"), (5L, 3L, "z")),
      right = Seq((5L, 3L, "only")))
    assert(got == Set(
      (5L, 1L, "x", java.lang.Long.valueOf(3L), "only"),
      (5L, 2L, "y", java.lang.Long.valueOf(3L), "only"),
      (5L, 3L, "z", java.lang.Long.valueOf(3L), "only")))
  }

  test("forward agrees with the brute-force rule on random data") {
    val rnd = new scala.util.Random(99)
    val left = Seq.fill(400)((rnd.nextInt(15).toLong, rnd.nextInt(800).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
    val right = Seq.fill(250)((rnd.nextInt(15).toLong, rnd.nextInt(800).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val got = runFwd(left, right)
    val byKey = right.groupBy(_._1)
    val want = left.map { case (k, t, lv) =>
      byKey.getOrElse(k, Nil).filter(_._2 >= t).sortBy(_._2).headOption match {
        case Some((_, rt, rv)) => (k, t, lv, java.lang.Long.valueOf(rt), rv)
        case None => (k, t, lv, null, null)
      }
    }.toSet
    assert(got == want)
  }

  private def runWith(left: Seq[(Long, Long, String)], right: Seq[(Long, Long, String)],
      strategy: String, tolerance: Option[Long]) = {
    val l = left.toDF("k", "t", "lv")
    val r = right.toDF("rk", "rt", "rv")
    Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt", strategy, tolerance)
      .select("k", "t", "lv", "rt", "rv")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) null else java.lang.Long.valueOf(row.getLong(3)),
        row.getString(4)))
      .toSet
  }

  test("tolerance: an in-range match survives, an out-of-range one nulls out") {
    val got = runWith(
      left = Seq((1L, 100L, "a"), (1L, 200L, "b")),
      right = Seq((1L, 95L, "near"), (1L, 120L, "stale")),
      strategy = "backward", tolerance = Some(10L))
    assert(got == Set(
      (1L, 100L, "a", java.lang.Long.valueOf(95L), "near"),
      // the as-of row for t=200 is rt=120 (dist 80 > 10): NO fallback
      // to an even-older row — tolerance nulls, it does not search on
      (1L, 200L, "b", null, null)))
  }

  test("tolerance agrees with the brute-force rule on random data (backward AND forward)") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(400)((rnd.nextInt(15).toLong, rnd.nextInt(800).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
    val right = Seq.fill(250)((rnd.nextInt(15).toLong, rnd.nextInt(800).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val byKey = right.groupBy(_._1)
    val tol = 25L
    val wantBack = left.map { case (k, t, lv) =>
      byKey.getOrElse(k, Nil).filter(_._2 <= t).sortBy(_._2).lastOption
        .filter { case (_, rt, _) => t - rt <= tol } match {
        case Some((_, rt, rv)) => (k, t, lv, java.lang.Long.valueOf(rt), rv)
        case None => (k, t, lv, null, null)
      }
    }.toSet
    assert(runWith(left, right, "backward", Some(tol)) == wantBack)
    val wantFwd = left.map { case (k, t, lv) =>
      byKey.getOrElse(k, Nil).filter(_._2 >= t).sortBy(_._2).headOption
        .filter { case (_, rt, _) => rt - t <= tol } match {
        case Some((_, rt, rv)) => (k, t, lv, java.lang.Long.valueOf(rt), rv)
        case None => (k, t, lv, null, null)
      }
    }.toSet
    assert(runWith(left, right, "forward", Some(tol)) == wantFwd)
  }

  test("nearest picks the absolute-closest row; exact ties prefer backward") {
    // DuckDB has no nearest strategy, so the semantics are pinned HERE
    // (spec, not oracle): closest wins, equidistance goes backward.
    val got = runWith(
      left = Seq((1L, 10L, "a"), (1L, 18L, "b"), (1L, 25L, "c")),
      right = Seq((1L, 6L, "r6"), (1L, 20L, "r20"), (1L, 30L, "r30")),
      strategy = "nearest", tolerance = None)
    assert(got == Set(
      (1L, 10L, "a", java.lang.Long.valueOf(6L), "r6"), // 4 back vs 10 fwd
      (1L, 18L, "b", java.lang.Long.valueOf(20L), "r20"), // 12 back vs 2 fwd
      (1L, 25L, "c", java.lang.Long.valueOf(20L), "r20"))) // tie 5/5 → backward
  }

  test("nearest agrees with the brute-force rule on random data, with and without tolerance") {
    val rnd = new scala.util.Random(1234)
    val left = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextInt(600).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
    val right = Seq.fill(250)((rnd.nextInt(12).toLong, rnd.nextInt(600).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val byKey = right.groupBy(_._1)
    def want(tol: Long) = left.map { case (k, t, lv) =>
      val cands = byKey.getOrElse(k, Nil)
      val back = cands.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter { case (_, rt, _) => t - rt <= tol }
      val fwd = cands.filter(_._2 >= t).sortBy(_._2).headOption
        .filter { case (_, rt, _) => rt - t <= tol }
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) Some(b) else Some(f) // tie → backward
        case (b, f) => b.orElse(f)
      }
      pick match {
        case Some((_, rt, rv)) => (k, t, lv, java.lang.Long.valueOf(rt), rv)
        case None => (k, t, lv, null, null)
      }
    }.toSet
    assert(runWith(left, right, "nearest", None) == want(Long.MaxValue))
    assert(runWith(left, right, "nearest", Some(30L)) == want(30L))
  }

  test("empty sides degrade correctly (all-null matches / empty output)") {
    val noRight = run(Seq((1L, 5L, "a")), Seq.empty)
    assert(noRight == Set((1L, 5L, "a", null, null)))
    val noLeft = run(Seq.empty, Seq((1L, 5L, "r")))
    assert(noLeft.isEmpty)
    val fwdNoRight = runFwd(Seq((1L, 5L, "a")), Seq.empty)
    assert(fwdNoRight == Set((1L, 5L, "a", null, null)))
  }

  test("plans as AsofJoinExec with SMJ-shaped exchanges, no window, no nested loop") {
    val l = (1L to 100L).map(i => (i % 7, i, s"l$i")).toDF("k", "t", "lv")
    val r = (1L to 50L).map(i => (i % 7, i * 2, s"r$i")).toDF("rk", "rt", "rv")
    val q = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected the native exec:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoop"), s"wrong shape:\n$plan")
    assert(q.count() == 100)
  }
}
