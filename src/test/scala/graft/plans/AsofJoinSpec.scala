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
    Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt", forward = true)
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
