package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Property tests for [[GraphQueries.triangleStats]] on planted graphs
  * where the exact answer is known in closed form. */
class GraphSpec extends SparkFunSuite {

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("doc_a", "doc_b")
  }

  test("planted K4 clique: every node has C(3,2)=3 triangles and coefficient 1") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val rows = GraphQueries.triangleStats(pairsDf(k4)).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("deg") == 3L)
      assert(r.getAs[Long]("n_triangles") == 3L)
      assert(r.getAs[Long]("clustering_ppm") == 1000000L, r.toString)
    }
  }

  test("path graph has zero triangles; star center has coefficient 0") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val rows = GraphQueries.triangleStats(pairsDf(path ++ star)).collect()
    assert(rows.forall(_.getAs[Long]("n_triangles") == 0L))
    val center = rows.find(_.getAs[Long]("doc_id") == 10L).get
    assert(center.getAs[Long]("deg") == 4L)
    assert(center.getAs[Long]("clustering_ppm") == 0L)
    // deg-1 leaves are excluded (coefficient undefined below deg 2)
    assert(!rows.exists(_.getAs[Long]("doc_id") == 11L))
  }

  test("degree cap excises the hub but keeps the residual graph's triangles") {
    // a K3 plus a hub wired to 30 leaves: uncapped, the hub's wedge join
    // is the quadratic term; capped, the K3 still counts
    val k3 = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val hub = (1L to 30L).map(i => (100L, 100L + i))
    val rows = GraphQueries.triangleStats(pairsDf(k3 ++ hub)).collect()
    assert(!rows.exists(_.getAs[Long]("doc_id") == 100L), "hub must be capped out")
    val k3rows = rows.filter(_.getAs[Long]("doc_id") < 3L)
    assert(k3rows.length == 3 &&
      k3rows.forall(_.getAs[Long]("clustering_ppm") == 1000000L))
  }

  test("modularity: two disjoint K5s score exactly Q = 0.5 under LPA labels") {
    // LPA converges to one label per clique by round 2 (round 1: all
    // neighbor labels tie, min wins; round 2: the min floods), so each
    // K5 is one community: e_in = 20 directed edges, deg_sum = 20,
    // 2m = 40 ⇒ per-community term (20·40 − 20²)/40² = 1/4, Q = 1/2.
    val k5a = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k5b = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val rows = GraphQueries.modularityStats(pairsDf(k5a ++ k5b)).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 5L, r.toString)
      assert(r.getAs[Long]("e_in") == 20L)
      assert(r.getAs[Long]("deg_sum") == 20L)
      assert(r.getAs[Long]("q_term_ppm") == 250000L)
      assert(r.getAs[Long]("modularity_ppm") == 500000L)
    }
    // the global column is constant across rows by construction
    assert(rows.map(_.getAs[Long]("modularity_ppm")).distinct.length == 1)
  }

  test("k-core: planted K5 survives the 3-core, its pendant chain peels away") {
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // chain hangs off node 0: peels front-to-back, one node per round
    val chain = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    val rows = GraphQueries.kcoreStats(pairsDf(k5 ++ chain)).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L to 4L),
      "3-core must be exactly the K5")
    rows.foreach { r =>
      assert(r.getAs[Long]("core_deg") == 4L)
      val d0 = if (r.getAs[Long]("doc_id") == 0L) 5L else 4L
      assert(r.getAs[Long]("deg0") == d0)
    }
  }

  test("k-core: a cycle dies at k=3 but IS the 2-core; peel reaches fixpoint") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    val tail = Seq((0L, 20L), (20L, 21L), (21L, 22L), (22L, 23L))
    val g = pairsDf(cycle ++ tail)
    assert(GraphQueries.kcoreStats(g, k = 3).count() == 0L)
    val core2 = GraphQueries.kcoreStats(g, k = 2).collect()
    assert(core2.map(_.getAs[Long]("doc_id")).sorted.toSeq == (0L to 4L),
      "2-core must be exactly the cycle (the cascading tail peels in 4 rounds)")
    // fixpoint: an extra round changes nothing (the unroll count is a
    // latency knob, never a correctness one)
    val plus = GraphQueries.kcoreStats(g, k = 2, rounds = GraphQueries.KcoreRounds + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(plus == core2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
  }
}
