package graft.operators

import graft.SparkFunSuite

/** Planted-geometry tests for [[VectorQueries.bitextMarginPairs]] — the
  * margin criterion's whole point is hubness control, so the spec plants
  * a hub: a y-vector that is the TOP raw cosine for two different x's.
  * Raw-cosine mutual matching would hand the hub both partners serially;
  * margin + mutual-best hands it at most one, and the isolated genuine
  * pair survives with a high margin.
  */
class BitextSpec extends SparkFunSuite {

  test("mutual-best margin: genuine pair survives, hub pairs at most once") {
    import spark.implicits._
    val xs = Seq(
      (1L, Array(1f, 0f, 0f)),      // isolated: matches y11 only
      (2L, Array(0f, 1f, 0f)),      // hub-attracted
      (3L, Array(0f, 0.9f, 0.1f)),  // hub-attracted, slightly closer
    ).toDF("xid", "xv")
    val ys = Seq(
      (11L, Array(0.95f, 0.05f, 0f)), // genuine partner of x1
      (12L, Array(0f, 0.7f, 0.714f)), // the hub: top cosine for BOTH x2 and x3
    ).toDF("yid", "yv")
    val rows = VectorQueries.bitextMarginPairs(xs, ys, k = 2).collect()
    val pairs = rows.map(r => (r.getAs[Long]("xid"), r.getAs[Long]("yid"))).toSet
    assert(pairs == Set((1L, 11L), (3L, 12L)),
      s"expected the genuine pair and ONE hub pair, got $pairs")
    assert(rows.forall(_.getAs[Long]("margin_x1e6") > 1000000L))
    // mutual-best is injective per side by construction
    assert(rows.map(_.getAs[Long]("yid")).distinct.length == rows.length)
    assert(rows.map(_.getAs[Long]("xid")).distinct.length == rows.length)
  }

  test("a pair at margin exactly 1.0 is dropped even when mutually best") {
    import spark.implicits._
    // all four vectors share one direction (cosine is scale-invariant),
    // so every pair scores c = 1e6 exactly: both neighborhood sums are
    // 2e6 and the margin lands on EXACTLY 1000000 — the strict > gate
    // must drop it (a uniform cloud offers no better-than-average pair)
    val xs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f)),
    ).toDF("xid", "xv")
    val ys = Seq(
      (11L, Array(3f, 0f, 0f)),
      (12L, Array(4f, 0f, 0f)),
    ).toDF("yid", "yv")
    val rows = VectorQueries.bitextMarginPairs(xs, ys, k = 2).collect()
    assert(rows.isEmpty,
      s"uniform cloud must yield no margin > 1 pairs, got ${rows.mkString(",")}")
  }
}
