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

  test("ANN twin equals the exact miner when every cell is probed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 vectors → ncent = 6 ≤ nprobe = 8: both sides probe EVERY cell,
    // so the candidate set is the full X×Y product; 15 per side ≤ the
    // 16-deep cosine shortlist, so the top-t prune keeps every row too
    // — the twin must reproduce the exact miner bit-for-bit, isolating
    // the margin tail from candidate generation AND from the prune so
    // any change that breaks scoring (not just recall) fails loudly
    val rnd = new scala.util.Random(7)
    val e = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    val xs = e.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("xid"), col("embedding").as("xv"))
    val ys = e.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("yid"), col("embedding").as("yv"))
    assert(xs.count() <= VectorQueries.BitextShortlist &&
      ys.count() <= VectorQueries.BitextShortlist,
      "fixture sides must fit inside the shortlist for bit-equality")
    val exact = VectorQueries.bitextMarginPairs(xs, ys)
      .collect().map(_.toSeq).toSet
    val ann = VectorQueries.bitextMarginOverScores(
      VectorQueries.bitextAnnCandidateScores(e), VectorQueries.BitextK,
      Some(VectorQueries.BitextShortlist))
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty, "fixture must mine at least one pair")
    assert(ann == exact, s"full-probe ANN must equal exact:\nann   $ann\nexact $exact")
  }

  test("the recall grade row is internally consistent at sf0.001") {
    val row = VectorQueries.defs("mine_bitext_ann_recall")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(row.length == 1)
    val r = row.head
    val (nExact, nAnn, nHits) =
      (r.getAs[Long]("n_exact"), r.getAs[Long]("n_ann"), r.getAs[Long]("n_hits"))
    assert(nExact > 0 && nAnn > 0)
    assert(nHits <= math.min(nExact, nAnn))
    assert(r.getAs[Long]("recall_ppm") == 1000000L * nHits / nExact)
    assert(r.getAs[Long]("precision_ppm") == 1000000L * nHits / nAnn)
    // the shortlist twin must actually find a usable share of the exact
    // pairs at this scale (measured 787k ppm at sf0.01; guard at half)
    assert(r.getAs[Long]("recall_ppm") >= 500000L,
      s"ANN recall collapsed: ${r.getAs[Long]("recall_ppm")} ppm")
  }

  test("the exact miner refuses loudly past the gradeable-size cap (r12 verdict #3)") {
    import org.apache.spark.sql.functions._
    // 20k x 20k = 4e8 pairs > MaxExactBitextPairs = 2.5e8: the guard
    // fires on the side COUNTS, before any cross join is planned — no
    // vectors are ever materialized
    val xs = spark.range(20000).select(col("id").as("xid"),
      array(lit(1f)).as("xv"))
    val ys = spark.range(20000).select(col("id").as("yid"),
      array(lit(1f)).as("yv"))
    val e = intercept[IllegalArgumentException] {
      VectorQueries.bitextMarginPairs(xs, ys)
    }
    assert(e.getMessage.contains("MaxExactBitextPairs"), e.getMessage)
    assert(e.getMessage.contains("mine_bitext_margin_ann"), e.getMessage)
    // BT-10x-shaped sides (1e8 pairs) stay under the cap
    assert(10000L * 10000L <= VectorQueries.MaxExactBitextPairs)
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
