package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Recall of the IVF bucket search ([[VectorQueries.ivfTopK]]) on planted
  * clustered vectors: members of the same cluster sit in the same coarse
  * bucket, so a member's true nearest neighbour (its planted pair) must
  * surface in the probed buckets. Guards the bucket-assignment + probe
  * plumbing against silently returning plausible-but-wrong candidates. */
class IvfRecallSpec extends SparkFunSuite {

  private val dim = VectorQueries.Dim


  test("planted cluster pairs are found in top-3 via 2-probe IVF") {
    val rng = new TestRng(0x5EED0123L)
    val nClusters = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.gaussian().toFloat))
    def noisy(c: Array[Float]): Array[Float] = {
      val norm = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => (x + 0.05 * norm / math.sqrt(dim.toDouble) * rng.gaussian()).toFloat)
    }
    // ids 0..15 are the centers themselves (the deterministic coarse
    // quantizer picks the 16 lowest ids); each cluster gets a planted
    // pair of members
    val rows =
      centers.zipWithIndex.map { case (c, i) => (i.toLong, c) } ++
        centers.zipWithIndex.flatMap { case (c, i) =>
          Seq((100L + 2 * i, noisy(c)), (101L + 2 * i, noisy(c)))
        }
    import spark.implicits._
    val e = rows.toSeq.toDF("vec_id", "embedding")
    val centroids = e.filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val queries = e.filter(col("vec_id") >= 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    val top = VectorQueries.ivfTopK(e, centroids, queries, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(0))).groupMap(_._2)(_._1)

    val misses = (0 until nClusters).flatMap { i =>
      val (m1, m2) = (100L + 2 * i, 101L + 2 * i)
      Seq((m1, m2), (m2, m1)).filterNot { case (q, want) =>
        top.getOrElse(q, Array.empty[Long]).contains(want)
      }
    }
    assert(misses.isEmpty, s"planted pairs missing from IVF top-3: $misses")
  }

  test("nprobe sweep: recall is monotone in probed cells, candidate cost grows") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = VectorQueries.defs("ann_nprobe_sweep").build(spark, sfDir)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    // probing a superset of cells can only add candidates, so recall@10
    // against the same ground truth is non-decreasing and the candidate
    // count strictly grows (every query gains at least one new cell's
    // members on this data)
    val recalls = rows.map(_.getAs[Long]("recall_ppm")).toSeq
    assert(recalls == recalls.sorted, s"recall must not drop with nprobe: $recalls")
    val cands = rows.map(_.getAs[Long]("n_candidates")).toSeq
    assert(cands == cands.sorted && cands.distinct == cands,
      s"candidate cost must grow with nprobe: $cands")
    assert(rows.forall(r => r.getAs[Long]("recall_ppm") >= 0 &&
      r.getAs[Long]("recall_ppm") <= 1000000L))
  }

  test("embedding_dim_stats moments are internally consistent per dimension") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = VectorQueries.defs("embedding_dim_stats").build(spark, sfDir).collect()
    assert(rows.length == VectorQueries.Dim)
    rows.foreach { r =>
      val (n, mean, v, mn, mx) = (r.getAs[Long]("n"), r.getAs[Long]("mean_q"),
        r.getAs[Long]("var_q"), r.getAs[Long]("min_q"), r.getAs[Long]("max_q"))
      assert(n > 0)
      assert(v >= 0L, s"variance must be non-negative (dim ${r.getAs[Long]("dim")})")
      assert(mn <= mean && mean <= mx, s"mean outside [min,max]: $mn $mean $mx")
    }
  }
}
