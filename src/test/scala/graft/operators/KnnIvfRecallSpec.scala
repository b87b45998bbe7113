package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Recall of the IVF-candidate kNN classifier
  * ([[VectorQueries.ivfKnnClassify]]) on planted LABELED clusters: a
  * query drawn from cluster i must be classified with cluster i's label
  * by the vote over its probed-bucket neighbors — guards the
  * assignment-probe + label-attach + vote plumbing end to end. */
class KnnIvfRecallSpec extends SparkFunSuite {

  private val dim = VectorQueries.Dim

  test("planted labeled clusters classify correctly via 2-probe IVF kNN") {
    val rng = new TestRng(0xCAFE4321L)
    val nClusters = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.gaussian().toFloat))
    def noisy(c: Array[Float]): Array[Float] = {
      val norm = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => (x + 0.05 * norm / math.sqrt(dim.toDouble) * rng.gaussian()).toFloat)
    }
    import spark.implicits._
    // centroids: the centers themselves (ids 0..15, deterministic
    // quantizer convention); labeled corpus: two noisy members per
    // cluster with label = cluster % 4; queries: one held-out noisy
    // member per cluster
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq
      .toDF("cent_id", "cv")
    val corpus = centers.zipWithIndex.flatMap { case (c, i) =>
      Seq((100L + 2 * i, (i % 4).toLong, noisy(c)),
        (101L + 2 * i, (i % 4).toLong, noisy(c)))
    }.toSeq.toDF("vec_id", "label", "embedding")
    val queries = centers.zipWithIndex
      .map { case (c, i) => (50L + i, noisy(c)) }.toSeq
      .toDF("qid", "qv")

    val assign = VectorQueries.ivfAssign(
      corpus.select("vec_id", "embedding"), centroids)
    val got = VectorQueries.ivfKnnClassify(
      assign, corpus, centroids, queries, nprobe = 2, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val wrong = (0 until nClusters).filterNot { i =>
      got.get(50L + i).contains((i % 4).toLong)
    }
    assert(wrong.isEmpty, s"misclassified clusters: $wrong (got $got)")
  }
}
