package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Recall of the banded hyperplane LSH ([[LshPlanes.bandedCandidates]])
  * against brute-force ground truth on PLANTED near-duplicate vectors.
  *
  * Round-1 regression guard: a single 8-plane AND-bucket has expected
  * recall ≈ (1−θ/π)^8 ≈ 0.3 at cos 0.9 and silently missed ~70% of
  * near-dups; the 4-band OR-construction must recover ≥ 0.9. The planted
  * pairs sit at cos ≥ 0.95 (small additive noise on a shared base), where
  * per-band collision ≈ (1−θ/π)^4 ≈ 0.66 and 4-band OR ≈ 0.99.
  */
class LshRecallSpec extends SparkFunSuite {

  private val dim = LshPlanes.Dim


  test("banded LSH recall >= 0.9 on planted near-duplicate pairs") {
    val rng = new TestRng(0xC0FFEE42L)
    val nBase = 200
    // 200 random base vectors; each gets one near-duplicate: base + small
    // gaussian noise (relative scale ~0.15 → cosine ≈ 0.99)
    val rows = (0 until nBase).flatMap { i =>
      val base = Array.fill(dim)(rng.gaussian().toFloat)
      val norm = math.sqrt(base.map(x => x.toDouble * x).sum)
      val dup = base.map(x => (x + 0.15 * norm / math.sqrt(dim.toDouble) * rng.gaussian()).toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, dup))
    }
    import spark.implicits._
    val e = rows.toDF("vec_id", "embedding")

    // ground truth: brute-force pairs with cosine >= 0.95
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dp / math.sqrt(na * nb)
    }
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= 0.95
    } yield (rows(i)._1 min rows(j)._1, rows(i)._1 max rows(j)._1)).toSet
    assert(truth.size >= nBase * 9 / 10, s"fixture must plant near-dups, got ${truth.size}")

    val cand = LshPlanes.bandedCandidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.9, s"banded LSH recall $recall < 0.9 (|truth|=${truth.size}, found=${truth.count(cand.contains)})")
  }

  test("banded candidates are non-trivial and deduplicated across bands") {
    val rng = new TestRng(0xBEEF77L)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(dim)(rng.gaussian().toFloat))
    }
    import spark.implicits._
    val cand = LshPlanes.bandedCandidates(rows.toDF("vec_id", "embedding")).collect()
    val pairs = cand.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "random vectors should still collide in some 4-bit band bucket")
    assert(pairs.distinct.length === pairs.length, "pairs must be distinct across bands")
    assert(pairs.forall { case (a, b) => a < b })
  }
}
