package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Recall of the scalar-quantized IVF path
  * ([[VectorQueries.ivfSearchQuantized]]) against the exact IVF path on
  * the same planted clusters as IvfRecallSpec: int8 quantization loses
  * ≤ 1/254 of each component's range, so the quantized shortlist must
  * still surface (nearly) everything the exact search returns. Two
  * pins: planted-pair recall, and agreement with the UNQUANTIZED
  * top-3 — both ≥ 0.9 (VERDICT r5 #5).
  */
class Q8RecallSpec extends SparkFunSuite {

  private val dim = VectorQueries.Dim

  test("quantized shortlist + exact rescore reaches >= 0.9 recall vs the exact IVF path") {
    val rng = new TestRng(0x5EEDF00DL)
    val nClusters = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.gaussian().toFloat))
    def noisy(c: Array[Float]): Array[Float] = {
      val norm = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => (x + 0.05 * norm / math.sqrt(dim.toDouble) * rng.gaussian()).toFloat)
    }
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
    val assign = VectorQueries.ivfAssign(e, centroids)
    val q8 = VectorQueries.quantizeInt8(e)

    def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap

    val exact = topMap(VectorQueries.ivfSearch(
      assign, e, centroids, queries, nprobe = 2, k = 3))
    val quant = topMap(VectorQueries.ivfSearchQuantized(
      assign, q8, e, centroids, queries, nprobe = 2, shortlist = 8, k = 3))

    // pin 1: agreement with the exact path's neighbor sets
    val (hit, want) = exact.foldLeft((0, 0)) { case ((h, w), (qid, ids)) =>
      (h + ids.count(quant.getOrElse(qid, Set.empty).contains), w + ids.size)
    }
    assert(want > 0 && hit.toDouble / want >= 0.9,
      s"quantized recall vs exact = $hit/$want")

    // pin 2: planted pairs still surface in the quantized top-3
    val misses = (0 until nClusters).flatMap { i =>
      val (m1, m2) = (100L + 2 * i, 101L + 2 * i)
      Seq((m1, m2), (m2, m1)).filterNot { case (q, p) =>
        quant.getOrElse(q, Set.empty).contains(p)
      }
    }
    assert(misses.size <= (2 * nClusters) / 10,
      s"planted pairs missing from quantized top-3: $misses")
  }
}
