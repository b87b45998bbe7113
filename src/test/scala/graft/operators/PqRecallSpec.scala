package graft.operators

import graft.{SparkFunSuite, TestRng}
import org.apache.spark.sql.functions._

/** Recall + invariants of the product-quantized ADC path ([[PqQueries]])
  * on the same planted-cluster fixture family the LSH/IVF/Q8 suites use.
  *
  * PQ on 8-dim subspaces with 16 codewords is a far coarser sketch than
  * int8 scalar quantization, so the load-bearing property is the SHAPE:
  * ADC must put the true neighbors inside the shortlist, and the exact
  * rescore then fixes the order. Pins: recall of the exact brute-force
  * top-k ≥ 0.9 through the full ADC+rescore chain, planted near-dup
  * pairs surfacing, codebook/code-table invariants, and the pack/unpack
  * roundtrip the store depends on.
  */
class PqRecallSpec extends SparkFunSuite {

  private val dim = VectorQueries.Dim

  private def fixture() = {
    val rng = new TestRng(0xCAFED00DL)
    val nClusters = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.gaussian().toFloat))
    def noisy(c: Array[Float]): Array[Float] = {
      val norm = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => (x + 0.05 * norm / math.sqrt(dim.toDouble) * rng.gaussian()).toFloat)
    }
    // 16 centers (ids 0..15 — also the codebook seeds) + 6 members each
    val rows =
      centers.zipWithIndex.map { case (c, i) => (i.toLong, c) } ++
        centers.zipWithIndex.flatMap { case (c, i) =>
          (0 until 6).map(j => (100L + 6 * i + j, noisy(c)))
        }
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("codebook and code-table invariants hold on the planted fixture") {
    val e = fixture()
    val cb = PqQueries.trainCodebook(e)
    val rows = cb.collect()
    assert(rows.length == PqQueries.M * PqQueries.K * PqQueries.SubDim)
    assert(rows.forall(!_.isNullAt(3)), "empty codeword lost its coordinates")

    val codes = PqQueries.pqAssign(PqQueries.scaledSub(e), cb)
    val n = e.count()
    assert(codes.count() == n * PqQueries.M)
    val codeRange = codes.agg(min("code"), max("code")).collect()(0)
    assert(codeRange.getInt(0) >= 1 && codeRange.getInt(1) <= PqQueries.K)

    // pack → unpack roundtrip is lossless (the store's contract)
    val packed = PqQueries.packCodes(codes)
    assert(packed.filter(size(col("codes")) =!= PqQueries.M).count() == 0)
    val back = PqQueries.unpackCodes(packed)
    assert(back.exceptAll(codes).count() == 0 && codes.exceptAll(back).count() == 0)
  }

  test("IVF-PQ agrees with the exact (unquantized) IVF search at >= 0.9") {
    val e = fixture()
    val nClusters = 16
    val centroids = e.filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") % 6 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val assign = VectorQueries.ivfAssign(e, centroids)
    val cb = PqQueries.trainCodebook(e)
    val codes = PqQueries.pqAssign(PqQueries.scaledSub(e), cb)

    def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap

    val exact = topMap(VectorQueries.ivfSearch(
      assign, e, centroids, queries, nprobe = 2, k = 3))
    val pq = topMap(PqQueries.ivfPqSearch(
      assign, codes, e, cb, centroids, queries, nprobe = 2, shortlist = 16, k = 3))
    val (hit, want) = exact.foldLeft((0, 0)) { case ((h, w), (qid, ids)) =>
      (h + ids.count(pq.getOrElse(qid, Set.empty).contains), w + ids.size)
    }
    assert(want > 0 && hit.toDouble / want >= 0.9,
      s"IVF-PQ recall vs exact IVF = $hit/$want")
  }

  test("ADC shortlist + exact rescore reaches >= 0.9 recall vs exact brute force") {
    val e = fixture()
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") % 6 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cb = PqQueries.trainCodebook(e)
    val codes = PqQueries.pqAssign(PqQueries.scaledSub(e), cb)
    val k = PqQueries.TopK

    def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap

    val pq = topMap(PqQueries.adcSearch(codes, e, cb, queries, PqQueries.Shortlist, k))

    // exact brute-force top-k per query (fixture is small): same rounded
    // cosine + id tie-break the rescore uses
    import graft.functions.DotF32.dot_f32
    val cv = e.select(col("vec_id").as("cid"), col("embedding").as("cve"))
    val sc = round(dot_f32(col("qv"), col("cve")) /
      (sqrt(dot_f32(col("qv"), col("qv"))) * sqrt(dot_f32(col("cve"), col("cve")))), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    val exact = topMap(queries.crossJoin(cv)
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), sc.as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "cid"))

    val (hit, want) = exact.foldLeft((0, 0)) { case ((h, w0), (qid, ids)) =>
      (h + ids.count(pq.getOrElse(qid, Set.empty).contains), w0 + ids.size)
    }
    assert(want > 0 && hit.toDouble / want >= 0.9,
      s"PQ recall vs exact brute force = $hit/$want")

    // every query's own cluster-mates dominate its exact top-k; at least
    // one planted mate must survive the PQ chain for every query
    val orphans = pq.filter { case (qid, ids) =>
      val cluster = (qid - 100) / 6
      !ids.exists(id => id >= 100 && (id - 100) / 6 == cluster || id == cluster)
    }
    assert(orphans.isEmpty, s"queries with no planted mate in PQ top-$k: ${orphans.keys}")
  }
}
