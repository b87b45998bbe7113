package graft.operators

import graft.SparkFunSuite
import graft.util.Tables

/** Degenerate-bucket guard on the LSH self-joins: a planted mega-bucket
  * must be dropped (bounding the quadratic pair blowup) while normal
  * buckets are untouched, and the dropped bucket must be accounted. */
class BucketGuardSpec extends SparkFunSuite {
  import spark.implicits._

  test("oversized minhash bucket is dropped and accounted; normal buckets unaffected") {
    val hot = (0 until 50).map(i => (i.toLong, 0, 999L))
    val normal = Seq((100L, 1, 5L), (101L, 1, 5L), (102L, 2, 7L))
    val bands = (hot ++ normal).toDF("doc_id", "band", "key")

    // capped: the 50-member bucket (1225 pairs) is gone, the normal pair stays
    val capped = TextQueries.bandedPairs(bands, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)))

    // accounting: exactly the dropped bucket, with its size
    val over = TextQueries.oversizedBuckets(bands, maxBucket = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(over.toSeq == Seq((0, 999L, 50L)))

    // default cap is far above anything here: all pairs survive
    assert(TextQueries.bandedPairs(bands).count() == 50L * 49 / 2 + 1)
  }

  test("default cap leaves the real corpus' candidate pairs unchanged") {
    val sfDir = "/root/testdata/sf0.001"
    val bands = SignatureStore.ensureMinhashBands(spark, sfDir)
    val unguarded = TextQueries.bandedPairs(bands, maxBucket = Int.MaxValue).count()
    val guarded = TextQueries.bandedPairs(bands).count()
    assert(guarded == unguarded && guarded > 0)
  }

  test("planted mega-bucket in the k=1 signature self-join is capped") {
    // one boilerplate signature shared by 60 docs (1770 pairs if
    // unguarded) + two normal near-dup pairs
    val hot = (0 until 60).map(i => (i.toLong, "deadbeef"))
    val normal = Seq((100L, "aa"), (101L, "aa"), (200L, "bb"), (201L, "bb"))
    val sig = (hot ++ normal).toDF("doc_id", "sig")

    val capped = TextQueries.sigSelfJoinPairs(sig, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L), (200L, 201L)))

    // default cap is far above anything here: all pairs survive
    assert(TextQueries.sigSelfJoinPairs(sig).count() == 60L * 59 / 2 + 2)
  }

  test("hyperplane LSH candidates bound the blowup from constant embeddings") {
    import graft.operators.{LshPlanes => L}
    def bandKeys(v: Array[Float]): Seq[(Int, Int)] = (0 until L.Bands).map { b =>
      val key = (0 until L.PlanesPerBand).map { p =>
        val sv = L.signVecs(b * L.PlanesPerBand + p)
        var d = 0.0; var i = 0
        while (i < L.Dim) { d += v(i).toDouble * sv(i).toDouble; i += 1 }
        if (d > 0) 1 << p else 0
      }.sum
      (b, key)
    }
    val hotVec = Array.fill(L.Dim)(1.0f)
    val pairVec = Array.tabulate(L.Dim)(i => (i + 1).toFloat * (if (i % 2 == 0) 1 else -1))
    // sanity: the pair must not share every band bucket with the hot mass
    assert(bandKeys(pairVec).exists(bk => !bandKeys(hotVec).contains(bk)))

    val e = ((0 until 40).map(i => (i.toLong, hotVec)) ++
      Seq((100L, pairVec), (101L, pairVec))).toDF("vec_id", "embedding")
    val capped = L.bandedCandidates(e, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"got $capped")
  }
}
