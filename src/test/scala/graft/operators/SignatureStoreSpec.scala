package graft.operators

import graft.SparkFunSuite
import graft.util.Tables

/** The persisted signature store must be a pure amortization: candidates
  * derived from the parquet store are bit-identical to the live
  * recompute-from-text path. */
class SignatureStoreSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("stored minhash bands reproduce the live LSH candidate pairs") {
    val docs = Tables.documents(spark, sfDir)
    val live = TextQueries.bandedPairs(TextQueries.minhashBandsOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live.nonEmpty, "fixture corpus must produce candidates")

    val base = tmpDir("sigstore")
    SignatureStore.write(spark, sfDir, base)
    val stored = TextQueries.bandedPairs(SignatureStore.readMinhashBands(spark, base))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == live)
  }

  test("simhash signatures roundtrip through the store") {
    val docs = Tables.documents(spark, sfDir)
    val live = TextQueries.simhashSigsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val base = tmpDir("sigstore2")
    SignatureStore.write(spark, sfDir, base)
    val stored = SignatureStore.readSimhash(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored == live && live.nonEmpty)
  }

  test("ensureMinhashBands is idempotent (second call is a pure read)") {
    val bands1 = SignatureStore.ensureMinhashBands(spark, sfDir).count()
    val bands2 = SignatureStore.ensureMinhashBands(spark, sfDir).count()
    assert(bands1 == bands2 && bands1 > 0)
  }

  test("store works end-to-end through explicit file:-scheme URIs (Hadoop FS path)") {
    val schemedInput = s"file://$sfDir"
    val schemedRoot = s"file://${tmpDir("sigroot")}"
    spark.conf.set("spark.graft.sigstore.root", schemedRoot)
    try {
      // fingerprint resolves through the Hadoop FileSystem (content-based,
      // not a degenerate path-only key)
      val base = SignatureStore.defaultBase(spark, schemedInput)
      assert(base.startsWith(schemedRoot))
      val viaScheme = SignatureStore.ensureMinhashBands(spark, schemedInput)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // second call must hit the store (idempotent through the scheme too)
      val again = SignatureStore.ensureMinhashBands(spark, schemedInput)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val live = TextQueries.minhashBandsOf(Tables.documents(spark, sfDir))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(viaScheme == live && again == live && live.nonEmpty)
    } finally spark.conf.unset("spark.graft.sigstore.root")
  }
}
