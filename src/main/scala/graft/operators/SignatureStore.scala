package graft.operators

import graft.util.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted text-sketch signatures — the 100 TB amortization for the
  * dedup family.
  *
  * Live sketch queries re-hash the full corpus on every run (a full text
  * scan + one md5 per shingle/token). At scale that cost dominates, and
  * it is pure recomputation: signatures only change when documents
  * change. This store computes them ONCE and persists:
  *
  *   - `minhash_bands/`: (doc_id, band, key) parquet, partitioned by
  *     `band` — the LSH self-join then reads band-pruned row groups and
  *     shuffles only the tiny key table, never the text;
  *   - `simhash/`: (doc_id, sig) parquet — 60-bit signatures; any banding
  *     scheme can be re-derived from `sig` without touching text.
  *
  * Builders live in [[TextQueries]] (minhashBandsOf / simhashSigsOf) so
  * the stored and live paths are the same code — the
  * `dedup_minhash_lsh_stored` oracle asserts they stay bit-identical.
  */
object SignatureStore {

  def minhashDir(base: String) = s"$base/minhash_bands"
  def simhashDir(base: String) = s"$base/simhash"

  /** One full-corpus signature pass → parquet store at `base`. */
  def write(spark: SparkSession, sfDir: String, base: String): Unit = {
    val docs = documents(spark, sfDir)
    TextQueries.minhashBandsOf(docs)
      .write.mode("overwrite").partitionBy("band").parquet(minhashDir(base))
    TextQueries.simhashSigsOf(docs)
      .write.mode("overwrite").parquet(simhashDir(base))
  }

  def readMinhashBands(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(minhashDir(base))
      .select(col("doc_id"), col("band").cast("int").as("band"), col("key"))

  def readSimhash(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(simhashDir(base))

  /** Store location for a given input dataset. The cache key covers the
    * dataset path AND a content fingerprint (names + sizes + mtimes of
    * the documents parquet files), so regenerating data at the same path
    * invalidates the store instead of silently serving stale
    * signatures. */
  def defaultBase(sfDir: String): String = {
    val docs = new java.io.File(s"$sfDir/documents.parquet")
    val listing = Option(docs.listFiles()).getOrElse(Array(docs))
      .filter(_.isFile).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    val fp = Integer.toHexString((sfDir + "#" + listing).hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft_sigstore_$fp"
  }

  /** Minhash band table for `sfDir`, building the store on first use
    * (idempotent; subsequent calls are pure parquet reads). */
  def ensureMinhashBands(spark: SparkSession, sfDir: String): DataFrame = {
    val base = defaultBase(sfDir)
    val marker = new java.io.File(s"${minhashDir(base)}/_SUCCESS")
    if (!marker.exists()) write(spark, sfDir, base)
    readMinhashBands(spark, base)
  }
}
