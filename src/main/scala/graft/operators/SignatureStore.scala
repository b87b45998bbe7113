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

  /** Streaming appends land in a SIBLING subtree partitioned by
    * `(batch_id, band)` — they cannot share `minhash_bands/` because its
    * batch layout is partitioned by `band` alone, and mixing the two
    * partition depths in one directory breaks parquet partition discovery
    * ("Conflicting directory structures"). [[readMinhashBands]] unions
    * both subtrees, so batch LSH dedup transparently sees stream-ingested
    * signatures. */
  def streamMinhashDir(base: String) = s"$base/minhash_bands_stream"

  def simhashDir(base: String) = s"$base/simhash"

  /** One-permutation-hashing bands — the 20th store family, same
    * (doc_id, band, key) shape and union-distinct resolve as the k8
    * minhash store (a band row is immutable per document version; a
    * replayed or re-batched doc re-derives identical rows, so full-row
    * distinct IS the supersession rule). */
  def ophDir(base: String) = s"$base/oph_bands"
  def streamOphDir(base: String) = s"$base/oph_bands_stream"

  /** One full-corpus signature pass → parquet store at `base`. */
  def write(spark: SparkSession, sfDir: String, base: String): Unit = {
    val docs = documents(spark, sfDir)
    TextQueries.minhashBandsOf(docs)
      .write.mode("overwrite").partitionBy("band").parquet(minhashDir(base))
    TextQueries.simhashSigsOf(docs)
      .write.mode("overwrite").parquet(simhashDir(base))
  }

  /** All stored minhash bands: the batch subtree plus, when present, the
    * streaming-append subtree (whichever exist — a store may be purely
    * batch-built, purely stream-built, or both).
    *
    * Subtrees are admitted only when they hold at least one DATA file: a
    * micro-batch where every document was gated/deduplicated away writes
    * a directory containing only `_SUCCESS`, and reading it would throw
    * "Unable to infer schema", bricking the whole store.
    *
    * When stream rows participate, the union is deduplicated on the full
    * row: a doc re-sent in a later micro-batch (or batch-rebuilt after
    * streaming already signed it) would otherwise store its band rows
    * twice, and the inflated bucket counts could push a legitimate
    * bucket over the degenerate-bucket cap — silently dropping its
    * candidate pairs. The batch-only path stays a pure parquet read. */
  def readMinhashBands(spark: SparkSession, base: String): DataFrame =
    tryReadMinhashBands(spark, base, excludeBatch = None)
      .getOrElse(throw new IllegalArgumentException(s"no minhash band store under $base"))

  /** Bands visible to stream epoch `batchId`: everything EXCEPT that
    * epoch's own stream append. A replayed micro-batch probing the store
    * for duplicates must not see its own earlier (partial or complete)
    * append, or every one of its documents would look like a duplicate
    * of itself and the replay would emit nothing. */
  def readMinhashBandsExcluding(spark: SparkSession, base: String, batchId: Long): DataFrame =
    tryReadMinhashBands(spark, base, excludeBatch = Some(batchId))
      .getOrElse(spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0).as("band"), lit(0L).as("key")).limit(0))

  /** Positive-result memo for SEALED store probes. Every query
    * construction probes the store directories it reads (a marker
    * `exists` + a recursive `listFiles` per subtree); on an object
    * store each listing is a 10-100 ms round trip, and with 20+ store
    * families that driver-side constant dominates small queries' walls
    * (the round-9 wall≫cpu cluster). A BATCH subtree, once observed
    * non-empty, stays non-empty for the JVM's lifetime (ensure* builds
    * exactly once; compaction swaps atomically via rename), so `true`
    * is safe to pin. Stream subtrees are NEVER memoized — appends and
    * compaction change them at any time — and negative results are
    * never cached (the store may be built by the very next call). */
  private val probeMemo = new scala.collection.concurrent.TrieMap[String, Boolean]()

  /** Drop `dir` (and its `_SUCCESS` marker) from the probe memo — for
    * the rare seal-time operations that DELETE a previously-sealed
    * face (e.g. [[compactBm25]] invalidating the ranked-results
    * snapshot): the "a sealed batch build never un-exists" pin no
    * longer holds for that directory. Also drops the cached relation. */
  private def invalidateProbe(dir: String): Unit = {
    probeMemo.remove(dir)
    probeMemo.remove(s"$dir/_SUCCESS")
    graft.util.Tables.evict(dir)
  }

  /** Cached parquet read for batch subtrees (delegates to
    * [[graft.util.Tables.parquetCached]]): sealed store faces are
    * immutable between seals, so the resolved relation — file listing,
    * footer schema, LogicalRelation — is pinned per session instead of
    * re-derived by every query construction (the r10 verdict's 41 s
    * driver floor). Every path that REWRITES a batch dir (compaction
    * seals, [[swapDir]] maintenance) evicts it; stream subtrees are
    * never cached — they change with every micro-batch. */
  private def readSealed(spark: SparkSession, dir: String): DataFrame =
    graft.util.Tables.parquetCached(spark, dir)

  /** Rename-aside directory swap: `tmp` becomes `dest` with the old
    * `dest` PARKED at `dest_bak` until the new state is in place, then
    * the park is dropped. A crash at any step leaves either the old
    * state (live, or recoverable from `_bak` via [[recoverFromBak]])
    * or the new one — never neither. The plain delete-then-rename it
    * replaces had a window (post-delete, pre-rename) that silently
    * lost the store: readers saw an EMPTY directory, not an error, and
    * a subsequent seal would have frozen the loss. */
  private def swapDir(spark: SparkSession, dest: String, tmp: String): Unit = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dest)
    val bak = new Path(dest + "_bak")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(d))
      require(fs.rename(d, bak), s"swap park $dest -> $bak failed")
    require(fs.rename(new Path(tmp), d), s"swap rename $tmp -> $dest failed")
    fs.delete(bak, true)
    graft.util.Tables.evict(dest) // a cached relation lists the OLD files
  }

  /** Crash recovery for [[swapDir]]: a parked `_bak` beside a MISSING
    * live directory means the crash hit between the park and the
    * rename-in — restore the park. Readers of swap-maintained stores
    * call this before their first listing. */
  private def recoverFromBak(spark: SparkSession, dest: String): Unit = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dest)
    val bak = new Path(dest + "_bak")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d) && fs.exists(bak))
      require(fs.rename(bak, d), s"swap recovery $bak -> $dest failed")
  }

  /** Does `dir` hold at least one DATA file? (A micro-batch where every
    * row was gated away writes only `_SUCCESS`; reading such a directory
    * throws "Unable to infer schema".) Positive results for non-stream
    * subtrees are memoized (see [[probeMemo]]). */
  private def hasData(spark: SparkSession, dir: String): Boolean =
    hasData(spark, dir, cacheable = !dir.contains("_stream"))

  /** `cacheable = false` forces a REAL listing — for directories the
    * maintenance paths rewrite in place (the cluster store swaps every
    * micro-batch), where "once non-empty, always non-empty" is only
    * true absent crashes and a pinned `true` would turn a recoverable
    * loss into a hard read failure. */
  private def hasData(spark: SparkSession, dir: String, cacheable: Boolean): Boolean = {
    import org.apache.hadoop.fs.Path
    if (cacheable && probeMemo.contains(dir)) return true
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found = fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var f = false
      while (!f && it.hasNext) {
        val name = it.next().getPath.getName
        f = !(name.startsWith("_") || name.startsWith("."))
      }
      f
    }
    if (found && cacheable) probeMemo.put(dir, true)
    found
  }

  /** Sealed-marker probe with the same positive-only memo: `ensure*`
    * checks its `_SUCCESS` marker on every call, but a sealed batch
    * build never un-exists. */
  private def sealedMarkerExists(spark: SparkSession, markerPath: String): Boolean = {
    import org.apache.hadoop.fs.Path
    if (probeMemo.contains(markerPath)) return true
    val p = new Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = fs.exists(p)
    if (e) probeMemo.put(markerPath, true)
    e
  }

  private def tryReadMinhashBands(spark: SparkSession, base: String,
      excludeBatch: Option[Long]): Option[DataFrame] = {
    def cols(df: DataFrame) =
      df.select(col("doc_id"), col("band").cast("int").as("band"), col("key"))
    val batch = Option.when(hasData(spark, minhashDir(base)))(
      cols(readSealed(spark, minhashDir(base))))
    val stream = Option.when(hasData(spark, streamMinhashDir(base))) {
      val raw = spark.read.parquet(streamMinhashDir(base))
      cols(excludeBatch.fold(raw)(id => raw.filter(col("batch_id") =!= id)))
    }
    (batch, stream) match {
      case (None, None) => None
      case (b, None) => b
      case (None, s) => s.map(_.distinct())
      case (Some(b), Some(s)) => Some(b.unionByName(s).distinct())
    }
  }

  def readSimhash(spark: SparkSession, base: String): DataFrame =
    readSealed(spark, simhashDir(base))

  /** Root directory for derived signature stores. On a cluster set
    * `spark.graft.sigstore.root` to a shared filesystem path (HDFS/S3) —
    * every driver then resolves the same store; the local-JVM default is
    * only right for local mode. */
  def storeRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.sigstore.root")
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Store location for a given input dataset. The cache key covers the
    * dataset path AND a content fingerprint (names + sizes + mtimes of
    * the documents parquet files), so regenerating data at the same path
    * invalidates the store instead of silently serving stale signatures.
    * All probing goes through the Hadoop FileSystem API, so the
    * fingerprint works identically for local, HDFS and object-store
    * paths (a `java.io.File` listing silently degenerates to a path-only
    * key on any non-local scheme). */
  def defaultBase(spark: SparkSession, sfDir: String): String = {
    import org.apache.hadoop.fs.Path
    val docs = new Path(s"$sfDir/documents.parquet")
    val fs = docs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing =
      if (!fs.exists(docs)) ""
      else if (fs.getFileStatus(docs).isDirectory)
        fs.listStatus(docs).filter(_.isFile).sortBy(_.getPath.getName)
          .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
          .mkString("|")
      else {
        val st = fs.getFileStatus(docs)
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
      }
    val fp = Integer.toHexString((sfDir + "#" + listing).hashCode)
    s"${storeRoot(spark)}/graft_sigstore_$fp"
  }

  /** Minhash band table for `sfDir`, building the store on first use
    * (idempotent; subsequent calls are pure parquet reads). */
  def ensureMinhashBands(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${minhashDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) write(spark, sfDir, base)
    readMinhashBands(spark, base)
  }

  /** All stored OPH bands: batch subtree ∪ stream appends, full-row
    * distinct when both exist — the [[readMinhashBands]] resolve on the
    * OPH layout. */
  def readOphBands(spark: SparkSession, base: String): DataFrame = {
    def cols(df: DataFrame) =
      df.select(col("doc_id"), col("band").cast("long").as("band"), col("key"))
    val batch = Option.when(hasData(spark, ophDir(base)))(
      cols(readSealed(spark, ophDir(base))))
    val stream = Option.when(hasData(spark, streamOphDir(base)))(
      cols(spark.read.parquet(streamOphDir(base))))
    (batch, stream) match {
      case (None, None) =>
        throw new IllegalArgumentException(s"no OPH band store under $base")
      case (Some(b), None) => b
      case (None, Some(s)) => s.distinct()
      case (Some(b), Some(s)) => b.unionByName(s).distinct()
    }
  }

  /** OPH band table for `sfDir`, building the store on first use. */
  def ensureOphBands(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${ophDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      TextQueries.ophBandsOf(documents(spark, sfDir))
        .write.mode("overwrite").partitionBy("band").parquet(ophDir(base))
    readOphBands(spark, base)
  }

  /** Compact the OPH band store (union-distinct resolve, the
    * [[compactMinhashBands]] seal on the OPH layout). */
  def compactOphBands(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamOphDir(base)))
      compactInto(spark, ophDir(base), streamOphDir(base),
        readOphBands(spark, base))

  // ------------------------------------------------------------------
  // Trained-tokenizer artifact stores. Unlike the signature families
  // these persist a MODEL, not per-document rows: the subword-BPE merge
  // table and the unigram-LM piece table are vocab-sized (K rows / a
  // few dozen), but producing them costs a full corpus scan plus the
  // training iterations — the exact shape the seal convention exists
  // for. Write-once sealed artifacts (training is deterministic per
  // corpus; defaultBase fingerprints the documents listing, so a
  // changed corpus gets a fresh base) — no stream subtree, no
  // compaction: a tokenizer is retrained, never incrementally patched.
  // ------------------------------------------------------------------

  def bpeMergesDir(base: String) = s"$base/bpe_merges"
  def unigramModelDir(base: String) = s"$base/unigram_model"

  /** The trained subword-BPE merge table for `sfDir`, training and
    * sealing it on first use; later calls (and later SESSIONS) are pure
    * parquet reads — encode never re-pays training. */
  def ensureBpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    val base = defaultBase(spark, sfDir)
    val dir = bpeMergesDir(base)
    if (!sealedMarkerExists(spark, s"$dir/_SUCCESS"))
      BpeQueries.trainedMergesDf(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(dir)
    readSealed(spark, dir)
  }

  /** The trained unigram-LM model table for `sfDir` (piece, count,
    * score) — [[ensureBpeMerges]]'s twin for the other subword scheme. */
  def ensureUnigramModel(spark: SparkSession, sfDir: String): DataFrame = {
    val base = defaultBase(spark, sfDir)
    val dir = unigramModelDir(base)
    if (!sealedMarkerExists(spark, s"$dir/_SUCCESS"))
      UnigramQueries.trainedModelDf(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(dir)
    readSealed(spark, dir)
  }

  // ------------------------------------------------------------------
  // Candidate-pair store — the 21st family. The banded self-join is
  // what LSH exists to materialize, and before this store every
  // consumer (clusters, source matrix, family Venn, OPH agreement,
  // capture–recapture) re-enumerated it from the band tables. Persisted
  // once per band family ("k8" = standard 8-band minhash, "oph" =
  // one-permutation bands), the enumeration becomes a two-column
  // parquet read. Maintenance is INCREMENTAL (unlike the band stores'
  // pure appends, a new document creates pairs with OLD documents):
  // each micro-batch appends [[TextQueries.deltaPairs]] — delta × all
  // on (band, key) — which is exactly the row set a full rebuild gains.
  // One documented divergence window: the degenerate-bucket cap is
  // evaluated at each append against the THEN-current bucket sizes, so
  // a bucket that creeps over the cap across many micro-batches keeps
  // the pairs it produced while small; the compaction seal recomputes
  // the full self-join from the sealed band store, restoring exact
  // batch-build equality (spec-pinned).
  // ------------------------------------------------------------------

  def pairsDir(base: String, family: String) = s"$base/pairs_$family"
  def streamPairsDir(base: String, family: String) = s"$base/pairs_${family}_stream"

  /** All stored candidate pairs of `family`: batch subtree ∪ stream
    * deltas, full-row distinct when both exist (a pair re-derived by a
    * later delta is the same row — distinct IS the supersession rule). */
  def readPairs(spark: SparkSession, base: String, family: String): DataFrame = {
    def cols(df: DataFrame) = df.select(col("doc_a"), col("doc_b"))
    val batch = Option.when(hasData(spark, pairsDir(base, family)))(
      cols(readSealed(spark, pairsDir(base, family))))
    val stream = Option.when(hasData(spark, streamPairsDir(base, family)))(
      cols(spark.read.parquet(streamPairsDir(base, family))))
    (batch, stream) match {
      case (None, None) =>
        throw new IllegalArgumentException(s"no $family pair store under $base")
      case (Some(b), None) => b
      case (None, Some(s)) => s.distinct()
      case (Some(b), Some(s)) => b.unionByName(s).distinct()
    }
  }

  private def ensurePairs(spark: SparkSession, sfDir: String, family: String,
      bands: => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${pairsDir(base, family)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      TextQueries.bandedPairs(bands)
        .write.mode("overwrite").parquet(pairsDir(base, family))
    readPairs(spark, base, family)
  }

  /** Standard-minhash candidate pairs for `sfDir`, building band store
    * and pair store on first use; afterwards a pure parquet read. */
  def ensureK8Pairs(spark: SparkSession, sfDir: String): DataFrame =
    ensurePairs(spark, sfDir, "k8", ensureMinhashBands(spark, sfDir))

  /** One-permutation-minhash candidate pairs for `sfDir`. */
  def ensureOphPairs(spark: SparkSession, sfDir: String): DataFrame =
    ensurePairs(spark, sfDir, "oph", ensureOphBands(spark, sfDir))

  /** Append the pair delta for one micro-batch of new band rows:
    * `deltaPairs(delta, allBands)` lands batch_id-keyed with dynamic
    * partition overwrite (replay-idempotent — pair rows are pure
    * functions of the band state, and a replayed epoch overwrites
    * exactly its own partition). `allBands` must be the post-append
    * band state EXCLUDING this epoch's own earlier (partial) append,
    * plus the delta itself. */
  def appendPairsDelta(spark: SparkSession, base: String, family: String,
      deltaBands: DataFrame, allBands: DataFrame, batchId: Long): Unit =
    appendPairRows(spark, base, family,
      TextQueries.deltaPairs(deltaBands, allBands), batchId)

  /** Append already-enumerated pair rows (doc_a, doc_b) for one epoch —
    * the shared write leg of [[appendPairsDelta]] and the composed
    * cluster maintainer (which needs the delta pairs TWICE: once
    * persisted, once merged into labels — enumerate once, write once). */
  def appendPairRows(spark: SparkSession, base: String, family: String,
      pairRows: DataFrame, batchId: Long): Unit =
    pairRows.select("doc_a", "doc_b")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(streamPairsDir(base, family))

  /** Compaction seal for a pair family: recompute the FULL banded
    * self-join from the current band store (not a union-distinct of
    * the deltas — the rebuild is what restores exact bucket-cap
    * semantics after incremental appends) and swap it in; the stream
    * subtree is consumed. Post-condition: [[readPairs]] equals a fresh
    * [[TextQueries.bandedPairs]] over the band store, bit for bit. */
  def compactPairs(spark: SparkSession, base: String, family: String): Unit = {
    import org.apache.hadoop.fs.Path
    val bands = family match {
      case "k8" => readMinhashBands(spark, base)
      case "oph" => readOphBands(spark, base)
      case other => throw new IllegalArgumentException(s"unknown pair family $other")
    }
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hasData(spark, streamPairsDir(base, family)) ||
        !fs.exists(new Path(s"${pairsDir(base, family)}/_SUCCESS"))) {
      val tmp = s"${pairsDir(base, family)}_compact_tmp"
      TextQueries.bandedPairs(bands).write.mode("overwrite").parquet(tmp)
      fs.delete(new Path(pairsDir(base, family)), true)
      fs.delete(new Path(streamPairsDir(base, family)), true)
      require(fs.rename(new Path(tmp), new Path(pairsDir(base, family))),
        s"compaction rename $tmp -> ${pairsDir(base, family)} failed")
      graft.util.Tables.evict(pairsDir(base, family))
    }
  }

  /** Simhash signature table for `sfDir`, building the store on first
    * use (one [[write]] persists both sketch families). */
  def ensureSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${simhashDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) write(spark, sfDir, base)
    readSimhash(spark, base)
  }

  def ivfDir(base: String) = s"$base/ivf_assign"

  /** Streaming IVF-assignment appends land in a batch_id-partitioned
    * SIBLING subtree (same contract as [[streamMinhashDir]] /
    * [[streamBm25Dir]]); [[readIvfAssignments]] unions both, so probes
    * transparently see stream-ingested vectors. */
  def streamIvfDir(base: String) = s"$base/ivf_assign_stream"

  /** Stored IVF assignments at `base`: batch and/or stream subtrees with
    * LATEST-WINS versioning per vec_id — a vector re-sent in a later
    * stream batch (or present in both subtrees) keeps exactly ONE
    * assignment row, its most recent one. Full-row distinct alone would
    * keep both a stale and a fresh (vec_id, cent_id) row, letting one
    * neighbor double-vote in downstream probes. The version resolve is a
    * map-side-combinable max-struct aggregate over the (small) stream
    * subtree plus an anti-join pruning re-assigned vectors from the
    * batch side; the pure-batch path stays a bare parquet read (a batch
    * build assigns each vector exactly once). */
  def readIvfAssignments(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, ivfDir(base)))(
      readSealed(spark, ivfDir(base)).select("vec_id", "cent_id"))
    val stream = Option.when(hasData(spark, streamIvfDir(base))) {
      spark.read.parquet(streamIvfDir(base))
        .select(col("vec_id"), col("cent_id"), col("batch_id").cast("long").as("batch_id"))
        .groupBy("vec_id")
        .agg(max(struct(col("batch_id"), col("cent_id"))).as("m"))
        .select(col("vec_id"), col("m.cent_id").as("cent_id"))
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        b.join(s.select("vec_id"), Seq("vec_id"), "left_anti").unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no IVF assignment store under $base")
    }
  }

  /** Persisted IVF assignment table (vec_id, cent_id) for `sfDir` — the
    * vector-side amortization: nearest-centroid assignment is the IVF
    * build cost (16 broadcast dots × corpus) and changes only when the
    * corpus or quantizer changes; search runs probe ONLY against this
    * artifact. Built via the same max_by-aggregate shape `ann_ivf`
    * times live. */
  def ensureIvfAssignments(spark: SparkSession, sfDir: String,
      build: () => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${ivfDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      build().write.mode("overwrite").parquet(ivfDir(base))
    readIvfAssignments(spark, base)
  }

  def q8Dir(base: String) = s"$base/q8_vectors"

  /** Streaming quantized-vector appends land in a batch_id-partitioned
    * SIBLING subtree (same contract as [[streamIvfDir]]);
    * [[readQuantizedVectors]] unions both. */
  def streamQ8Dir(base: String) = s"$base/q8_vectors_stream"

  /** Stored int8 codes at `base`: batch and/or stream subtrees with
    * LATEST-WINS versioning per vec_id (same contract as
    * [[readIvfAssignments]] — a re-sent vector keeps one code row). */
  def readQuantizedVectors(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, q8Dir(base)))(
      readSealed(spark, q8Dir(base)).select("vec_id", "q"))
    val stream = Option.when(hasData(spark, streamQ8Dir(base))) {
      spark.read.parquet(streamQ8Dir(base))
        .select(col("vec_id"), col("q"), col("batch_id").cast("long").as("batch_id"))
        .groupBy("vec_id")
        .agg(max_by(col("q"), col("batch_id")).as("q"))
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        b.join(s.select("vec_id"), Seq("vec_id"), "left_anti").unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no quantized-vector store under $base")
    }
  }

  /** Persisted int8-quantized vector table (vec_id, q array<tinyint>)
    * for `sfDir` — the rescore-read amortization: at 100 TB the cost of
    * a stored-vector search is READING vectors to score candidates, and
    * the quantized artifact is 4× smaller than the floats. Quantization
    * ([[VectorQueries.quantizeInt8]]) changes only when embeddings
    * change; `ann_ivf_q8` ranks candidates against this artifact and
    * touches full floats only for its per-query shortlist. */
  def ensureQuantizedVectors(spark: SparkSession, sfDir: String,
      build: () => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${q8Dir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      build().write.mode("overwrite").parquet(q8Dir(base))
    readQuantizedVectors(spark, base)
  }

  def lshBucketsDir(base: String) = s"$base/lsh_buckets"

  /** Persisted hyperplane-LSH bucket table (vec_id, band, key) for
    * `sfDir` — the vector-sketch twin of the minhash band store: the
    * sign projection (Bands×Planes dot products per vector) is the index
    * build cost and changes only when embeddings or the plane bank
    * change; candidate runs read the band-partitioned artifact and
    * never recompute a dot. Built via the same [[graft.operators.LshPlanes.bandsOf]]
    * the live query uses, so the two paths cannot diverge. */
  def ensureLshBuckets(spark: SparkSession, sfDir: String,
      build: () => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${lshBucketsDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      build().write.mode("overwrite").partitionBy("band").parquet(lshBucketsDir(base))
    readSealed(spark, lshBucketsDir(base))
      .select(col("vec_id"), col("band").cast("int").as("band"), col("key"))
  }

  def pqCodebookDir(base: String) = s"$base/pq_codebook"
  def pqCodesDir(base: String) = s"$base/pq_codes"

  /** Streaming PQ-code appends land in a batch_id-partitioned sibling
    * subtree (same contract as [[streamQ8Dir]]). */
  def streamPqDir(base: String) = s"$base/pq_codes_stream"

  /** The trained PQ codebook (m, code, sp, ci) — fixed M·K·SubDim rows,
    * broadcast by every consumer. */
  def readPqCodebook(spark: SparkSession, base: String): DataFrame =
    readSealed(spark, pqCodebookDir(base)).select("m", "code", "sp", "ci")

  /** Shared packed-code resolve (latest-wins per vec_id within the
    * stream, stream supersedes batch) — used by both the flat PQ and
    * residual PQ stores. */
  private def packedCodesResolve(spark: SparkSession, codesDir: String,
      streamDir: String): Option[DataFrame] = {
    val batch = Option.when(hasData(spark, codesDir))(
      readSealed(spark, codesDir).select("vec_id", "codes"))
    val stream = Option.when(hasData(spark, streamDir)) {
      spark.read.parquet(streamDir)
        .select(col("vec_id"), col("codes"), col("batch_id").cast("long").as("batch_id"))
        .groupBy("vec_id")
        .agg(max_by(col("codes"), col("batch_id")).as("codes"))
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        Some(b.join(s.select("vec_id"), Seq("vec_id"), "left_anti").unionByName(s))
      case (b, s) => b.orElse(s)
    }
  }

  /** Stored PQ codes at `base`, UNPACKED to (vec_id, m, code) long form
    * for the ADC join. Batch and/or stream subtrees with latest-wins
    * versioning per vec_id (same contract as [[readQuantizedVectors]] —
    * a re-sent vector keeps one packed code row). */
  def readPqCodes(spark: SparkSession, base: String): DataFrame =
    PqQueries.unpackCodes(
      packedCodesResolve(spark, pqCodesDir(base), streamPqDir(base))
        .getOrElse(throw new IllegalArgumentException(s"no PQ code store under $base")))

  def rpqCodebookDir(base: String) = s"$base/rpq_codebook"
  def rpqCodesDir(base: String) = s"$base/rpq_codes"

  /** Streaming residual-code appends, batch_id-partitioned (layout
    * rationale of [[streamMinhashDir]]). */
  def streamRpqDir(base: String) = s"$base/rpq_codes_stream"

  def readResidualPqCodebook(spark: SparkSession, base: String): DataFrame =
    readSealed(spark, rpqCodebookDir(base)).select("m", "code", "sp", "ci")

  /** Stored RESIDUAL PQ codes, unpacked — same resolve contract as
    * [[readPqCodes]]; codes quantize IVF residuals, so they are only
    * meaningful joined with the assignment store's cell ids and the
    * centroid table they were re-centered against. */
  def readResidualPqCodes(spark: SparkSession, base: String): DataFrame =
    PqQueries.unpackCodes(
      packedCodesResolve(spark, rpqCodesDir(base), streamRpqDir(base))
        .getOrElse(throw new IllegalArgumentException(s"no residual PQ store under $base")))

  /** Persisted residual-PQ artifacts — [[ensurePqStore]]'s twin for the
    * true-IVFADC tier: the residual-trained codebook plus packed
    * residual codes, both built once; `encode` receives the codebook AS
    * READ BACK so the stored path encodes against exactly the artifact
    * later searches broadcast. */
  def ensureResidualPqStore(spark: SparkSession, sfDir: String,
      buildCodebook: () => DataFrame,
      encode: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${rpqCodesDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) {
      buildCodebook().write.mode("overwrite").parquet(rpqCodebookDir(base))
      encode(readResidualPqCodebook(spark, base))
        .write.mode("overwrite").parquet(rpqCodesDir(base))
    }
    (readResidualPqCodebook(spark, base), readResidualPqCodes(spark, base))
  }

  /** Compact the residual-PQ code store (latest-wins packed resolve). */
  def compactResidualPqCodes(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamRpqDir(base)))
      compactInto(spark, rpqCodesDir(base), streamRpqDir(base),
        packedCodesResolve(spark, rpqCodesDir(base), streamRpqDir(base)).get)

  /** Persisted PQ artifacts for `sfDir`: the trained codebook plus the
    * packed 8-byte-per-vector code table. Training (the Lloyd driver
    * loop) and encoding (one codebook-broadcast pass over the corpus)
    * run ONCE; `encode` receives the codebook AS READ BACK from parquet
    * so the stored path encodes against exactly the artifact later
    * searches will broadcast. Returns (codebook, codes-long-form). */
  def ensurePqStore(spark: SparkSession, sfDir: String,
      buildCodebook: () => DataFrame,
      encode: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${pqCodesDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) {
      buildCodebook().write.mode("overwrite").parquet(pqCodebookDir(base))
      encode(readPqCodebook(spark, base))
        .write.mode("overwrite").parquet(pqCodesDir(base))
    }
    (readPqCodebook(spark, base), readPqCodes(spark, base))
  }

  def spansDir(base: String) = s"$base/substring_spans"
  def spanGramsDir(base: String) = s"$base/span_grams"

  /** Streaming gram appends land in a batch_id-partitioned sibling
    * subtree (same layout rationale as [[streamMinhashDir]]). */
  def streamSpanGramsDir(base: String) = s"$base/span_grams_stream"

  /** Spans from the store at `base`. Batch-only stores read the
    * precomputed span artifact directly (tiny — spans only). When
    * STREAM gram appends exist, spans are re-derived over the unioned
    * positioned-gram fingerprint table ([[TextQueries.spansFromGrams]]),
    * because duplication is a CORPUS-WIDE property: a streamed document
    * can create duplication inside a batch-era document, so per-batch
    * span computation would silently miss cross-population duplicates.
    * The re-derivation never rescans text — the gram table (md5 only)
    * is the amortization artifact, and the dup-detect + island pass is
    * keyed on fingerprints/doc_id throughout. Re-sent docs resolve
    * LATEST-WINS (newest batch's grams replace older versions — same
    * contract as the bm25/q8 stores). */
  def readSpans(spark: SparkSession, base: String): DataFrame = {
    val hasStream = hasData(spark, streamSpanGramsDir(base))
    if (!hasStream) readSealed(spark, spansDir(base))
    else {
      val batch = Option.when(hasData(spark, spanGramsDir(base)))(
        readSealed(spark, spanGramsDir(base))
          .select(col("doc_id"), col("pos"), col("gram"),
            lit(-1L).as("batch_id")))
      val stream = spark.read.parquet(streamSpanGramsDir(base))
        .select(col("doc_id"), col("pos"), col("gram"),
          col("batch_id").cast("long").as("batch_id"))
      val all = batch.fold(stream)(_.unionByName(stream))
      val latest = all.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      TextQueries.spansFromGrams(
        all.join(latest, Seq("doc_id", "batch_id")).select("doc_id", "pos", "gram"))
    }
  }

  /** Persisted duplicated-substring spans (doc_id, span_start, span_end,
    * n_grams) for `sfDir`, building on first use. Span detection is a
    * full-corpus positioned-8-gram hash pass — the most expensive scan in
    * the substring family — and spans change only when documents change,
    * so excision / reporting runs read the artifact. The build ALSO
    * persists the positioned-gram fingerprint table: it is the input the
    * streaming twin ([[graft.streaming.EventStream.maintainSpanGrams]])
    * appends to, and what makes stream-era re-derivation exact without a
    * text rescan. `dedup_substring_spans` times the live compute; the
    * `_stored` excision query is held to the same oracle as the live
    * one. */
  def ensureSpans(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${spansDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) {
      val g = TextQueries.positionedGrams8(documents(spark, sfDir)).localCheckpoint()
      g.write.mode("overwrite").parquet(spanGramsDir(base))
      TextQueries.spansFromGrams(g)
        .write.mode("overwrite").parquet(spansDir(base))
    }
    readSpans(spark, base)
  }

  /** Compact the span-gram store — the second two-table seal (see
    * [[compactBm25]]): the latest-wins positioned-gram table AND the
    * spans re-derived from it must both materialize into tmp dirs
    * BEFORE any directory is swapped. Swap order grams→spans→stream:
    * while the stream subtree exists, [[readSpans]] re-derives from
    * (grams ∪ stream) with latest-wins, and re-resolving already-sealed
    * stream rows is value-idempotent — so every crash window serves the
    * same spans; after the stream delete, reads hit the sealed spans
    * directly. */
  def compactSpans(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamSpanGramsDir(base))) {
      import org.apache.hadoop.fs.Path
      val batch = Option.when(hasData(spark, spanGramsDir(base)))(
        readSealed(spark, spanGramsDir(base))
          .select(col("doc_id"), col("pos"), col("gram"), lit(-1L).as("batch_id")))
      val stream = spark.read.parquet(streamSpanGramsDir(base))
        .select(col("doc_id"), col("pos"), col("gram"),
          col("batch_id").cast("long").as("batch_id"))
      val all = batch.fold(stream)(_.unionByName(stream))
      val latest = all.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      val resolved = all.join(latest, Seq("doc_id", "batch_id"))
        .select("doc_id", "pos", "gram")
      val tmpG = s"${spanGramsDir(base)}_compact_tmp"
      val tmpS = s"${spansDir(base)}_compact_tmp"
      resolved.write.mode("overwrite").parquet(tmpG)
      TextQueries.spansFromGrams(spark.read.parquet(tmpG))
        .write.mode("overwrite").parquet(tmpS)
      val fs = new Path(spanGramsDir(base))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(spanGramsDir(base)), true)
      require(fs.rename(new Path(tmpG), new Path(spanGramsDir(base))),
        s"compaction rename $tmpG failed")
      fs.delete(new Path(spansDir(base)), true)
      require(fs.rename(new Path(tmpS), new Path(spansDir(base))),
        s"compaction rename $tmpS failed")
      fs.delete(new Path(streamSpanGramsDir(base)), true)
      graft.util.Tables.evict(spanGramsDir(base))
      graft.util.Tables.evict(spansDir(base))
    }

  def eventTransitionsDir(base: String) = s"$base/event_transitions"

  /** Persisted counted event-transition triples (e1, e2, e3, n) for
    * `sfDir`, building on first use. The build runs the user-keyed lead
    * window ONCE — the only expensive shuffle `o6_transitions` /
    * `o7_top_paths` contain — and collapses to event-type³ cardinality,
    * taxonomy-bounded however big the corpus. Null e2/e3 rows (stream
    * tails) are kept so every marginal is recoverable exactly: the
    * transition matrix sums over e3, the path query drops null-lead
    * rows. Same amortization contract as the rollup store
    * ([[graft.streaming.EventStream]] `maintainWindowCounts`): serve the
    * taxonomy-sized analytics from the artifact, never re-shuffle the
    * corpus. */
  def ensureEventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${eventTransitionsDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      RelationalQueries.eventTriples(spark, sfDir)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(eventTransitionsDir(base))
    readEventTransitions(spark, base)
  }

  /** Streaming transition emissions land batch_id-partitioned in a
    * sibling subtree (same layout rationale as [[streamMinhashDir]]),
    * written by [[graft.streaming.EventStream]] `maintainTransitions`. */
  def streamEventTransitionsDir(base: String) = s"$base/event_transitions_stream"

  /** Counted triples (e1, e2, e3, n) unioned across the batch build and
    * the streaming store, so o6/o7 stored reads transparently see
    * stream-ingested users. The stream side resolves LATEST-wins per
    * user first (`readTransitionCounts` — a corrected history replaces
    * every older emission), then the two sides SUM: a user's stream
    * lives in exactly one subtree (the same source-disjointness contract
    * as doc_id in the bm25/minhash stores), so addition is exact. Both
    * inputs are taxonomy-bounded (event-type³), so the union aggregate
    * shuffles nothing corpus-sized.
    *
    * DELIBERATELY NOT COMPACTED (the one store family without a
    * `compact*`): the batch shape (e1, e2, e3, n) has dropped the USER
    * dimension the stream side's latest-wins-per-user resolve needs —
    * folding stream triples into the batch table would freeze each
    * user's history at seal time, and a later corrected re-emission
    * could no longer supersede it. The stream subtree must stay
    * user-keyed for supersession to work; its listing cost is
    * taxonomy-bounded anyway. */
  def readEventTransitions(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, eventTransitionsDir(base)))(
      readSealed(spark, eventTransitionsDir(base)).select("e1", "e2", "e3", "n"))
    val stream = Option.when(hasData(spark, streamEventTransitionsDir(base)))(
      graft.streaming.EventStream
        .readTransitionCounts(spark, streamEventTransitionsDir(base))
        .select("e1", "e2", "e3", "n"))
    (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
        .groupBy("e1", "e2", "e3").agg(sum("n").as("n"))
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no event-transition store under $base")
    }
  }

  def phraseBigramsDir(base: String) = s"$base/phrase_bigrams"

  /** Streaming bigram appends land batch_id-partitioned in a sibling
    * subtree (same layout rationale as [[streamMinhashDir]]). */
  def streamPhraseBigramsDir(base: String) = s"$base/phrase_bigrams_stream"

  /** Per-document DISTINCT adjacent-bigram registry (doc_id, bigram) —
    * the fused-key positional index behind `phrase_search_stored`:
    * phrase membership at bigram length needs only adjacency, so the
    * (token, next-token) pair persists as ONE join key and a phrase
    * probe is a broadcast equi-join, no position self-join at read
    * time. Version resolution follows [[readBm25]]: stream rows resolve
    * LATEST-WINS per doc (a re-ingested doc's newest batch replaces its
    * bigram set), then stream docs supersede their batch rows via
    * anti-join. The artifact is positional-index-sized (≈ one row per
    * distinct adjacent pair per doc — the honest cost of phrase search
    * everywhere), but it is written once and probed by broadcast joins. */
  def readPhraseBigrams(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, phraseBigramsDir(base)))(
      readSealed(spark, phraseBigramsDir(base)).select("doc_id", "bigram"))
    val stream = Option.when(hasData(spark, streamPhraseBigramsDir(base))) {
      val raw = spark.read.parquet(streamPhraseBigramsDir(base))
        .select(col("doc_id"), col("bigram"), col("batch_id").cast("long").as("batch_id"))
      val latest = raw.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      raw.join(latest, Seq("doc_id", "batch_id"))
        .select("doc_id", "bigram").distinct()
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        val streamDocs = s.select("doc_id").distinct()
        b.join(streamDocs, Seq("doc_id"), "left_anti").unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no phrase-bigram store under $base")
    }
  }

  /** Bigram registry for `sfDir`, building on first use over ALL
    * documents (consumers filter to their corpus slice). The positional
    * pass over text runs once per corpus version; `phrase_search` times
    * the live pass, `phrase_search_stored` probes this artifact, held to
    * the same oracle. */
  def ensurePhraseBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${phraseBigramsDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SearchQueries.bigramsOf(documents(spark, sfDir))
        .write.mode("overwrite").parquet(phraseBigramsDir(base))
    readPhraseBigrams(spark, base)
  }

  /** Store compaction: fold the stream-append subtree into the batch
    * subtree. Long-running ingestion accumulates one batch_id partition
    * per micro-batch; every read then pays the partition listing and the
    * latest-wins resolve. Compaction runs the SAME resolve the reader
    * uses, seals the result as the new batch build, and drops the stream
    * subtree — post-compaction reads are a single partition-free parquet
    * scan, and the resolve cost is paid once instead of per query.
    *
    * Safe for DOC-KEYED stores (phrase bigrams, bm25, minhash, lines):
    * their readers supersede batch rows whenever a NEWER stream version
    * of the same key appears, so sealing today's resolved state does not
    * change tomorrow's supersession semantics. NOT offered for the
    * event-transition store — its stream side resolves latest-wins on a
    * USER dimension the aggregated batch shape no longer carries, so
    * compacting would silently freeze per-user history.
    *
    * Compaction is a BARRIER operation: run it between ingestion
    * sessions, after the streaming query's checkpoint has committed its
    * offsets. The sealed batch no longer carries batch_id, so the
    * replay-exclusion contract ([[readMinhashBandsExcluding]]) cannot
    * subtract a PRE-compaction epoch from a post-compaction store —
    * exactly the "sealed segments don't replay" rule every
    * log-compacted store (Kafka, LSM trees) lives by.
    *
    * Write protocol: resolved state lands in a `_compact_tmp` sibling
    * first (the resolve READS the dirs being replaced — overwriting in
    * place would consume its own output), then batch+stream are swapped
    * out and the tmp renamed in. */
  private def compactInto(spark: SparkSession, batchDir: String,
      streamDir: String, resolved: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = s"${batchDir}_compact_tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    val fs = new Path(batchDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(batchDir), true)
    fs.delete(new Path(streamDir), true)
    require(fs.rename(new Path(tmp), new Path(batchDir)),
      s"compaction rename $tmp -> $batchDir failed")
    graft.util.Tables.evict(batchDir) // a cached relation lists the OLD files
  }

  /** Compact the phrase-bigram store at `base` (no-op without stream
    * appends). Post-condition: [[readPhraseBigrams]] serves the same
    * rows from the batch subtree alone. */
  def compactPhraseBigrams(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamPhraseBigramsDir(base)))
      compactInto(spark, phraseBigramsDir(base), streamPhraseBigramsDir(base),
        readPhraseBigrams(spark, base))

  /** Compact the minhash band store (union-distinct resolve). */
  def compactMinhashBands(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamMinhashDir(base)))
      compactInto(spark, minhashDir(base), streamMinhashDir(base),
        readMinhashBands(spark, base))

  /** Compact the line registry (first-wins resolve). */
  def compactLineRegistry(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamLinesDir(base)))
      compactInto(spark, linesDir(base), streamLinesDir(base),
        readLineRegistry(spark, base))

  /** Compact the BM25 store — the TWO-TABLE variant of the seal: the
    * postings and doclens artifacts share one stream subtree, so both
    * resolves must materialize BEFORE any directory is touched (swapping
    * postings first would delete the stream rows the doclens resolve
    * still needs). Swap order puts the postings marker last: a crash
    * window can leave both tmp dirs or doclens-only swapped, never a
    * postings marker over a stale doclens; a crash before the stream
    * delete is idempotent (stream docs supersede their own compacted
    * rows with identical values). */
  def compactBm25(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamBm25Dir(base))) {
      import org.apache.hadoop.fs.Path
      val (p, l) = readBm25(spark, base)
      val tmpP = s"${bm25PostingsDir(base)}_compact_tmp"
      val tmpL = s"${bm25DoclensDir(base)}_compact_tmp"
      p.write.mode("overwrite").parquet(tmpP)
      l.write.mode("overwrite").parquet(tmpL)
      val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(bm25DoclensDir(base)), true)
      require(fs.rename(new Path(tmpL), new Path(bm25DoclensDir(base))),
        s"compaction rename $tmpL failed")
      fs.delete(new Path(bm25PostingsDir(base)), true)
      require(fs.rename(new Path(tmpP), new Path(bm25PostingsDir(base))),
        s"compaction rename $tmpP failed")
      fs.delete(new Path(streamBm25Dir(base)), true)
      graft.util.Tables.evict(bm25DoclensDir(base))
      graft.util.Tables.evict(bm25PostingsDir(base))
      // The ranked-results face ([[ensureBm25TopK]]) is a SNAPSHOT of
      // pre-append corpus stats — after this seal it is stale, and the
      // positive probe memo would serve it forever. DROP it (and its
      // memo pins) so the next ensureBm25TopK rebuilds from the sealed
      // postings; callers wanting the rebuild eagerly follow the seal
      // with [[refreshBm25TopK]].
      if (fs.exists(new Path(bm25TopkDir(base)))) {
        fs.delete(new Path(bm25TopkDir(base)), true)
        invalidateProbe(bm25TopkDir(base))
      }
    }

  def dailyKmvDir(base: String) = s"$base/daily_kmv"

  /** Streaming sketch appends, batch_id-partitioned (layout rationale of
    * [[streamMinhashDir]]). */
  def streamDailyKmvDir(base: String) = s"$base/daily_kmv_stream"

  /** Per-day KMV user sketch (day, h) — the events-table store family.
    * Unlike the document stores there is NO supersession resolve:
    * events are immutable facts, so batch and stream rows simply union,
    * duplicates vanish in the distinct, and the k-min re-rank at read
    * time is exact by KMV's union-closure (the k smallest of a union of
    * per-part k-smallest sets IS the union's k smallest). */
  def readDailyKmv(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, dailyKmvDir(base)))(
      readSealed(spark, dailyKmvDir(base)).select("day", "h"))
    val stream = Option.when(hasData(spark, streamDailyKmvDir(base)))(
      spark.read.parquet(streamDailyKmvDir(base)).select("day", "h"))
    val all = (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no daily kmv store under $base")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("h"))
    all.distinct()
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= SketchQueries.KmvK)
      .select("day", "h")
  }

  /** Build-on-first-use for the per-day sketch store. */
  def ensureDailyKmv(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${dailyKmvDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SketchQueries.dailyUserSketch(graft.util.Tables.events(spark, sfDir))
        .write.mode("overwrite").parquet(dailyKmvDir(base))
    readDailyKmv(spark, base)
  }

  /** Compact the daily-sketch store (union + k-min re-rank resolve). */
  def compactDailyKmv(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamDailyKmvDir(base)))
      compactInto(spark, dailyKmvDir(base), streamDailyKmvDir(base),
        readDailyKmv(spark, base))

  def countMinDir(base: String) = s"$base/count_min"

  /** Streaming cell appends, batch_id-partitioned (same layout
    * rationale as [[streamMinhashDir]]). */
  def streamCountMinDir(base: String) = s"$base/count_min_stream"

  /** Merged count-min cells (j, slot, n) — the sketch member whose
    * merge law is ADDITION, not latest-wins or union: every cell is a
    * sum of token-occurrence counts, so batch cells plus each stream
    * epoch's cells simply ADD per (j, slot) — the additive sibling of
    * [[readDailyKmv]]'s KMV union-closure, at CONSTANT read cost (each
    * part contributes ≤4096 rows regardless of corpus size). Like the
    * daily-KMV store, this treats appended documents as immutable
    * facts: re-ingesting a doc adds its occurrences again (an
    * append-only counter sketch has no per-doc identity to resolve). */
  def readCountMin(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, countMinDir(base)))(
      readSealed(spark, countMinDir(base)).select("j", "slot", "n"))
    val stream = Option.when(hasData(spark, streamCountMinDir(base)))(
      spark.read.parquet(streamCountMinDir(base)).select("j", "slot", "n"))
    val all = (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no count-min store under $base")
    }
    all.groupBy("j", "slot").agg(org.apache.spark.sql.functions.sum("n").as("n"))
  }

  /** Build-on-first-use for the count-min cell store. */
  def ensureCountMin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${countMinDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SketchQueries.countMinCells(SketchQueries.tokenVocab(documents(spark, sfDir)))
        .write.mode("overwrite").parquet(countMinDir(base))
    readCountMin(spark, base)
  }

  /** Compact the count-min store (cell-sum resolve). */
  def compactCountMin(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamCountMinDir(base)))
      compactInto(spark, countMinDir(base), streamCountMinDir(base),
        readCountMin(spark, base))

  def hllDir(base: String) = s"$base/hll"

  /** Streaming register appends, batch_id-partitioned (same layout
    * rationale as [[streamMinhashDir]]). */
  def streamHllDir(base: String) = s"$base/hll_stream"

  /** Merged per-stratum HLL registers (stratum, idx, m) — the sketch
    * member whose merge law is MAX: batch registers plus each stream
    * epoch's registers fold with `max(m)` per (stratum, idx). Like
    * Bloom's OR (and unlike count-min/bins' ADD), MAX is idempotent BY
    * VALUE — replaying an epoch, or re-ingesting the same users,
    * changes nothing, so replay needs no per-row identity at all. Read
    * cost is ≤256 rows per stratum per part regardless of how many
    * users ever streamed through. */
  def readHll(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, hllDir(base)))(
      readSealed(spark, hllDir(base)).select("stratum", "idx", "m"))
    val stream = Option.when(hasData(spark, streamHllDir(base)))(
      spark.read.parquet(streamHllDir(base)).select("stratum", "idx", "m"))
    val all = (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no hll store under $base")
    }
    all.groupBy("stratum", "idx").agg(max("m").as("m"))
  }

  /** Build-on-first-use for the per-event-type HLL register store. */
  def ensureHll(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${hllDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SketchQueries.hllRegisters(
          events(spark, sfDir)
            .select(col("event_type").as("stratum"), col("user_id")))
        .write.mode("overwrite").parquet(hllDir(base))
    readHll(spark, base)
  }

  /** Compact the HLL register store (register-MAX resolve). */
  def compactHll(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamHllDir(base)))
      compactInto(spark, hllDir(base), streamHllDir(base),
        readHll(spark, base))

  def quantileBinsDir(base: String) = s"$base/quantile_bins"

  /** Streaming bin appends, batch_id-partitioned (same layout rationale
    * as [[streamMinhashDir]]). */
  def streamQuantileBinsDir(base: String) = s"$base/quantile_bins_stream"

  /** Merged per-source length-histogram bins (source, bin, n) — the
    * second ADDITIVE store member (see [[readCountMin]]): bins are
    * counts, so batch rows plus each stream epoch's rows SUM per
    * (source, bin) at ≤256·|sources| read cost regardless of corpus
    * size. Appended documents are immutable facts — re-ingesting a doc
    * counts its length again (additive sketches carry no per-doc
    * identity). Any rollup is a further sum: global percentiles fold
    * over sources, per-source ones filter first. */
  def readQuantileBins(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, quantileBinsDir(base)))(
      readSealed(spark, quantileBinsDir(base)).select("source", "bin", "n"))
    val stream = Option.when(hasData(spark, streamQuantileBinsDir(base)))(
      spark.read.parquet(streamQuantileBinsDir(base)).select("source", "bin", "n"))
    val all = (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no quantile-bin store under $base")
    }
    all.groupBy("source", "bin").agg(org.apache.spark.sql.functions.sum("n").as("n"))
  }

  /** Build-on-first-use for the per-source quantile-bin store. */
  def ensureQuantileBins(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${quantileBinsDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SketchQueries.sourceLengthBins(documents(spark, sfDir))
        .write.mode("overwrite").parquet(quantileBinsDir(base))
    readQuantileBins(spark, base)
  }

  /** Compact the quantile-bin store (bin-sum resolve). */
  def compactQuantileBins(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamQuantileBinsDir(base)))
      compactInto(spark, quantileBinsDir(base), streamQuantileBinsDir(base),
        readQuantileBins(spark, base))

  def bloomDir(base: String) = s"$base/bloom"

  /** Streaming word appends, batch_id-partitioned (same layout rationale
    * as [[streamMinhashDir]]). */
  def streamBloomDir(base: String) = s"$base/bloom_stream"

  /** Merged eval-set Bloom words (w, bits) — the third sketch store and
    * the one whose merge law is IDEMPOTENT OR: batch words plus each
    * stream epoch's words fold with `bit_or` per word id, so re-ingested
    * eval documents change nothing (bits already set stay set) and
    * replay needs no per-doc identity at all. Read cost is ≤128 rows per
    * part regardless of eval-corpus size — the gate a 100 TB
    * decontamination sweep broadcasts instead of the eval shingle set. */
  def readBloom(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, bloomDir(base)))(
      readSealed(spark, bloomDir(base)).select("w", "bits"))
    val stream = Option.when(hasData(spark, streamBloomDir(base)))(
      spark.read.parquet(streamBloomDir(base)).select("w", "bits"))
    val all = (batch, stream) match {
      case (Some(b), Some(s)) => b.unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no bloom store under $base")
    }
    all.groupBy("w").agg(expr("bit_or(bits)").as("bits"))
  }

  /** Build-on-first-use for the eval-set Bloom word store. */
  def ensureBloom(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${bloomDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SketchQueries.bloomOf(SketchQueries.evalSplit(documents(spark, sfDir)))
        .write.mode("overwrite").parquet(bloomDir(base))
    readBloom(spark, base)
  }

  /** Compact the Bloom word store (bit_or resolve). */
  def compactBloom(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamBloomDir(base)))
      compactInto(spark, bloomDir(base), streamBloomDir(base),
        readBloom(spark, base))

  def mgCountersDir(base: String) = s"$base/mg_counters"
  def mgLambdasDir(base: String) = s"$base/mg_lambdas"

  /** Streaming summary appends, batch_id-partitioned (layout rationale
    * of [[streamMinhashDir]]); counters and λs are sibling subtrees
    * because their schemas differ. */
  def streamMgCountersDir(base: String) = s"$base/mg_counters_stream"
  def streamMgLambdasDir(base: String) = s"$base/mg_lambdas_stream"

  /** Merged per-source Misra–Gries summaries — the BOUNDED-LOSSY store
    * member: the resolve SUMS counters per (source, t) and re-prunes
    * each source with its merged λ_m (the (k+1)-th largest summed
    * counter, 0 when ≤ k rows survive — so a batch-only store resolves
    * to exactly its stored summaries). Unlike KMV's union or
    * count-min's ADD, this merge loses information, but the loss is
    * CAPPED: the resolved λ budget (second table: stored per-source λs
    * summed, plus the re-prune's λ_m) bounds every counter's
    * underestimate, and counters never overestimate — the
    * mergeable-summaries theorem the streaming spec asserts against
    * exact recounts. Appended docs are immutable facts (counters are
    * counts; re-ingestion adds again, as for count-min).
    * Returns (counters (source, t, c), lambdas (source, lam)). */
  def readHeavyHitters(spark: SparkSession, base: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def unioned(batchDir: String, streamDir: String, cols: Seq[String]): DataFrame = {
      val batch = Option.when(hasData(spark, batchDir))(
        readSealed(spark, batchDir).select(cols.map(col): _*))
      val stream = Option.when(hasData(spark, streamDir))(
        spark.read.parquet(streamDir).select(cols.map(col): _*))
      (batch, stream) match {
        case (Some(b), Some(s)) => b.unionByName(s)
        case (Some(b), None) => b
        case (None, Some(s)) => s
        case (None, None) =>
          throw new IllegalArgumentException(s"no MG store under $base")
      }
    }
    val summed = unioned(mgCountersDir(base), streamMgCountersDir(base),
        Seq("source", "t", "c"))
      .groupBy("source", "t").agg(sum("c").as("c"))
    val rkW = Window.partitionBy(col("source")).orderBy(col("c").desc, col("t"))
    val lamM = summed.withColumn("rk", row_number().over(rkW))
      .groupBy("source")
      .agg(coalesce(max(when(col("rk") === SketchQueries.MgK + 1, col("c"))), lit(0L))
        .as("lam_m"))
    val counters = summed.join(broadcast(lamM), Seq("source"))
      .select(col("source"), col("t"), (col("c") - col("lam_m")).as("c"))
      .filter(col("c") > 0)
    val lambdas = unioned(mgLambdasDir(base), streamMgLambdasDir(base),
        Seq("source", "lam"))
      .groupBy("source").agg(sum("lam").as("lam"))
      .join(broadcast(lamM), Seq("source"), "left")
      .select(col("source"),
        (col("lam") + coalesce(col("lam_m"), lit(0L))).as("lam"))
    (counters, lambdas)
  }

  /** Build-on-first-use for the MG summary store. λs are written before
    * the counters marker: a crash window can leave λs-only (the next
    * ensure rebuilds both), never counters over missing λs. */
  def ensureHeavyHitters(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${mgCountersDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) {
      val (counters, lambdas) = SketchQueries.mgSummaries(
        SketchQueries.sourceTokenCounts(documents(spark, sfDir)))
      lambdas.write.mode("overwrite").parquet(mgLambdasDir(base))
      counters.write.mode("overwrite").parquet(mgCountersDir(base))
    }
    readHeavyHitters(spark, base)
  }

  /** Compact the MG store — a two-table seal like [[compactBm25]]: both
    * resolves materialize into tmp dirs BEFORE any directory is touched
    * (the resolve reads the dirs being replaced), then λs swap first and
    * counters last, so a crash window never leaves a counters marker
    * over a stale λ budget. Sealing is value-idempotent: re-resolving a
    * compacted store re-prunes with λ_m = 0 and adds nothing to λ. */
  def compactHeavyHitters(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamMgCountersDir(base)) ||
        hasData(spark, streamMgLambdasDir(base))) {
      import org.apache.hadoop.fs.Path
      val (c, l) = readHeavyHitters(spark, base)
      val tmpC = s"${mgCountersDir(base)}_compact_tmp"
      val tmpL = s"${mgLambdasDir(base)}_compact_tmp"
      c.write.mode("overwrite").parquet(tmpC)
      l.write.mode("overwrite").parquet(tmpL)
      val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(mgLambdasDir(base)), true)
      require(fs.rename(new Path(tmpL), new Path(mgLambdasDir(base))),
        s"compaction rename $tmpL failed")
      fs.delete(new Path(mgCountersDir(base)), true)
      require(fs.rename(new Path(tmpC), new Path(mgCountersDir(base))),
        s"compaction rename $tmpC failed")
      fs.delete(new Path(streamMgCountersDir(base)), true)
      fs.delete(new Path(streamMgLambdasDir(base)), true)
      graft.util.Tables.evict(mgLambdasDir(base))
      graft.util.Tables.evict(mgCountersDir(base))
    }

  def imagePhashDir(base: String) = s"$base/image_phash"

  /** Streaming fingerprint appends, batch_id-partitioned (same layout
    * rationale as [[streamMinhashDir]]). */
  def streamImagePhashDir(base: String) = s"$base/image_phash_stream"

  /** Persisted image fingerprints (doc_id, phash) — the multimodal
    * member of the store layer: decode+hash runs once per image version
    * (the expensive stage: a full ImageIO decode per payload), and every
    * dedup/audit run reads 16 bytes per image instead of re-decoding
    * pixels. Stream rows resolve LATEST-WINS per doc (a re-ingested
    * image's newest epoch replaces its fingerprint), then stream docs
    * supersede their batch rows — the [[readBm25]] contract. */
  def readImagePhash(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, imagePhashDir(base)))(
      readSealed(spark, imagePhashDir(base)).select("doc_id", "phash"))
    val stream = Option.when(hasData(spark, streamImagePhashDir(base))) {
      val raw = spark.read.parquet(streamImagePhashDir(base))
        .select(col("doc_id"), col("phash"), col("batch_id").cast("long").as("batch_id"))
      val latest = raw.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      raw.join(latest, Seq("doc_id", "batch_id"))
        .select("doc_id", "phash").distinct()
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        val streamDocs = s.select("doc_id").distinct()
        b.join(streamDocs, Seq("doc_id"), "left_anti").unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no image-phash store under $base")
    }
  }

  /** Image fingerprints for `sfDir`, building (decode + hash over the
    * synthesized PNG payloads) on first use. `mm_image_phash` times the
    * live decode; `mm_image_phash_stored` reads this artifact, held to
    * the same oracle. */
  def ensureImagePhash(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${imagePhashDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      Multimodal.imagePhash(Multimodal.pngAssets(documents(spark, sfDir)))
        .write.mode("overwrite").parquet(imagePhashDir(base))
    readImagePhash(spark, base)
  }

  /** Compact the image-phash store (latest-wins resolve). */
  def compactImagePhash(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamImagePhashDir(base)))
      compactInto(spark, imagePhashDir(base), streamImagePhashDir(base),
        readImagePhash(spark, base))

  def frameDiffDir(base: String) = s"$base/frame_diffs"

  /** Streaming frame-diff appends, batch_id-partitioned (same layout
    * rationale as [[streamMinhashDir]]). */
  def streamFrameDiffDir(base: String) = s"$base/frame_diffs_stream"

  /** Persisted per-video frame-pair energies (doc_id, idx, diff_l1) —
    * the video member of the store layer: the pair kernel (32 byte
    * deltas per consecutive-frame pair, the expensive corpus pass) runs
    * once per video version, and every cut/segment/keyframe consumer
    * reads pair-cardinality rows. Stream rows resolve LATEST-WINS per
    * doc (a re-ingested video's newest epoch replaces its WHOLE pair
    * set — pair rows are per-version atomic, a shorter re-upload must
    * not leave stale high-idx rows), then stream docs supersede their
    * batch rows — the [[readImagePhash]] contract. */
  def readFrameDiffs(spark: SparkSession, base: String): DataFrame = {
    val batch = Option.when(hasData(spark, frameDiffDir(base)))(
      readSealed(spark, frameDiffDir(base)).select("doc_id", "idx", "diff_l1"))
    val stream = Option.when(hasData(spark, streamFrameDiffDir(base))) {
      val raw = spark.read.parquet(streamFrameDiffDir(base))
        .select(col("doc_id"), col("idx"), col("diff_l1"),
          col("batch_id").cast("long").as("batch_id"))
      val latest = raw.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      raw.join(latest, Seq("doc_id", "batch_id"))
        .select("doc_id", "idx", "diff_l1").distinct()
    }
    (batch, stream) match {
      case (Some(b), Some(s)) =>
        val streamDocs = s.select("doc_id").distinct()
        b.join(streamDocs, Seq("doc_id"), "left_anti").unionByName(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no frame-diff store under $base")
    }
  }

  /** Frame-pair energies for `sfDir`, building on first use.
    * `mm_shot_boundaries` / `mm_keyframe_pick` time the live kernel;
    * their `_stored` twins read this artifact, held to the same
    * oracles. */
  def ensureFrameDiffs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${frameDiffDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      Multimodal.frameDiffs(documents(spark, sfDir))
        .write.mode("overwrite").parquet(frameDiffDir(base))
    readFrameDiffs(spark, base)
  }

  /** Compact the frame-diff store (latest-wins resolve). */
  def compactFrameDiffs(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamFrameDiffDir(base)))
      compactInto(spark, frameDiffDir(base), streamFrameDiffDir(base),
        readFrameDiffs(spark, base))

  /** Compact the IVF assignment store (latest-wins per vec_id). */
  def compactIvfAssignments(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamIvfDir(base)))
      compactInto(spark, ivfDir(base), streamIvfDir(base),
        readIvfAssignments(spark, base))

  /** Compact the int8-quantized vector store (latest-wins per vec_id). */
  def compactQuantizedVectors(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamQ8Dir(base)))
      compactInto(spark, q8Dir(base), streamQ8Dir(base),
        readQuantizedVectors(spark, base))

  /** Compact the PQ code store (latest-wins per vec_id; the codebook
    * artifact is immutable and untouched). Unlike the other seals this
    * cannot reuse the reader verbatim: [[readPqCodes]] returns the
    * UNPACKED per-subspace rows, while the batch subtree stores the
    * packed 8-byte codes — so the resolve here runs on the PACKED
    * form (the same latest-wins rule, before unpacking). */
  def compactPqCodes(spark: SparkSession, base: String): Unit =
    if (hasData(spark, streamPqDir(base))) {
      val batch = Option.when(hasData(spark, pqCodesDir(base)))(
        readSealed(spark, pqCodesDir(base)).select("vec_id", "codes"))
      val stream = spark.read.parquet(streamPqDir(base))
        .select(col("vec_id"), col("codes"), col("batch_id").cast("long").as("batch_id"))
        .groupBy("vec_id")
        .agg(max_by(col("codes"), col("batch_id")).as("codes"))
      val resolved = batch match {
        case Some(b) =>
          b.join(stream.select("vec_id"), Seq("vec_id"), "left_anti")
            .unionByName(stream)
        case None => stream
      }
      compactInto(spark, pqCodesDir(base), streamPqDir(base), resolved)
    }

  def bm25PostingsDir(base: String) = s"$base/bm25_postings"
  def bm25DoclensDir(base: String) = s"$base/bm25_doclens"

  /** Streaming postings appends land in a batch_id-partitioned SIBLING
    * subtree (same rationale as [[streamMinhashDir]]); [[readBm25]]
    * unions both, so search transparently sees stream-ingested docs. */
  def streamBm25Dir(base: String) = s"$base/bm25_postings_stream"

  /** Stored postings + doclens at `base`: the batch subtrees and/or the
    * stream-append subtree (a store may be purely batch-built, purely
    * stream-built, or both — same contract as [[readMinhashBands]]).
    * Doc versions resolve LATEST-WINS keyed on doc_id: a doc re-ingested
    * with CHANGED text keeps only its newest batch's (token, tf, dl)
    * rows and one doclens row — full-row distinct alone would retain
    * both versions and inflate tf/df and the corpus stats. Byte-identical
    * replays were already idempotent (dynamic partition overwrite of the
    * batch_id partition); this extends the contract to content changes.
    * The version resolve is one max aggregate on doc_id (tiny next to
    * the postings themselves) + a semi-join; stream doclens derive from
    * the postings rows (every doc has ≥1 posting — the tokenizer never
    * returns an empty array). */
  def readBm25(spark: SparkSession, base: String): (DataFrame, DataFrame) = {
    val batch = Option.when(hasData(spark, bm25PostingsDir(base)))(
      (readSealed(spark, bm25PostingsDir(base)),
        readSealed(spark, bm25DoclensDir(base))))
    val stream = Option.when(hasData(spark, streamBm25Dir(base))) {
      val raw = spark.read.parquet(streamBm25Dir(base))
        .select(col("doc_id"), col("token"), col("tf"), col("dl"),
          col("batch_id").cast("long").as("batch_id"))
      val latest = raw.groupBy("doc_id").agg(max("batch_id").as("batch_id"))
      val sp = raw.join(latest, Seq("doc_id", "batch_id"))
        .select("doc_id", "token", "tf", "dl").distinct()
      (sp, sp.select(col("doc_id"), col("dl")).distinct())
    }
    (batch, stream) match {
      case (Some((bp, bl)), Some((sp, sl))) =>
        // A stream-ingested version supersedes the batch rows of the
        // same doc (anti-join prune), so tf/df/n never double-count.
        val streamDocs = sp.select("doc_id").distinct()
        (bp.join(streamDocs, Seq("doc_id"), "left_anti").unionByName(sp),
          bl.join(streamDocs, Seq("doc_id"), "left_anti").unionByName(sl))
      case (Some(b), None) => b
      case (None, Some(s)) => s
      case (None, None) =>
        throw new IllegalArgumentException(s"no bm25 postings store under $base")
    }
  }

  /** Persisted BM25 postings ((doc_id, token, tf, dl) over ALL documents
    * — query-set agnostic) plus the per-doc length table (doc_id, dl)
    * the corpus stats derive from, building on first use. The postings
    * build (token explode + corpus-wide (doc, token) aggregate) is the
    * expensive stage of search and changes only when documents change;
    * `bm25_search` times the live build, `bm25_search_stored` is held to
    * the same oracle and never re-tokenizes corpus text. */
  def ensureBm25(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${bm25PostingsDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString)) {
      val docs = documents(spark, sfDir)
      SearchQueries.doclensOf(docs)
        .write.mode("overwrite").parquet(bm25DoclensDir(base))
      SearchQueries.postingsOf(docs)
        .write.mode("overwrite").parquet(bm25PostingsDir(base))
    }
    // spread the postings across all cores at the SERVING boundary: a
    // fixture-scale store arrives as one input split, which serializes
    // every consumer's broadcast-join + partial-agg map stage onto one
    // task (measured: bool_search_and_stored ran SLOWER than its live
    // twin, 1.00 vs 0.59 s — the live path already spreads). At 100 TB
    // the store is many splits and the widen is a no-op; compaction and
    // stream plumbing use readBm25 directly and keep their layout.
    // HASH-spread by doc_id (not round-robin): every consumer
    // aggregates per document or per (qid, doc) — keeping a doc's
    // postings on one partition lets those partial aggs collapse
    // map-side (round-robin inflated bm25_search_stored's contribution
    // exchange to one partial row per (pair, partition) — 7 of its 10
    // task-CPU-seconds, stage-profiled r11).
    val (p, l) = readBm25(spark, base)
    (TextQueries.spreadBy(p, col("doc_id")), l)
  }

  def bm25TopkDir(base: String) = s"$base/bm25_topk"

  /** Ranked-results face — the 22nd store face: the BM25 top-10 per
    * eval query (qid, doc_id, rank, score), built once from the
    * postings store by [[SearchQueries.bm25TopKOf]]. Eval consumers
    * (snippets, RBO, fusion legs, PRF round 1, hard negatives, context
    * packing) read ≤10×queries rows instead of re-running retrieval.
    * BM25 scores depend on corpus-wide stats (df, avgdl), so this face
    * is a SNAPSHOT: stream appends to the postings store do not patch
    * it (no exact incremental top-k exists under BM25). The
    * [[compactBm25]] seal DROPS a stale face so it can never be served
    * past the seal; [[refreshBm25TopK]] rebuilds it eagerly. */
  def ensureBm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    // this face is swapDir-maintained ([[refreshBm25TopK]]): a crash in
    // the park→rename window leaves the snapshot at `_bak` while a
    // same-session probeMemo pin on the marker would skip the rebuild
    // and fail on the missing directory — restore the park FIRST, like
    // [[readClusters]] (r11 advisor)
    recoverFromBak(spark, bm25TopkDir(base))
    val marker = new Path(s"${bm25TopkDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      SearchQueries.bm25TopKOf(spark, sfDir)
        .write.mode("overwrite").parquet(bm25TopkDir(base))
    readSealed(spark, bm25TopkDir(base))
  }

  /** Rebuild the ranked-results snapshot from the current postings
    * store — the seal-time companion of [[compactBm25]] (tmp-and-swap,
    * same crash discipline as [[compactInto]]). */
  def refreshBm25TopK(spark: SparkSession, sfDir: String): Unit = {
    val base = defaultBase(spark, sfDir)
    val tmp = s"${bm25TopkDir(base)}_compact_tmp"
    SearchQueries.bm25TopKOf(spark, sfDir).write.mode("overwrite").parquet(tmp)
    swapDir(spark, bm25TopkDir(base), tmp)
  }

  def linesDir(base: String) = s"$base/line_registry"

  /** Streaming appends land in a sibling subtree (same rationale as
    * [[streamMinhashDir]]: the stream writer partitions by `batch_id`,
    * and mixing partition depths breaks parquet discovery). */
  def streamLinesDir(base: String) = s"$base/line_registry_stream"

  /** The first-occurrence line registry — (line_fp, first_doc,
    * first_idx), md5 only, never text — unioned across the batch build
    * and stream appends, resolved FIRST-WINS: the owner of a line is the
    * global minimum (first_doc, first_idx) over every candidate row, so
    * the result is independent of micro-batch arrival order (a replayed
    * or late batch can only propose the same or a later owner, and a
    * late batch carrying a LOWER doc_id correctly takes ownership).
    * Contrast with the bm25/IVF stores, which resolve LATEST-wins:
    * supersession direction follows the semantic (newest content version
    * there, earliest occurrence here). */
  def readLineRegistry(spark: SparkSession, base: String): DataFrame = {
    def resolve(df: DataFrame) =
      df.groupBy("line_fp")
        .agg(min(struct(col("first_doc"), col("first_idx"))).as("o"))
        .select(col("line_fp"), col("o.first_doc").as("first_doc"),
          col("o.first_idx").as("first_idx"))
    val batch = Option.when(hasData(spark, linesDir(base)))(
      readSealed(spark, linesDir(base))
        .select("line_fp", "first_doc", "first_idx"))
    val stream = Option.when(hasData(spark, streamLinesDir(base)))(
      spark.read.parquet(streamLinesDir(base))
        .select("line_fp", "first_doc", "first_idx"))
    (batch, stream) match {
      case (Some(b), Some(s)) => resolve(b.unionByName(s))
      case (Some(b), None) => b // the batch build is already one-row-per-line
      case (None, Some(s)) => resolve(s)
      case (None, None) =>
        throw new IllegalArgumentException(s"no line registry under $base")
    }
  }

  /** First-occurrence line registry for `sfDir`, building on first use.
    * The corpus-wide line window (the expensive stage of line dedup —
    * every 10-token line of every document shuffles once) runs once per
    * corpus version; `dedup_lines` times the live window,
    * `dedup_lines_stored` re-splits its documents map-side and
    * equi-joins this artifact, held to the same oracle. */
  def ensureLineRegistry(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${linesDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      TextQueries.lineRegistryOf(TextQueries.linesOf(documents(spark, sfDir)))
        .write.mode("overwrite").parquet(linesDir(base))
    readLineRegistry(spark, base)
  }

  def clustersDir(base: String) = s"$base/clusters"

  /** Near-dup cluster assignments (doc_id, cluster_id) for `sfDir`,
    * building on first use. The second amortization tier: the
    * connected-components fixpoint over the LSH graph is iterative (the
    * expensive part of the dedup family) and, like the signatures it is
    * derived from, changes only when documents change — so curation /
    * selection runs consume the persisted assignment table instead of
    * re-running the fixpoint. `dedup_clusters` times the live compute;
    * this store is what a production corpus pipeline reads. */
  def ensureClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = defaultBase(spark, sfDir)
    val marker = new Path(s"${clustersDir(base)}/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sealedMarkerExists(spark, marker.toString))
      TextQueries.clusterAssignments(spark, sfDir)
        .write.mode("overwrite").parquet(clustersDir(base))
    readSealed(spark, clustersDir(base))
  }

  /** Current cluster assignments at `base`, empty when never built.
    * Recovers a parked `_bak` first: the cluster store is maintained by
    * [[swapDir]] every micro-batch, so a crashed swap must restore the
    * previous epoch rather than silently read as empty. */
  def readClusters(spark: SparkSession, base: String): DataFrame = {
    recoverFromBak(spark, clustersDir(base))
    if (hasData(spark, clustersDir(base), cacheable = false))
      readSealed(spark, clustersDir(base)).select("doc_id", "cluster_id")
    else spark.range(0)
      .select(col("id").as("doc_id"), col("id").as("cluster_id"))
  }

  /** INCREMENTAL connected-components maintenance — the streaming twin
    * of the cluster store (batch rebuilds run the full fixpoint; a
    * micro-batch must not). A delta of candidate pairs can only (a)
    * attach new docs and (b) MERGE existing components, and both are
    * expressible over component LABELS instead of members:
    *
    *   1. map each delta-pair endpoint to its current label (unseen
    *      docs label themselves) — a broadcast-sized join against the
    *      store;
    *   2. the distinct (labelA ≠ labelB) pairs are the COMPONENT-graph
    *      edges this delta creates: bounded by the delta's touched
    *      components, so a driver union-find (min-label merge) resolves
    *      them — the repo's bounded-driver-fold discipline, applied
    *      after the distributed distinct;
    *   3. rewrite = one broadcast remap join over the store plus the
    *      delta docs' new rows; tmp-write → swap, so readers never see
    *      a partial state.
    *
    * Exactness: each component's label is its min member, and min is
    * associative over merges — so ingesting a corpus in ANY micro-batch
    * split yields bit-identical assignments to the one-shot fixpoint
    * over the union (spec-pinned). Replay-idempotent: re-merging merged
    * labels is a no-op and re-appended docs already exist. Crash window
    * (pairs appended, clusters not yet merged) heals at the next
    * [[compactClusters]] seal, which recomputes the fixpoint from the
    * pair store. */
  def updateClustersWithDelta(spark: SparkSession, base: String,
      deltaDocs: DataFrame, deltaPairRows: DataFrame): Unit = {
    val cur = readClusters(spark, base).localCheckpoint()
    val labeled = deltaPairRows.select("doc_a", "doc_b")
      .join(cur.select(col("doc_id").as("doc_a"), col("cluster_id").as("la0")),
        Seq("doc_a"), "left")
      .join(cur.select(col("doc_id").as("doc_b"), col("cluster_id").as("lb0")),
        Seq("doc_b"), "left")
      .select(coalesce(col("la0"), col("doc_a")).as("la"),
        coalesce(col("lb0"), col("doc_b")).as("lb"),
        col("doc_a"), col("doc_b"))
      .localCheckpoint()
    // component-graph edges: distinct label pairs (bounded, driver fold)
    val edges = labeled.filter(col("la") =!= col("lb"))
      .select("la", "lb").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min-label merge
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val remap = parent.keys.map(k => k -> find(k)).filter(p => p._1 != p._2).toSeq
    import spark.implicits._
    val remapDf = broadcast(remap.toDF("old_label", "new_label"))
    // docs entering the store this delta: the batch docs plus any pair
    // endpoint not yet assigned (a band-store-only doc can surface here)
    val newDocs = deltaDocs.select("doc_id")
      .unionByName(labeled.select(col("doc_a").as("doc_id")))
      .unionByName(labeled.select(col("doc_b").as("doc_id")))
      .distinct()
      .join(cur.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    val next = cur.unionByName(newDocs)
      .join(remapDf, col("cluster_id") === col("old_label"), "left")
      .select(col("doc_id"),
        coalesce(col("new_label"), col("cluster_id")).as("cluster_id"))
    val tmp = s"${clustersDir(base)}_update_tmp"
    next.write.mode("overwrite").parquet(tmp)
    swapDir(spark, clustersDir(base), tmp)
  }

  /** Seal for the cluster store: recompute the full fixpoint from the
    * (compacted) pair store — reconciles the crash window between a
    * pair append and its cluster merge. The doc universe is the union
    * of the cluster store, the pair endpoints AND the band store's
    * doc_ids: deriving it from the cluster store alone would SEAL a
    * loss if that store were ever damaged (every appended doc has band
    * rows, so the band store is the durable roll-call; singletons
    * resolve to themselves). */
  def compactClusters(spark: SparkSession, base: String): Unit = {
    val pairs = readPairs(spark, base, "k8")
    val docs = readClusters(spark, base).select("doc_id")
      .unionByName(pairs.select(col("doc_a").as("doc_id")))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .unionByName(
        tryReadMinhashBands(spark, base, excludeBatch = None)
          .map(_.select("doc_id"))
          .getOrElse(spark.range(0).select(col("id").as("doc_id"))))
      .distinct()
    val resolved = TextQueries.clusterAssignmentsOf(docs, pairs)
    val tmp = s"${clustersDir(base)}_compact_tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    swapDir(spark, clustersDir(base), tmp)
  }
}
