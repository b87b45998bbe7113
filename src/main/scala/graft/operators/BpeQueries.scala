package graft.operators

import graft.QueryDef
import graft.functions.BpeMerge.{bpe_apply_merges, bpe_merge_pair}
import graft.util.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING over `documents`
  * — the tokenizer-construction side of a training-data pipeline
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"). The suite already counts tokens under a
  * fixed scheme; these operators LEARN the scheme from the corpus and
  * apply it, end to end on Spark, with every step mirrored in DuckDB.
  *
  * Algorithm (classic corpus BPE):
  *   1. word-frequency table: one corpus scan → (word, count) — all
  *      later work is vocab-sized, never corpus-sized (the standard
  *      trick that makes BPE training tractable at 100 TB: 10¹¹ corpus
  *      words collapse to ~10⁸ distinct ones before any iteration).
  *   2. seed segmentation: characters + a terminal '</w>' symbol.
  *   3. K iterations: count adjacent symbol pairs weighted by word
  *      count (vocab-sized shuffle on 2-symbol keys), pick the max
  *      (total tie-break: count DESC, left ASC, right ASC — the one
  *      driver-side row per iteration, the algorithm's inherent sync
  *      point), and apply the merge greedily-leftmost to every word via
  *      the native [[graft.functions.BpeMergePair]] (a projection, NO
  *      shuffle — the relational alternative would explode + window +
  *      rebuild the whole vocab per iteration, 3K shuffles for nothing).
  *   4. encode: apply the rank-ordered merges with
  *      [[graft.functions.BpeApplyMerges]] — one pass per merge is
  *      exact (see its scaladoc) — as a stateless projection pipelined
  *      into the corpus scan; or equivalently, for corpus totals, join
  *      the already-segmented vocab (counts ride along, zero text
  *      reprocessing).
  *
  * The DuckDB oracle reproduces the ENTIRE training chain relationally,
  * K chained CTE blocks: explode with `generate_subscripts`, pair
  * counts via `lead()`, the winner by the same total order, and the
  * greedy-leftmost application as candidate-island parity (a candidate
  * survives iff its offset within a run of consecutive candidates is
  * even — overlaps only arise for `(a,a)` merges, and parity is exactly
  * greedy-leftmost). Training, segments, out-of-vocabulary encode, and
  * corpus totals are each gated bit-for-bit against that chain.
  *
  * Training state is memoized per (session, sf-dir): the five faces
  * share one trained tokenizer, like the signature stores share their
  * sealed artifacts.
  *
  * Relation to the `bpe_*` family in [[CurationQueries]]: that one is
  * the CHARACTER-SENTINEL formulation (k=3 merges of 2-char substrings,
  * each compressed to a chr(k) sentinel via `replace()` — no word
  * boundary symbol, pairs counted within raw words). This module is the
  * full subword-unit formulation: symbol SEQUENCES with a terminal
  * '</w>' (so end-of-word merges like `er</w>` are learnable — they
  * dominate real ranks), merges compose into multi-character symbols
  * directly, and application is the native greedy-leftmost expression
  * rather than string replace. The two make different (both correct)
  * trade-offs; the sentinel one mirrors entirely in string SQL, this
  * one exercises list-typed relational state on both engines.
  */
object BpeQueries {

  /** Merge count — deep enough that multi-character symbols merge with
    * each other (rank 6+ on the base corpus) while keeping the oracle's
    * chained-CTE mirror readable. */
  private[operators] val K = 8

  final case class Trained(merges: Seq[(String, String, Long)], vocab: DataFrame)

  private val memo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, Trained]]())

  private def perSession(s: SparkSession) = memo.synchronized {
    var m = memo.get(s)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, Trained]
      memo.put(s, m)
    }
    m
  }

  private def trained(s: SparkSession, dir: String): Trained =
    perSession(s).getOrElseUpdate(dir, train(s, dir))

  /** Fresh training run (the LIVE face's path — `bpe_train_merges` is
    * always timed training, never a memo hit; the result replaces the
    * memo so the consumer faces stay coherent with the newest run). */
  private def retrain(s: SparkSession, dir: String): Trained = {
    val t = train(s, dir)
    perSession(s).put(dir, t).foreach(_.vocab.unpersist())
    t
  }

  private def train(s: SparkSession, dir: String): Trained = {
    val words = documents(s, dir)
      .filter(col("text").isNotNull)
      .select(explode(graft.functions.WsTokens.ws_tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    // ONE materialization of the word-frequency table (the corpus
    // scan); iterations stack bpe_merge_pair projections on top of it —
    // a vocab-sized recompute per pair-count job, K²/2 projection
    // passes total, which beats K extra persist+count jobs of pure
    // scheduling overhead (measured: 18 → 10 jobs, −25% training wall
    // at every Z point, curve still flat). The FINAL segmentation
    // persists for the consumer faces.
    val base = TextQueries.spread(words)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(expr("regexp_extract_all(word, '.', 0)"), array(lit("</w>"))))
      .persist()
    base.count()
    var vocab = base
    val merges = Seq.newBuilder[(String, String, Long)]
    var r = 1
    while (r <= K) {
      val winners = vocab
        .select(col("cnt"), explode(expr(
          "zip_with(slice(syms, 1, size(syms)-1), slice(syms, 2, size(syms)-1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1).collect()
      if (winners.isEmpty)
        throw new IllegalArgumentException(
          s"BPE training: no symbol pairs at iteration $r — the corpus at " +
            s"$dir has no (or only fully-merged single-symbol) words")
      val top = winners(0)
      val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((a, b, c))
      vocab = vocab.withColumn("syms", bpe_merge_pair(col("syms"), lit(a), lit(b)))
      r += 1
    }
    val fin = vocab.persist()
    fin.count()
    base.unpersist()
    Trained(merges.result(), fin)
  }

  // ----- DuckDB mirror: the K-iteration training chain -----------------

  /** CTE prelude: word counts + seed segmentation (chars + '</w>'). */
  private val seedSql =
    """t AS (SELECT trim(lower(text)) AS t FROM documents WHERE text IS NOT NULL),
      |wrd AS (SELECT unnest(string_split_regex(t, '\s+')) AS word FROM t),
      |vocab AS (SELECT word, count(*)::BIGINT AS cnt FROM wrd WHERE word <> '' GROUP BY word),
      |seg0 AS (SELECT word, cnt, list_append(regexp_extract_all(word, '.'), '</w>') AS syms FROM vocab)"""
      .stripMargin

  /** One training iteration: pair counts over seg{k-1}, winner w{k}
    * (count DESC, left ASC, right ASC), greedy-leftmost application via
    * candidate-island parity → seg{k}. */
  private def iterBlock(k: Int): String =
    s"""e$k AS (
       |  SELECT word, cnt, unnest(syms) AS sym, generate_subscripts(syms, 1) AS pos
       |  FROM seg${k - 1}),
       |l$k AS (
       |  SELECT word, cnt, pos, sym,
       |         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |  FROM e$k),
       |w$k AS (
       |  SELECT sym AS a, nxt AS b, sum(cnt)::BIGINT AS c
       |  FROM l$k WHERE nxt IS NOT NULL
       |  GROUP BY sym, nxt ORDER BY c DESC, a, b LIMIT 1),
       |m$k AS (
       |  SELECT l.word, l.cnt, l.pos, l.sym, (l.sym = w.a AND l.nxt = w.b) AS cand
       |  FROM l$k l CROSS JOIN w$k w),
       |i$k AS (
       |  SELECT *, CASE WHEN cand THEN pos - row_number()
       |           OVER (PARTITION BY word, cand ORDER BY pos) END AS island
       |  FROM m$k),
       |k$k AS (
       |  SELECT *, cand AND ((pos - min(pos) OVER (PARTITION BY word, cand, island)) % 2 = 0) AS kept
       |  FROM i$k),
       |r$k AS (
       |  SELECT word, cnt, pos,
       |         CASE WHEN kept THEN sym || lead(sym) OVER (PARTITION BY word ORDER BY pos)
       |              ELSE sym END AS sym2,
       |         coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), false) AS consumed
       |  FROM k$k),
       |seg$k AS (
       |  SELECT word, cnt, list(sym2 ORDER BY pos) AS syms
       |  FROM r$k WHERE NOT consumed GROUP BY word, cnt)""".stripMargin

  /** Encode-only iteration: apply the ALREADY-LEARNED winner w{k} to a
    * holdout segmentation hseg{k-1} (same parity walk, no recount). */
  private def applyBlock(k: Int): String =
    s"""he$k AS (
       |  SELECT word, unnest(syms) AS sym, generate_subscripts(syms, 1) AS pos FROM hseg${k - 1}),
       |hl$k AS (
       |  SELECT word, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM he$k),
       |hm$k AS (
       |  SELECT l.word, l.pos, l.sym, (l.sym = w.a AND l.nxt = w.b) AS cand
       |  FROM hl$k l CROSS JOIN w$k w),
       |hi$k AS (
       |  SELECT *, CASE WHEN cand THEN pos - row_number()
       |           OVER (PARTITION BY word, cand ORDER BY pos) END AS island FROM hm$k),
       |hk$k AS (
       |  SELECT *, cand AND ((pos - min(pos) OVER (PARTITION BY word, cand, island)) % 2 = 0) AS kept
       |  FROM hi$k),
       |hr$k AS (
       |  SELECT word, pos,
       |         CASE WHEN kept THEN sym || lead(sym) OVER (PARTITION BY word ORDER BY pos)
       |              ELSE sym END AS sym2,
       |         coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), false) AS consumed
       |  FROM hk$k),
       |hseg$k AS (
       |  SELECT word, list(sym2 ORDER BY pos) AS syms FROM hr$k WHERE NOT consumed GROUP BY word)"""
      .stripMargin

  private[operators] def trainChain: String =
    (seedSql +: (1 to K).map(iterBlock)).mkString(",\n")

  private def mergesLit(t: Trained) =
    typedLit(t.merges.map { case (a, b, _) => s"$a $b" })

  /** Trained merge table as a DataFrame — the artifact
    * [[SignatureStore.ensureBpeMerges]] persists, so encode can run in a
    * LATER session without retraining (training is the expensive corpus
    * scan; the merge list is K rows). */
  private[operators] def trainedMergesDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trained(s, dir).merges.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1, a, b, c) }
      .toDF("rank", "left_sym", "right_sym", "pair_freq")
  }

  /** Rank-ordered "a b" merge strings from a STORED merge table (the
    * [[trainedMergesDf]] schema read back) — bounded collect: K rows. */
  private[operators] def mergesFromStore(stored: DataFrame): Seq[String] = {
    val rows = stored.orderBy("rank").collect()
    require(rows.nonEmpty, "bpe merge store is empty")
    rows.map(r => s"${r.getString(1)} ${r.getString(2)}").toSeq
  }

  /** Shared oracle for the live and stored encode faces (training is
    * deterministic, so the stored artifact encodes identically). */
  private def encodeDocsSql: String =
    s"""WITH $trainChain,
       |dw AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       |dwf AS (SELECT doc_id, word FROM dw WHERE word <> '')
       |SELECT d.doc_id, count(*)::BIGINT AS n_words, sum(len(g.syms))::BIGINT AS bpe_tokens
       |FROM dwf d JOIN seg$K g USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  private def encodeDocs(s: SparkSession, d: String,
      merges: org.apache.spark.sql.Column): DataFrame =
    TextQueries.spread(documents(s, d).filter(col("text").isNotNull))
      .select(col("doc_id"),
        explode(graft.functions.WsTokens.ws_tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .withColumn("syms", bpe_apply_merges(
        concat(expr("regexp_extract_all(word, '.', 0)"), array(lit("</w>"))),
        merges))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms")).cast("long")).as("bpe_tokens"))
      .orderBy("doc_id")

  val defs: Map[String, QueryDef] = Map(

    // ----- BPE training: the learned merge table ------------------------
    // K iterations of weighted pair counting over the word-frequency
    // vocab; one driver-side winner row per iteration. Oracle: the same
    // K iterations as chained CTEs, winners unioned in rank order.
    "bpe_train_merges" -> QueryDef.sql(
      s"""WITH $trainChain
         |SELECT * FROM (
         |${(1 to K).map(k =>
             s"SELECT $k AS rank, a AS left_sym, b AS right_sym, c AS pair_freq FROM w$k")
             .mkString(" UNION ALL ")}
         |) ORDER BY rank""".stripMargin) { (s, d) =>
      val t = retrain(s, d)
      import s.implicits._
      t.merges.zipWithIndex
        .map { case ((a, b, c), i) => (i + 1, a, b, c) }
        .toDF("rank", "left_sym", "right_sym", "pair_freq")
        .orderBy("rank")
    },

    // ----- the segmented vocabulary after K merges ----------------------
    "bpe_vocab_segments" -> QueryDef.sql(
      s"""WITH $trainChain
         |SELECT word, array_to_string(syms, ' ') AS seg, len(syms)::BIGINT AS n_syms
         |FROM seg$K ORDER BY word""".stripMargin) { (s, d) =>
      trained(s, d).vocab
        .select(col("word"), array_join(col("syms"), " ").as("seg"),
          size(col("syms")).cast("long").as("n_syms"))
        .orderBy("word")
    },

    // ----- out-of-vocabulary encode -------------------------------------
    // The learned merges applied in rank order to strings the trainer
    // never saw (every vocab word doubled around a '~' separator —
    // injective, so the holdout set is deterministic, and pure
    // concatenation, which both engines define identically at the
    // code-point level; reverse() would NOT be — Spark reverses code
    // points while DuckDB reverses grapheme clusters, diverging on
    // combining-character sequences). This grades the per-string merge
    // application itself: Spark runs the native bpe_apply_merges
    // expression; DuckDB re-walks the K parity blocks against the
    // training chain's winners.
    "bpe_encode_oov" -> QueryDef.sql(
      s"""WITH $trainChain,
         |hseg0 AS (
         |  SELECT word || '~' || word AS word,
         |         list_append(regexp_extract_all(word || '~' || word, '.'), '</w>') AS syms
         |  FROM vocab),
         |${(1 to K).map(applyBlock).mkString(",\n")}
         |SELECT word, array_to_string(syms, ' ') AS seg, len(syms)::BIGINT AS n_syms
         |FROM hseg$K ORDER BY word""".stripMargin) { (s, d) =>
      val t = trained(s, d)
      t.vocab
        .select(concat_ws("~", col("word"), col("word")).as("word"))
        .withColumn("syms", bpe_apply_merges(
          concat(expr("regexp_extract_all(word, '.', 0)"), array(lit("</w>"))),
          mergesLit(t)))
        .select(col("word"), array_join(col("syms"), " ").as("seg"),
          size(col("syms")).cast("long").as("n_syms"))
        .orderBy("word")
    },

    // ----- corpus-scale encode: per-document BPE token counts -----------
    // The realistic 100 TB face: bpe_apply_merges as a stateless
    // projection inside the corpus scan (per word instance), aggregated
    // per document. The oracle takes the equivalent vocab-join route —
    // the two paths agreeing is the point.
    "bpe_encode_docs" -> QueryDef.sql(encodeDocsSql) { (s, d) =>
      encodeDocs(s, d, mergesLit(trained(s, d)))
    },

    // ----- stored/serve encode: the persisted tokenizer artifact --------
    // Same plan as bpe_encode_docs, but the merges come from the SEALED
    // [[SignatureStore.ensureBpeMerges]] parquet artifact instead of the
    // session memo — a later session (or another consumer entirely)
    // encodes WITHOUT re-paying training. Training is deterministic, so
    // the stored and live paths share one oracle; the gate holding on
    // both IS the stored≡live assertion, the SignatureStore convention.
    "bpe_encode_docs_stored" -> QueryDef.sql(encodeDocsSql) { (s, d) =>
      encodeDocs(s, d,
        typedLit(mergesFromStore(SignatureStore.ensureBpeMerges(s, d))))
    },

    // ----- round-trip invariant: decode(encode(w)) = w -----------------
    // The standard tokenizer identity — for the '</w>' formulation,
    // concatenating a word's symbols must give back word || '</w>' for
    // EVERY vocab word, counted on both engines (BpeMergeSpec proves it
    // property-style for random inputs; this gates it on the corpus).
    "bpe_roundtrip_identity" -> QueryDef.sql(
      s"""WITH $trainChain
         |SELECT count(*)::BIGINT AS n_words,
         |       CAST(count(*) FILTER (WHERE array_to_string(syms, '') <> word || '</w>')
         |            AS BIGINT) AS n_mismatches
         |FROM seg$K""".stripMargin) { (s, d) =>
      trained(s, d).vocab
        .agg(count(lit(1)).as("n_words"),
          count(when(array_join(col("syms"), "") =!= concat(col("word"), lit("</w>")), 1))
            .as("n_mismatches"))
    },

    // ----- corpus totals + compression --------------------------------
    // Token-budget arithmetic off the segmented vocab alone: counts ride
    // the vocab, so corpus totals cost a vocab-sized aggregate, zero
    // text reprocessing. Compression as an exact truncated ppm integer
    // (HUGEINT / DECIMAL(38,0) — the repo's ratio convention; double
    // division + round can flake cross-engine on representation edges).
    "bpe_corpus_token_count" -> QueryDef.sql(
      s"""WITH $trainChain
         |SELECT sum(cnt)::BIGINT AS total_words,
         |       sum(cnt * len(syms))::BIGINT AS total_tokens,
         |       CAST((CAST(1000000 AS HUGEINT) * sum(cnt * length(word)))
         |            // sum(cnt * len(syms)) AS BIGINT) AS chars_per_token_ppm
         |FROM seg$K""".stripMargin) { (s, d) =>
      trained(s, d).vocab
        .agg(sum(col("cnt")).as("total_words"),
          sum(col("cnt") * size(col("syms"))).as("total_tokens"),
          sum(col("cnt") * length(col("word"))).as("nchars"))
        .select(col("total_words"), col("total_tokens"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * nchars) " +
            "div total_tokens AS BIGINT)").as("chars_per_token_ppm"))
    },
  )
}
