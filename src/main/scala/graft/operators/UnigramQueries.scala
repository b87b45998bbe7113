package graft.operators

import graft.QueryDef
import graft.functions.UnigramNbest.unigram_nbest
import graft.functions.UnigramViterbi.unigram_viterbi
import graft.util.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-language-model tokenizer TRAINING and ENCODING over
  * `documents` — the second standard subword scheme next to BPE (Kudo
  * 2018, "Subword Regularization: Improving Neural Network Translation
  * Models with Multiple Subword Candidates", §3; the SentencePiece
  * unigram trainer). A training-data pipeline that compares tokenizers
  * needs both families, the same way the dedup family carries minhash
  * AND simhash AND semantic faces.
  *
  * Algorithm (hard-EM / Viterbi-EM — the EM variant whose E-step
  * assigns each word its single best segmentation):
  *   1. word-frequency table: one corpus scan → (word, cnt). Everything
  *      after is vocab-sized, the same Heaps'-law collapse that makes
  *      corpus BPE training tractable at 100 TB.
  *   2. seed vocabulary: every substring of length ≤ [[MaxPieceLen]]
  *      with its occurrence-weighted corpus count; all single
  *      characters, plus the top [[SeedMultiMax]] multi-character
  *      pieces by count × length (SentencePiece's seed ranking).
  *   3. EM iterations ([[EmIters]]): score pieces from current counts,
  *      Viterbi-segment every DISTINCT word (E-step — the native
  *      [[graft.functions.UnigramViterbi]] codegen expression, a
  *      projection over the vocab table, NO shuffle), recount piece
  *      usage weighted by word frequency (M-step), prune to all single
  *      characters (count-1 floor — SentencePiece's required character
  *      coverage, so the segmenter stays total) + the top
  *      [[VocabMultiMax]] multi-character pieces.
  *   4. encode: Viterbi under the final model as a stateless projection
  *      pipelined into the corpus scan; the model rides the plan as a
  *      literal (one broadcast per task, hashed once per thread).
  *
  * WHY INTEGER SCORES — the exactness argument. True unigram-LM Viterbi
  * compares summed float log-probabilities; `ln` differs between libm
  * implementations in the last ulp, and one flipped argmax diverges the
  * engines by whole pieces, which EM then amplifies. So the objective
  * quantizes log₂-likelihood to whole bits: score(p) = bitlen(count(p))
  * − bitlen(total), where bitlen(x) = length(bin(x)) — exact integer
  * arithmetic both engines define identically. Ties (common under 1-bit
  * scores) resolve by fewest pieces, then longest-last-piece, a total
  * order that composes under DP (see [[graft.functions.UnigramViterbi]]).
  * Unknown single characters (possible only OUTSIDE the training
  * corpus, e.g. the OOV face's '~') cost the count-1 fallback score —
  * the segmenter is total on any string.
  *
  * The DuckDB oracle mirrors the ENTIRE chain relationally: the seed
  * table via two chained `unnest(generate_series(...))` expansions, each
  * E-step's Viterbi as an UNROLLED dynamic program — one CTE per word
  * position, each block ranking the ≤[[MaxPieceLen]] split candidates by
  * (score DESC, pieces ASC, start ASC) — and the M-step/prune as window
  * ranks. The unroll is static SQL, so gated words are capped at
  * [[WordCap]] characters (enforced LOUDLY on the Spark side; the corpus
  * tables top out at 8, the Zipfian scale corpus at 4 — the native
  * expression itself has no cap).
  *
  * Training state is memoized per (session, sf-dir) like
  * [[BpeQueries]]; `unigram_train_vocab` is the always-retrains live
  * face.
  */
object UnigramQueries {

  /** Longest candidate piece (SentencePiece default is 16; 6 spans the
    * corpus vocabulary's real merge depth while keeping the oracle's
    * candidate table at |word|×6 rows per word). */
  private val MaxPieceLen = 6

  /** Seed vocabulary: top multi-character substrings by count×length. */
  private val SeedMultiMax = 96

  /** Pruned vocabulary: multi-character pieces kept per M-step. */
  private val VocabMultiMax = 48

  /** Hard-EM iterations. Two suffice for the fixpoint on Zipf-shaped
    * corpora — counts saturate with the vocabulary, not the corpus
    * (UnigramSpec's EM-depth test shows iteration 3 reproduces the
    * iteration-2 vocabulary bit-for-bit on both fixture corpora). */
  private val EmIters = 2

  /** Longest gated word — the oracle unrolls this many DP blocks, so the
    * Spark side refuses longer words loudly (never silently truncates).
    * 24 covers realistic natural-language words
    * ("internationalization" is 20); the cap is ORACLE-ONLY — the native
    * [[graft.functions.UnigramViterbi]] expression is uncapped, and the
    * unroll is linear in blocks (each ≤ [[MaxPieceLen]] branches), so
    * raising it further is cheap. The long-word faces train on a derived
    * corpus (each word tripled, up to 24 chars) so blocks 9–24 are
    * actually exercised, not just generated. */
  private val WordCap = 24

  /** Longest holdout word: word‖'~'‖word under the BASE corpus (8-char
    * words ⇒ 17); the oov unroll depth, kept ≤ 2·[[WordCap]]+1. */
  private val OovCap = 2 * WordCap + 1

  private def bitlen(x: Long): Int = {
    require(x > 0, s"bitlen of non-positive $x")
    64 - java.lang.Long.numberOfLeadingZeros(x)
  }

  /** UTF-8 binary order — the collation BOTH engines sort strings by
    * (Spark UTF8String.compareTo; DuckDB default binary). Driver-side
    * sorts must match or prune tie-breaks diverge. */
  private val binaryOrder: Ordering[String] =
    (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Trained model: (piece, count) with the count-derived scores. */
  final case class Model(pieces: Seq[(String, Long)]) {
    val total: Long = pieces.iterator.map(_._2).sum
    val scores: Seq[(String, Int)] =
      pieces.map { case (p, c) => p -> (bitlen(c) - bitlen(total)) }
    val fallback: Int = 1 - bitlen(total)
  }

  private val memo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, Model]]())

  private def perSession(s: SparkSession) = memo.synchronized {
    var m = memo.get(s)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, Model]
      memo.put(s, m)
    }
    m
  }

  private def trained(s: SparkSession, dir: String,
      longWords: Boolean = false): Model =
    perSession(s).getOrElseUpdate(memoKey(dir, longWords),
      train(s, dir, longWords))

  private def memoKey(dir: String, longWords: Boolean): String =
    if (longWords) s"$dir#long3" else dir

  /** Fresh training (the live face's path — always timed, never a memo
    * hit; replaces the memo so consumer faces stay coherent). */
  private def retrain(s: SparkSession, dir: String): Model = {
    val m = train(s, dir)
    perSession(s).put(dir, m)
    m
  }

  /** Distinct corpus words with frequency and code-point length.
    * `longWords` triples each word (`w‖w‖w` — injective: equal lengths
    * force equality, so frequencies carry over 1:1), deriving a corpus
    * whose words reach 3×8 = 24 characters — the fixture that exercises
    * the oracle's deep DP blocks with real data. */
  private def wordFreq(s: SparkSession, dir: String,
      longWords: Boolean = false): DataFrame = {
    val base = TextQueries.spread(
      documents(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(graft.functions.WsTokens.ws_tokens(col("text"))).as("word"))
        .filter(col("word") =!= ""))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val src = if (longWords)
      base.select(concat(col("word"), col("word"), col("word")).as("word"), col("cnt"))
    else base
    src
      .withColumn("chs", expr("regexp_extract_all(word, '.', 0)"))
      .withColumn("wl", size(col("chs")))
  }

  /** Model → sorted literal columns for the Viterbi expression. */
  private def modelLits(m: Model): (Column, Column, Column) = {
    val sorted = m.scores.sortBy(_._1)(binaryOrder)
    (typedLit(sorted.map(_._1)), typedLit(sorted.map(_._2)), lit(m.fallback))
  }

  /** Trained model as a DataFrame — the artifact
    * [[SignatureStore.ensureUnigramModel]] persists (piece, piece_count,
    * score; the score column is denormalized for consumers — [[Model]]
    * re-derives it from counts, identically, when reading back). */
  private[operators] def trainedModelDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = trained(s, dir)
    m.pieces.zip(m.scores)
      .map { case ((p, c), (_, sc)) => (p, c, sc) }
      .toDF("piece", "piece_count", "score")
  }

  /** Model from a STORED table (the [[trainedModelDf]] schema read
    * back) — bounded collect: vocab-sized (≤ alphabet + VocabMultiMax). */
  private[operators] def modelFromStore(stored: DataFrame): Model = {
    val rows = stored.select("piece", "piece_count").collect()
    require(rows.nonEmpty, "unigram model store is empty")
    Model(rows.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  /** `emIters` is overridable only by the EM-depth robustness spec —
    * every gated face trains at [[EmIters]]. */
  private[operators] def train(s: SparkSession, dir: String,
      longWords: Boolean = false, emIters: Int = EmIters): Model = {
    val wf = wordFreq(s, dir, longWords).persist()
    try {
      val mx = wf.agg(max(col("wl"))).head()
      if (mx.isNullAt(0))
        throw new IllegalArgumentException(
          s"unigram training: the corpus at $dir has no words")
      val maxWl = mx.getInt(0)
      if (maxWl > WordCap)
        throw new IllegalArgumentException(
          s"unigram training: a corpus word has $maxWl characters, above the " +
            s"gated cap $WordCap (the DuckDB oracle unrolls the Viterbi DP to " +
            s"$WordCap static blocks; raise WordCap in UnigramQueries to match)")
      // seed: every (position, length ≤ MaxPieceLen) substring window,
      // occurrence-weighted — vocab-sized × |word|·L, never corpus-sized
      val seed = wf
        .withColumn("i", explode(expr("sequence(1, wl)")))
        .withColumn("l", explode(expr(s"sequence(1, least($MaxPieceLen, wl - i + 1))")))
        .withColumn("piece", expr("array_join(slice(chs, i, l), '')"))
        .groupBy("piece").agg(max("l").as("plen"), sum("cnt").as("c"))
        .persist()
      // bounded collects: the alphabet, and the top-SeedMultiMax pieces
      // (TakeOrderedAndProject — a distributed top-K, no global sort)
      val alphabet = seed.filter(col("plen") === 1)
        .select("piece", "c").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val seedMulti = seed.filter(col("plen") > 1)
        .orderBy((col("c") * col("plen")).desc, col("piece"))
        .limit(SeedMultiMax)
        .select("piece", "c").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      seed.unpersist()
      val alphaSet = alphabet.map(_._1).toSet
      var vocab: Seq[(String, Long)] = alphabet ++ seedMulti

      var t = 1
      while (t <= emIters) {
        val m = Model(vocab)
        val (piecesLit, scoresLit, fbLit) = modelLits(m)
        // E-step: Viterbi every distinct word; usage weighted by word
        // frequency. Bounded collect: ≤ |vocab| rows.
        val usage = wf
          .withColumn("segs", unigram_viterbi(col("word"), piecesLit, scoresLit, fbLit))
          .select(col("cnt"), explode(col("segs")).as("piece"))
          .groupBy("piece").agg(sum("cnt").as("u"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val vocabSet = vocab.map(_._1).toSet
        val stray = usage.keySet.diff(vocabSet)
        // training corpus chars are all in-vocab (the count-1 floor), so
        // the fallback path can never have fired here
        require(stray.isEmpty, s"unigram E-step used out-of-vocab pieces: $stray")
        // M-step + prune: char floor keeps the segmenter total; multi
        // pieces keep their Viterbi usage, top VocabMultiMax survive
        val chars = alphabet.map { case (p, _) => p -> math.max(usage.getOrElse(p, 0L), 1L) }
        val multi = vocab
          .collect { case (p, _) if !alphaSet.contains(p) && usage.getOrElse(p, 0L) > 0 =>
            p -> usage(p) }
          .sortBy { case (p, u) => (-u, p) }(Ordering.Tuple2(Ordering.Long, binaryOrder))
          .take(VocabMultiMax)
        vocab = chars ++ multi
        t += 1
      }
      Model(vocab)
    } finally wf.unpersist()
  }

  // ----- DuckDB mirror: seed → EM chain → final model -------------------

  /** Substring windows of `src` (word, cnt): one unnest per CTE — two
    * chained single-unnest blocks form the (position × length) cross
    * product, then the slice-join extracts the piece. */
  private def subsBlocks(pfx: String, src: String): String =
    s"""${pfx}ch AS MATERIALIZED (SELECT word, cnt, regexp_extract_all(word, '.') AS chs,
       |        len(regexp_extract_all(word, '.'))::INT AS wl FROM $src),
       |${pfx}p0 AS MATERIALIZED (SELECT word, cnt, chs, wl, unnest(generate_series(1, wl))::INT AS i FROM ${pfx}ch),
       |${pfx}p1 AS MATERIALIZED (SELECT word, cnt, chs, wl, i, unnest(generate_series(1, $MaxPieceLen))::INT AS l FROM ${pfx}p0),
       |${pfx}subs AS MATERIALIZED (
       |  SELECT word, cnt, wl, i, l, array_to_string(list_slice(chs, i, i + l - 1), '') AS piece
       |  FROM ${pfx}p1 WHERE i + l - 1 <= wl)""".stripMargin

  /** Per-word-position candidates under score table `sv` (+ the
    * unknown-single-char fallback from `fb`). */
  private def candBlock(name: String, sv: String, fb: String, subsT: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT b.word, b.cnt, b.wl, b.i, b.l, b.piece, s.s
       |  FROM $subsT b JOIN $sv s ON s.piece = b.piece AND s.plen = b.l
       |  UNION ALL
       |  SELECT b.word, b.cnt, b.wl, b.i, 1 AS l, b.piece, (SELECT fs FROM $fb) AS s
       |  FROM $subsT b
       |  WHERE b.l = 1 AND NOT EXISTS (SELECT 1 FROM $sv s WHERE s.piece = b.piece))""".stripMargin

  /** The Viterbi DP, unrolled: block j holds the unique best path to
    * position j of every word (candidates ranked score DESC, pieces ASC,
    * start ASC — the same total order the native expression applies). */
  private def dpBlocks(pfx: String, cand: String, wordsT: String, maxPos: Int): String = {
    val zero = s"${pfx}0 AS MATERIALIZED (SELECT word, cnt, wl, 0::INT AS s, 0::INT AS k, " +
      s"CAST([] AS VARCHAR[]) AS segs FROM $wordsT)"
    val blocks = (1 to maxPos).map { j =>
      val branches = (1 to math.min(MaxPieceLen, j)).map { l =>
        s"""      SELECT d.word, d.cnt, d.wl, d.s + c.s AS s, d.k + 1 AS k,
           |             list_append(d.segs, c.piece) AS segs, ${j - l} AS st
           |      FROM $pfx${j - l} d JOIN $cand c
           |        ON c.word = d.word AND c.i = ${j - l + 1} AND c.l = $l""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""$pfx$j AS MATERIALIZED (
         |  SELECT word, cnt, wl, s, k, segs FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word ORDER BY s DESC, k, st) AS rn FROM (
         |$branches
         |    )) WHERE rn = 1)""".stripMargin
    }
    (zero +: blocks).mkString(",\n")
  }

  /** Final segmentation per word: the DP row at its own length. */
  private def bestSel(pfx: String, best: String, maxPos: Int): String =
    s"""$best AS MATERIALIZED (
       |  SELECT word, cnt, wl, segs FROM (
       |${(1 to maxPos).map(j => s"    SELECT word, cnt, wl, segs FROM $pfx$j WHERE wl = $j")
           .mkString("\n    UNION ALL\n")}
       |  ))""".stripMargin

  /** One EM iteration: scores from v{t} → E-step DP → usage → M-step
    * char floor + top-K prune → v{t+1}. */
  private def emIter(t: Int): String =
    s"""tt$t AS MATERIALIZED (SELECT sum(c)::BIGINT AS tot FROM v$t),
       |sv$t AS MATERIALIZED (SELECT piece, plen, (length(bin(c)) - (SELECT length(bin(tot)) FROM tt$t))::INT AS s FROM v$t),
       |fb$t AS MATERIALIZED (SELECT (1 - length(bin(tot)))::INT AS fs FROM tt$t),
       |${candBlock(s"cd$t", s"sv$t", s"fb$t", "wsubs")},
       |${dpBlocks(s"dp${t}_", s"cd$t", "wch", WordCap)},
       |${bestSel(s"dp${t}_", s"best$t", WordCap)},
       |use$t AS MATERIALIZED (SELECT piece, sum(cnt)::BIGINT AS u
       |          FROM (SELECT cnt, unnest(segs) AS piece FROM best$t) GROUP BY piece),
       |mc$t AS MATERIALIZED (SELECT a.piece, 1::INT AS plen, greatest(coalesce(u.u, 0), 1)::BIGINT AS c
       |         FROM alpha a LEFT JOIN use$t u ON u.piece = a.piece),
       |mm$t AS MATERIALIZED (
       |  SELECT piece, plen, c FROM (
       |    SELECT s.piece, s.plen, u.u AS c, row_number() OVER (ORDER BY u.u DESC, s.piece) AS rn
       |    FROM use$t u JOIN sv$t s ON s.piece = u.piece AND s.plen > 1) WHERE rn <= $VocabMultiMax),
       |v${t + 1} AS MATERIALIZED (SELECT piece, plen, c FROM mc$t UNION ALL SELECT piece, plen, c FROM mm$t)"""
      .stripMargin

  /** Seed + EM chain + final score table (svf/fbf over v{EmIters+1}).
    * Prelude CTEs are u-prefixed so the chain composes with
    * [[BpeQueries.trainChain]] inside one WITH (`tokenizer_compare`).
    * `longWords = true` swaps in the tripled-word corpus (the long-word
    * fixture — frequencies carry over because tripling is injective). */
  private def modelChain(longWords: Boolean = false): String = (Seq(
    s"""ut AS MATERIALIZED (SELECT trim(lower(text)) AS t FROM documents WHERE text IS NOT NULL),
      |uwrd AS MATERIALIZED (SELECT unnest(string_split_regex(t, '\\s+')) AS word FROM ut),
      |bwf AS MATERIALIZED (SELECT word, count(*)::BIGINT AS cnt FROM uwrd WHERE word <> '' GROUP BY word),
      |wf AS MATERIALIZED (SELECT ${if (longWords) "word || word || word AS word" else "word"}, cnt FROM bwf)""".stripMargin,
    subsBlocks("w", "wf"),
    s"""alpha AS MATERIALIZED (SELECT DISTINCT piece FROM wsubs WHERE l = 1),
       |sc0 AS MATERIALIZED (SELECT piece, max(l)::INT AS plen, sum(cnt)::BIGINT AS c FROM wsubs GROUP BY piece),
       |seedm AS MATERIALIZED (
       |  SELECT piece, plen, c FROM (
       |    SELECT piece, plen, c, row_number() OVER (ORDER BY c * plen DESC, piece) AS rn
       |    FROM sc0 WHERE plen > 1) WHERE rn <= $SeedMultiMax),
       |v1 AS MATERIALIZED (SELECT s.piece, s.plen, s.c FROM sc0 s JOIN alpha a ON a.piece = s.piece
       |       UNION ALL SELECT piece, plen, c FROM seedm)""".stripMargin) ++
    (1 to EmIters).map(emIter) :+
    s"""ttf AS MATERIALIZED (SELECT sum(c)::BIGINT AS tot FROM v${EmIters + 1}),
       |svf AS MATERIALIZED (SELECT piece, plen, c,
       |          (length(bin(c)) - (SELECT length(bin(tot)) FROM ttf))::INT AS s
       |        FROM v${EmIters + 1}),
       |fbf AS MATERIALIZED (SELECT (1 - length(bin(tot)))::INT AS fs FROM ttf)""".stripMargin
  ).mkString(",\n")

  /** Corpus-word segmentation under the final model. */
  private def bestFChain: String = Seq(
    candBlock("cdf", "svf", "fbf", "wsubs"),
    dpBlocks("dpf_", "cdf", "wch", WordCap),
    bestSel("dpf_", "bestf", WordCap)).mkString(",\n")

  /** K-best DP blocks — the beam at each position keeps `rn <= K` paths
    * under the STRICT total order (s DESC, k ASC, pk ASC); `pk` is the
    * reversed-piece-length key, `chr(123 − l)` PREPENDED per appended
    * piece so the last piece compares first and longer pieces sort
    * smaller (the same key [[graft.functions.UnigramNbest]] builds —
    * rank 1 is exactly the Viterbi segmentation). The order is monotone
    * under suffix-append, so the beam is exact, not heuristic. */
  private def nbestBlocks(pfx: String, cand: String, wordsT: String,
      maxPos: Int): String = {
    val k = graft.functions.UnigramNbest.K
    val zero = s"${pfx}0 AS MATERIALIZED (SELECT word, cnt, wl, 0::INT AS s, " +
      s"0::INT AS k, '' AS pk, CAST([] AS VARCHAR[]) AS segs FROM $wordsT)"
    val blocks = (1 to maxPos).map { j =>
      val branches = (1 to math.min(MaxPieceLen, j)).map { l =>
        s"""      SELECT d.word, d.cnt, d.wl, d.s + c.s AS s, d.k + 1 AS k,
           |             chr(${123 - l}) || d.pk AS pk, list_append(d.segs, c.piece) AS segs
           |      FROM $pfx${j - l} d JOIN $cand c
           |        ON c.word = d.word AND c.i = ${j - l + 1} AND c.l = $l""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""$pfx$j AS MATERIALIZED (
         |  SELECT word, cnt, wl, s, k, pk, segs FROM (
         |    SELECT *, row_number() OVER (PARTITION BY word ORDER BY s DESC, k, pk) AS rn FROM (
         |$branches
         |    )) WHERE rn <= $k)""".stripMargin
    }
    (zero +: blocks).mkString(",\n")
  }

  /** Holdout (word‖'~'‖word) segmentation under the final model — '~'
    * is outside the training alphabet, so this walks the fallback path
    * on both engines. */
  private def oovChain: String = Seq(
    "hw AS MATERIALIZED (SELECT word || '~' || word AS word, 1::BIGINT AS cnt FROM wf)",
    subsBlocks("h", "hw"),
    candBlock("cdh", "svf", "fbf", "hsubs"),
    dpBlocks("dph_", "cdh", "hch", OovCap),
    bestSel("dph_", "besth", OovCap)).mkString(",\n")

  /** Shared oracle for the live and stored encode faces (`longWords`
    * triples the document words the same way the training side does). */
  private def encodeDocsSql(longWords: Boolean = false): String =
    s"""WITH ${modelChain(longWords)},
       |$bestFChain,
       |dw AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       |dwb AS (SELECT doc_id, word FROM dw WHERE word <> ''),
       |dwf AS (SELECT doc_id, ${if (longWords) "word || word || word AS word" else "word"} FROM dwb)
       |SELECT d.doc_id, count(*)::BIGINT AS n_words, sum(len(b.segs))::BIGINT AS unigram_tokens
       |FROM dwf d JOIN bestf b USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  private[operators] def encodeDocs(s: SparkSession, d: String, m: Model,
      longWords: Boolean = false): DataFrame = {
    val (p, sc, fb) = modelLits(m)
    val words = TextQueries.spread(documents(s, d).filter(col("text").isNotNull))
      .select(col("doc_id"),
        explode(graft.functions.WsTokens.ws_tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val src = if (longWords)
      words.select(col("doc_id"),
        concat(col("word"), col("word"), col("word")).as("word"))
    else words
    src
      // the gated faces are oracle-compared, and the oracle inner-joins
      // words against a DP unrolled to WordCap blocks — a longer word
      // would be silently DROPPED by the oracle while this side still
      // counts it. Refuse loudly here too, so the refusal doesn't depend
      // on training having run first in this session (the stored face
      // encodes from the sealed artifact without retraining).
      .withColumn("segs",
        when(length(col("word")) > WordCap,
          raise_error(concat(lit("unigram encode: word '"), col("word"),
            lit(s"' exceeds the oracle-gated cap $WordCap characters " +
              "(the DuckDB oracle unrolls the Viterbi DP to WordCap " +
              "blocks; the native unigram_viterbi expression is uncapped)"))))
          .otherwise(unigram_viterbi(col("word"), p, sc, fb)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("segs")).cast("long")).as("unigram_tokens"))
      .orderBy("doc_id")
  }

  val defs: Map[String, QueryDef] = Map(

    // ----- unigram training: the learned model -------------------------
    // Seed counts → EmIters hard-EM rounds → pruned vocab with 1-bit
    // quantized log₂ scores. Oracle: the same chain as generated CTEs,
    // each E-step an unrolled relational Viterbi.
    "unigram_train_vocab" -> QueryDef.sql(
      s"""WITH ${modelChain()}
         |SELECT piece, c AS piece_count, s AS score FROM svf ORDER BY piece""".stripMargin) {
      (s, d) =>
        val m = retrain(s, d)
        import s.implicits._
        m.pieces.zip(m.scores)
          .map { case ((p, c), (_, sc)) => (p, c, sc) }
          .toDF("piece", "piece_count", "score")
          .orderBy("piece")
    },

    // ----- the segmented vocabulary under the final model ---------------
    "unigram_segment_vocab" -> QueryDef.sql(
      s"""WITH ${modelChain()},
         |$bestFChain
         |SELECT word, array_to_string(segs, ' ') AS seg, len(segs)::BIGINT AS n_pieces
         |FROM bestf ORDER BY word""".stripMargin) { (s, d) =>
      val (p, sc, fb) = modelLits(trained(s, d))
      wordFreq(s, d)
        .withColumn("segs", unigram_viterbi(col("word"), p, sc, fb))
        .select(col("word"), array_join(col("segs"), " ").as("seg"),
          size(col("segs")).cast("long").as("n_pieces"))
        .orderBy("word")
    },

    // ----- out-of-vocabulary encode (the fallback path) ------------------
    "unigram_encode_oov" -> QueryDef.sql(
      s"""WITH ${modelChain()},
         |$oovChain
         |SELECT word, array_to_string(segs, ' ') AS seg, len(segs)::BIGINT AS n_pieces
         |FROM besth ORDER BY word""".stripMargin) { (s, d) =>
      val (p, sc, fb) = modelLits(trained(s, d))
      wordFreq(s, d)
        .select(concat_ws("~", col("word"), col("word")).as("word"))
        .withColumn("segs", unigram_viterbi(col("word"), p, sc, fb))
        .select(col("word"), array_join(col("segs"), " ").as("seg"),
          size(col("segs")).cast("long").as("n_pieces"))
        .orderBy("word")
    },

    // ----- corpus-scale encode: per-document token counts ----------------
    // Spark: the native expression per word INSTANCE inside the corpus
    // scan (the realistic 100 TB plan — stateless projection). Oracle:
    // the vocab-join route through bestf. Two different plans agreeing
    // is the gate, as with bpe_encode_docs.
    "unigram_encode_docs" -> QueryDef.sql(encodeDocsSql()) { (s, d) =>
      encodeDocs(s, d, trained(s, d))
    },

    // ----- stored/serve encode: the persisted model artifact -------------
    // Same plan, model from the SEALED [[SignatureStore.ensureUnigramModel]]
    // parquet artifact — encode across sessions without retraining.
    // Deterministic training ⇒ one shared oracle; the gate holding on
    // both faces IS the stored≡live assertion.
    "unigram_encode_docs_stored" -> QueryDef.sql(encodeDocsSql()) { (s, d) =>
      encodeDocs(s, d, modelFromStore(SignatureStore.ensureUnigramModel(s, d)))
    },

    // ----- n-best segmentations (subword regularization, Kudo 2018 §4) ---
    // The deterministic top-K list a sampler draws from; rank 1 IS the
    // Viterbi segmentation (same total order restricted to the optimum).
    // Spark: the native beam expression per distinct word. Oracle: the
    // same beam as unrolled DP blocks keeping rn <= K rows per position.
    "unigram_nbest_segments" -> QueryDef.sql(
      s"""WITH ${modelChain()},
         |${candBlock("cdf", "svf", "fbf", "wsubs")},
         |${nbestBlocks("nb_", "cdf", "wch", WordCap)},
         |paths AS (
         |  ${(1 to WordCap).map(j => s"SELECT word, s, k, pk, segs FROM nb_$j WHERE wl = $j")
             .mkString("\n  UNION ALL\n  ")}
         |)
         |SELECT word,
         |       row_number() OVER (PARTITION BY word ORDER BY s DESC, k, pk)::BIGINT AS rnk,
         |       array_to_string(segs, ' ') AS seg, len(segs)::BIGINT AS n_pieces
         |FROM paths
         |ORDER BY word, rnk""".stripMargin) { (s, d) =>
      val (p, sc, fb) = modelLits(trained(s, d))
      wordFreq(s, d)
        .withColumn("cands", unigram_nbest(col("word"), p, sc, fb))
        .select(col("word"), posexplode(col("cands")))
        .select(col("word"), (col("pos") + 1).cast("long").as("rnk"),
          col("col").as("seg"),
          size(split(col("col"), " ")).cast("long").as("n_pieces"))
        .orderBy("word", "rnk")
    },

    // ----- long-word corpus: the deep-DP fixture --------------------------
    // Each corpus word tripled (w‖w‖w, injective ⇒ frequencies carry
    // over) gives words up to 24 characters — the realistic-word-length
    // regime ("internationalization" is 20). These two faces are the
    // evidence that the oracle's DP blocks 9–24 compute the same
    // segmentations as the native expression ON REAL DATA, i.e. that
    // raising WordCap was a semantic extension, not just generated SQL.
    "unigram_longword_vocab" -> QueryDef.sql(
      s"""WITH ${modelChain(longWords = true)}
         |SELECT piece, c AS piece_count, s AS score FROM svf ORDER BY piece""".stripMargin) {
      (s, d) =>
        val m = trained(s, d, longWords = true)
        import s.implicits._
        m.pieces.zip(m.scores)
          .map { case ((p, c), (_, sc)) => (p, c, sc) }
          .toDF("piece", "piece_count", "score")
          .orderBy("piece")
    },

    "unigram_longword_encode_docs" -> QueryDef.sql(
      encodeDocsSql(longWords = true)) { (s, d) =>
      encodeDocs(s, d, trained(s, d, longWords = true), longWords = true)
    },

    // ----- tokenizer comparison: BPE vs unigram on the shared corpus -----
    // The query a pipeline operator actually runs to PICK a tokenizer:
    // vocab sizes + overlap, per-scheme token totals and chars/token
    // (exact truncated-ppm convention), and how many words the two
    // schemes segment differently (BPE's '</w>' marker normalized away
    // before comparing). Spark reuses BOTH sealed artifact stores — no
    // retraining; the oracle re-derives both full training chains (the
    // two chains compose in one WITH because the unigram prelude is
    // u-prefixed). Stored ≡ live is already pinned by the *_stored faces.
    "tokenizer_compare" -> QueryDef.sql(
      s"""WITH ${BpeQueries.trainChain},
         |${modelChain()},
         |$bestFChain,
         |mrg AS (${(1 to BpeQueries.K)
             .map(k => s"SELECT a, b FROM w$k").mkString(" UNION ALL ")}),
         |bpv AS (SELECT DISTINCT replace(a || b, '</w>', '') AS piece FROM mrg
         |        WHERE replace(a || b, '</w>', '') <> ''),
         |unv AS (SELECT piece FROM svf WHERE plen > 1),
         |bt AS (
         |  SELECT f.word, f.cnt, f.wl, len(g.syms)::BIGINT AS bpe_n,
         |         trim(replace(array_to_string(g.syms, ' '), '</w>', '')) AS bpe_seg
         |  FROM wch f JOIN seg${BpeQueries.K} g USING (word)),
         |un AS (
         |  SELECT word, len(segs)::BIGINT AS uni_n,
         |         array_to_string(segs, ' ') AS uni_seg
         |  FROM bestf),
         |j AS (SELECT b.*, u.uni_n, u.uni_seg FROM bt b JOIN un u USING (word))
         |SELECT
         |  count(*)::BIGINT AS n_words,
         |  (SELECT count(*) FROM bpv)::BIGINT AS bpe_vocab_pieces,
         |  (SELECT count(*) FROM unv)::BIGINT AS unigram_vocab_pieces,
         |  (SELECT count(*) FROM bpv JOIN unv USING (piece))::BIGINT AS shared_pieces,
         |  sum(cnt * bpe_n)::BIGINT AS bpe_tokens,
         |  sum(cnt * uni_n)::BIGINT AS unigram_tokens,
         |  CAST((CAST(1000000 AS HUGEINT) * sum(cnt * wl)) // sum(cnt * bpe_n) AS BIGINT)
         |    AS bpe_cpt_ppm,
         |  CAST((CAST(1000000 AS HUGEINT) * sum(cnt * wl)) // sum(cnt * uni_n) AS BIGINT)
         |    AS unigram_cpt_ppm,
         |  CAST(count(*) FILTER (WHERE bpe_seg <> uni_seg) AS BIGINT) AS n_disagree_words
         |FROM j""".stripMargin) { (s, d) =>
      val mergesDf = SignatureStore.ensureBpeMerges(s, d)
      val merges = BpeQueries.mergesFromStore(mergesDf)
      val (p, sc, fb) = modelLits(modelFromStore(SignatureStore.ensureUnigramModel(s, d)))
      val marker = lit("</w>")
      val bpePieces = mergesDf
        .select(replace(concat(col("left_sym"), col("right_sym")), marker, lit("")).as("piece"))
        .filter(col("piece") =!= "").distinct()
      val uniPieces = SignatureStore.ensureUnigramModel(s, d)
        .select("piece").filter(length(col("piece")) > 1)
      val body = wordFreq(s, d)
        .withColumn("syms", graft.functions.BpeMerge.bpe_apply_merges(
          concat(expr("regexp_extract_all(word, '.', 0)"), array(marker)),
          typedLit(merges)))
        .withColumn("segs", unigram_viterbi(col("word"), p, sc, fb))
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("cnt") * size(col("syms"))).as("bpe_tokens"),
          sum(col("cnt") * size(col("segs"))).as("unigram_tokens"),
          sum(col("cnt") * col("wl")).as("nchars"),
          count(when(trim(replace(array_join(col("syms"), " "), marker, lit(""))) =!=
            array_join(col("segs"), " "), 1)).as("n_disagree_words"))
      body
        .crossJoin(bpePieces.agg(count(lit(1)).as("bpe_vocab_pieces")))
        .crossJoin(uniPieces.agg(count(lit(1)).as("unigram_vocab_pieces")))
        .crossJoin(bpePieces.join(uniPieces, "piece")
          .agg(count(lit(1)).as("shared_pieces")))
        .select(col("n_words"), col("bpe_vocab_pieces"),
          col("unigram_vocab_pieces"), col("shared_pieces"),
          col("bpe_tokens"), col("unigram_tokens"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * nchars) div bpe_tokens AS BIGINT)")
            .as("bpe_cpt_ppm"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * nchars) div unigram_tokens AS BIGINT)")
            .as("unigram_cpt_ppm"),
          col("n_disagree_words"))
    },

    // ----- corpus totals + compression (exact ppm convention) ------------
    "unigram_corpus_token_count" -> QueryDef.sql(
      s"""WITH ${modelChain()},
         |$bestFChain
         |SELECT sum(cnt)::BIGINT AS total_words,
         |       sum(cnt * len(segs))::BIGINT AS total_tokens,
         |       CAST((CAST(1000000 AS HUGEINT) * sum(cnt * wl))
         |            // sum(cnt * len(segs)) AS BIGINT) AS chars_per_token_ppm
         |FROM bestf""".stripMargin) { (s, d) =>
      val (p, sc, fb) = modelLits(trained(s, d))
      wordFreq(s, d)
        .withColumn("segs", unigram_viterbi(col("word"), p, sc, fb))
        .agg(sum(col("cnt")).as("total_words"),
          sum(col("cnt") * size(col("segs"))).as("total_tokens"),
          sum(col("cnt") * col("wl")).as("nchars"))
        .select(col("total_words"), col("total_tokens"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * nchars) " +
            "div total_tokens AS BIGINT)").as("chars_per_token_ppm"))
    },

    // ----- round-trip invariant: decode(encode(w)) = w --------------------
    // The standard tokenizer identity — pieces concatenate back to the
    // word, for every corpus word, counted on both engines.
    "unigram_roundtrip_identity" -> QueryDef.sql(
      s"""WITH ${modelChain()},
         |$bestFChain
         |SELECT count(*)::BIGINT AS n_words,
         |       CAST(count(*) FILTER (WHERE array_to_string(segs, '') <> word) AS BIGINT)
         |         AS n_mismatches
         |FROM bestf""".stripMargin) { (s, d) =>
      val (p, sc, fb) = modelLits(trained(s, d))
      wordFreq(s, d)
        .withColumn("segs", unigram_viterbi(col("word"), p, sc, fb))
        .agg(count(lit(1)).as("n_words"),
          count(when(array_join(col("segs"), "") =!= col("word"), 1)).as("n_mismatches"))
    },
  )
}
