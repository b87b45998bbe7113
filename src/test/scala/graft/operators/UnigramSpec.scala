package graft.operators

import graft.SparkFunSuite
import graft.functions.UnigramViterbi
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: the native Viterbi expression against a
  * reference DP, hand-computed training on a tiny corpus, loud guards,
  * and internal consistency of the sf0.001 faces. The cross-engine gates
  * live in the driver's oracle compare (unigram_* in SparkEntry). */
class UnigramSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Reference Viterbi — independent implementation of the documented
    * total order: score DESC, pieces ASC, smallest last-piece start. */
  private def refSegment(word: String, model: Map[String, Int],
      fallback: Int): Seq[String] = {
    val n = word.length // ASCII test inputs: chars = code points
    val maxLen = if (model.isEmpty) 1 else model.keys.map(_.length).max
    case class Best(s: Int, k: Int, segs: List[String])
    val best = new Array[Best](n + 1)
    best(0) = Best(0, 0, Nil)
    for (j <- 1 to n; l <- 1 to math.min(maxLen max 1, j)) {
      val i = j - l
      if (best(i) != null) {
        val piece = word.substring(i, j)
        val sc = model.get(piece).orElse(if (l == 1) Some(fallback) else None)
        sc.foreach { v =>
          val cand = Best(best(i).s + v, best(i).k + 1, piece :: best(i).segs)
          if (best(j) == null || cand.s > best(j).s ||
              (cand.s == best(j).s && cand.k <= best(j).k)) best(j) = cand
        }
      }
    }
    best(n).segs.reverse
  }

  test("unigram_viterbi matches the reference DP on random models and words") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val alphabet = "abcd"
      // random model: all single chars + random multi pieces, scores in [-9,-1]
      val chars = alphabet.map(c => c.toString -> (-(1 + rng.nextInt(9))))
      val multi = (0 until 8).map { _ =>
        val len = 2 + rng.nextInt(3)
        (0 until len).map(_ => alphabet(rng.nextInt(4))).mkString
      }.distinct.map(p => p -> (-(1 + rng.nextInt(9))))
      val model = (chars ++ multi).toMap
      val fallback = -12
      val sorted = model.toSeq.sortBy(_._1)
      val words = (0 until 50).map { i =>
        (i, (0 until 1 + rng.nextInt(12)).map(_ => alphabet(rng.nextInt(4))).mkString)
      }
      val got = words.toDF("id", "word")
        .withColumn("segs", UnigramViterbi.unigram_viterbi(col("word"),
          typedLit(sorted.map(_._1)), typedLit(sorted.map(_._2)), lit(fallback)))
        .orderBy("id").select("segs").as[Seq[String]].collect()
      words.zip(got).foreach { case ((i, w), segs) =>
        val want = refSegment(w, model, fallback)
        assert(segs == want, s"trial=$trial id=$i word=$w: got $segs want $want")
        assert(segs.mkString == w, s"round-trip broke: $w -> $segs")
      }
    }
  }

  test("tie-breaks: fewest pieces, then longest last piece") {
    import spark.implicits._
    // 'ab' vs 'a'+'b': equal total score -4 → fewest pieces wins
    val m1 = Seq("a" -> -2, "b" -> -2, "ab" -> -4)
    val r1 = Seq((0, "ab")).toDF("id", "word")
      .withColumn("segs", UnigramViterbi.unigram_viterbi(col("word"),
        typedLit(m1.map(_._1)), typedLit(m1.map(_._2)), lit(-9)))
      .select("segs").as[Seq[String]].head()
    assert(r1 == Seq("ab"), r1)
    // 'ab'+'c' vs 'a'+'bc': equal score, equal k → longest LAST piece
    val m2 = Seq("a" -> -3, "ab" -> -3, "bc" -> -3, "c" -> -3, "b" -> -3)
    val r2 = Seq((0, "abc")).toDF("id", "word")
      .withColumn("segs", UnigramViterbi.unigram_viterbi(col("word"),
        typedLit(m2.map(_._1)), typedLit(m2.map(_._2)), lit(-9)))
      .select("segs").as[Seq[String]].head()
    assert(r2 == Seq("a", "bc"), r2)
  }

  test("fallback path: unknown single chars segment, unknown multi never") {
    import spark.implicits._
    val m = Seq("a" -> -1, "ab" -> -2)
    val r = Seq((0, "a~x~ab")).toDF("id", "word")
      .withColumn("segs", UnigramViterbi.unigram_viterbi(col("word"),
        typedLit(m.map(_._1)), typedLit(m.map(_._2)), lit(-7)))
      .select("segs").as[Seq[String]].head()
    assert(r == Seq("a", "~", "x", "~", "ab"), r)
  }

  test("malformed models fail loudly: duplicate or empty pieces, length mismatch") {
    import spark.implicits._
    def run(pieces: Seq[String], scores: Seq[Int]): Unit =
      Seq((0, "ab")).toDF("id", "word")
        .withColumn("segs", UnigramViterbi.unigram_viterbi(col("word"),
          typedLit(pieces), typedLit(scores), lit(-5)))
        .collect()
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception](run(Seq("a", "a"), Seq(-1, -2)))
    assert(msgChain(e1).contains("duplicate piece"), msgChain(e1))
    val e2 = intercept[Exception](run(Seq("a", ""), Seq(-1, -2)))
    assert(msgChain(e2).contains("null/empty piece"), msgChain(e2))
    val e3 = intercept[Exception](run(Seq("a", "b"), Seq(-1)))
    assert(msgChain(e3).contains("pieces vs"), msgChain(e3))
  }

  test("training learns the frequent pieces on a hand-built corpus") {
    import spark.implicits._
    // "abab" x8, "ab" x4, "cd" x2: 'ab' dominates — after training the
    // model must contain 'ab' (and segment 'abab' as [ab, ab]).
    val docs = (Seq.fill(8)("abab") ++ Seq.fill(4)("ab") ++ Seq.fill(2)("cd")).mkString(" ")
    val dir = tmpDir("unitrain")
    Seq((1L, docs)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vocab = UnigramQueries.defs("unigram_train_vocab").build(spark, dir).collect()
    val pieces = vocab.map(_.getString(0)).toSet
    assert(pieces.contains("ab"), pieces)
    assert(Seq("a", "b", "c", "d").forall(pieces.contains), pieces) // char floor
    val segs = UnigramQueries.defs("unigram_segment_vocab").build(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(segs("abab") == "abab" || segs("abab") == "ab ab", segs)
    assert(segs.keySet == Set("abab", "ab", "cd"))
  }

  test("EM depth: iteration 3 reproduces the iteration-2 vocabulary") {
    import spark.implicits._
    // EmIters = 2 rests on a fixpoint argument (counts saturate with the
    // vocabulary). Evidence, not assertion: a third EM round must leave
    // the learned model — pieces AND counts, hence scores — bit-for-bit
    // unchanged on both fixture corpora.
    val docs = (Seq.fill(8)("abab") ++ Seq.fill(4)("ab") ++ Seq.fill(2)("cd")).mkString(" ")
    val tiny = tmpDir("uniem")
    Seq((1L, docs)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tiny/documents.parquet")
    for (dir <- Seq(tiny, sf)) {
      val m2 = UnigramQueries.train(spark, dir, emIters = 2)
      val m3 = UnigramQueries.train(spark, dir, emIters = 3)
      assert(m3.pieces == m2.pieces,
        s"$dir: EM iteration 3 moved the model — " +
          s"only2=${(m2.pieces.toSet -- m3.pieces.toSet).take(5)} " +
          s"only3=${(m3.pieces.toSet -- m2.pieces.toSet).take(5)}")
    }
  }

  test("long-word corpus: tripled words reach the deep DP blocks and stay consistent") {
    import spark.implicits._
    // the tripled corpus must actually exercise realistic word lengths
    val maxLen = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .agg(max(length(concat(col("w"), col("w"), col("w"))))).head().getInt(0)
    assert(maxLen >= 20, s"longest tripled word $maxLen < 20 chars")
    val vocab = UnigramQueries.defs("unigram_longword_vocab").build(spark, sf).collect()
    assert(vocab.exists(_.getString(0).length > 1), "no multi-char pieces learned")
    // longer words can only need at least as many pieces per word
    val base = UnigramQueries.defs("unigram_encode_docs").build(spark, sf)
      .agg(sum("unigram_tokens")).head().getLong(0)
    val long = UnigramQueries.defs("unigram_longword_encode_docs").build(spark, sf)
      .agg(sum("unigram_tokens")).head().getLong(0)
    assert(long > base, s"tripled corpus tokens $long <= base $base")
  }

  test("encode guard: words above the oracle cap refuse loudly without training") {
    import spark.implicits._
    // the advisor's fresh-session scenario: encoding from a sealed model
    // artifact performs no training (so no train-side cap check) — the
    // encode path itself must refuse a word the oracle's unrolled DP
    // would silently drop.
    val dir = tmpDir("unicapenc")
    Seq((1L, "ok " + "y" * 25)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = UnigramQueries.Model(Seq("k" -> 2L, "o" -> 2L, "y" -> 5L))
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception](
      UnigramQueries.encodeDocs(spark, dir, m).collect())
    assert(msgChain(e).contains("exceeds the oracle-gated cap"), msgChain(e))
  }

  test("words above the gated cap are refused loudly") {
    import spark.implicits._
    val dir = tmpDir("unicap")
    Seq((1L, "short " + "x" * 40)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](
      UnigramQueries.defs("unigram_train_vocab").build(spark, dir).collect())
    assert(e.getMessage.contains("above the gated cap"), e.getMessage)
  }

  test("sf0.001 faces are internally consistent") {
    val segs = UnigramQueries.defs("unigram_segment_vocab").build(spark, sf).collect()
    assert(segs.nonEmpty)
    segs.foreach { r => // round-trip per word
      assert(r.getString(1).split(" ").mkString == r.getString(0),
        s"${r.getString(0)} -> ${r.getString(1)}")
    }
    val rt = UnigramQueries.defs("unigram_roundtrip_identity").build(spark, sf).collect()(0)
    assert(rt.getLong(0) == segs.length.toLong && rt.getLong(1) == 0L, rt)
    val totals = UnigramQueries.defs("unigram_corpus_token_count").build(spark, sf).collect()(0)
    assert(totals.getLong(0) > 0 && totals.getLong(1) >= totals.getLong(0))
    val docsSum = UnigramQueries.defs("unigram_encode_docs").build(spark, sf)
      .agg(sum("unigram_tokens")).collect()(0).getLong(0)
    assert(docsSum == totals.getLong(1), s"$docsSum != ${totals.getLong(1)}")
    // OOV face: every holdout word contains '~' and reassembles
    val oov = UnigramQueries.defs("unigram_encode_oov").build(spark, sf).collect()
    oov.foreach { r =>
      assert(r.getString(0).contains("~"))
      assert(r.getString(1).split(" ").mkString == r.getString(0))
    }
    // the trained vocab compresses: multi-char pieces exist and the
    // corpus encodes to strictly fewer tokens than characters
    val vocab = UnigramQueries.defs("unigram_train_vocab").build(spark, sf).collect()
    assert(vocab.exists(_.getString(0).length > 1), vocab.map(_.getString(0)).mkString(","))
    assert(totals.getLong(2) > 1000000L, s"chars_per_token_ppm=${totals.getLong(2)}")
  }
}
