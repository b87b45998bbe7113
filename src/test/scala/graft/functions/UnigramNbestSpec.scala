package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** `unigram_nbest` against an independent exhaustive reference: enumerate
  * EVERY segmentation of the word, rank by the documented total order
  * (score DESC, pieces ASC, reversed-length-sequence longest-first), and
  * compare the top-K — which also proves the beam DP is exact, since the
  * reference does no beam pruning at all. Plus: rank 1 ≡ unigram_viterbi
  * on the same model (the consistency the face's oracle relies on). */
class UnigramNbestSpec extends SparkFunSuite {

  /** All segmentations of `word` under the model (exponential — test
    * words are short), ranked by the documented order. */
  private def refNbest(word: String, model: Map[String, Int],
      fallback: Int, k: Int): Seq[String] = {
    def splits(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { l =>
        val piece = s.substring(0, l)
        val ok = model.contains(piece) || l == 1
        if (ok) splits(s.substring(l)).map(piece :: _) else Nil
      }
    def score(segs: List[String]): Int =
      segs.map(p => model.getOrElse(p, fallback)).sum
    // reversed length sequence, longest-first == smallest key first;
    // encode exactly like the expression: chr(123 - l), last piece first
    def key(segs: List[String]): String =
      segs.reverse.map(p => (123 - p.length).toChar).mkString
    splits(word)
      .map(_.toList)
      .sortBy(s => (-score(s), s.length, key(s)))
      .take(k)
      .map(_.mkString(" "))
  }

  test("unigram_nbest matches the exhaustive reference on random models") {
    import spark.implicits._
    val rng = new scala.util.Random(137)
    (0 until 20).foreach { trial =>
      val alphabet = "abcd"
      val chars = alphabet.map(c => c.toString -> (-(1 + rng.nextInt(9))))
      val multi = (0 until 8).map { _ =>
        val len = 2 + rng.nextInt(3)
        (0 until len).map(_ => alphabet(rng.nextInt(4))).mkString
      }.distinct.map(p => p -> (-(1 + rng.nextInt(9))))
      val model = (chars ++ multi).toMap
      val fallback = -12
      val sorted = model.toSeq.sortBy(_._1)
      val words = (0 until 30).map { i =>
        (i, (0 until 1 + rng.nextInt(9)).map(_ => alphabet(rng.nextInt(4))).mkString)
      }
      val got = words.toDF("id", "word")
        .withColumn("cands", UnigramNbest.unigram_nbest(col("word"),
          typedLit(sorted.map(_._1)), typedLit(sorted.map(_._2)), lit(fallback)))
        .orderBy("id").select("cands").as[Seq[String]].collect()
      words.zip(got).foreach { case ((i, w), cands) =>
        val want = refNbest(w, model, fallback, UnigramNbest.K)
        assert(cands == want, s"trial=$trial id=$i word=$w: got $cands want $want")
        cands.foreach(seg => assert(seg.split(" ").mkString == w,
          s"round-trip broke: $w -> $seg"))
        assert(cands.distinct == cands, s"duplicate segmentation for $w: $cands")
      }
    }
  }

  test("rank 1 equals unigram_viterbi on random models") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val alphabet = "abc"
    val chars = alphabet.map(c => c.toString -> (-(1 + rng.nextInt(5))))
    val multi = Seq("ab" -> -2, "bc" -> -2, "abc" -> -4, "cab" -> -3)
    val model = (chars ++ multi).toMap
    val sorted = model.toSeq.sortBy(_._1)
    val words = (0 until 60).map { i =>
      (i, (0 until 1 + rng.nextInt(10)).map(_ => alphabet(rng.nextInt(3))).mkString)
    }
    val rows = words.toDF("id", "word")
      .withColumn("v", UnigramViterbi.unigram_viterbi(col("word"),
        typedLit(sorted.map(_._1)), typedLit(sorted.map(_._2)), lit(-9)))
      .withColumn("nb", UnigramNbest.unigram_nbest(col("word"),
        typedLit(sorted.map(_._1)), typedLit(sorted.map(_._2)), lit(-9)))
      .orderBy("id")
      .select(array_join(col("v"), " "), col("nb")).as[(String, Seq[String])]
      .collect()
    rows.foreach { case (viterbi, nb) =>
      assert(nb.head == viterbi, s"rank-1 '$nb' != viterbi '$viterbi'")
    }
  }

  test("non-literal models are refused loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("ab", Seq("a", "b"))).toDF("word", "pieces")
        .select(UnigramNbest.unigram_nbest(col("word"), col("pieces"),
          typedLit(Seq(-1, -1)), lit(-5)))
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }
}
