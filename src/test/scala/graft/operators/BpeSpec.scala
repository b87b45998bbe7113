package graft.operators

import graft.SparkFunSuite
import graft.functions.BpeMerge
import org.apache.spark.sql.functions._

/** BPE tokenizer training + encode ([[BpeQueries]]): the native merge
  * expression against a reference Scala implementation, a hand-computed
  * training fixture, the rank-order-encode exactness fact, and the
  * sf0.001 faces' internal consistency. The DuckDB chained-CTE oracle
  * (parity-walk mirror) is the cross-engine gate via Verify. */
class BpeSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // reference greedy-leftmost merge pass
  private def refMerge(s: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  test("bpe_merge_pair matches the reference greedy-leftmost pass, overlaps included") {
    import spark.implicits._
    val rng = new scala.util.Random(0xB9E)
    val alphabet = Seq("a", "b", "ab", "c")
    val rows = (0 until 200).map { i =>
      (i, Seq.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.length))))
    }
    val pairs = Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("c", "c"))
    pairs.foreach { case (a, b) =>
      val got = rows.toDF("id", "syms")
        .withColumn("m", BpeMerge.bpe_merge_pair(col("syms"), lit(a), lit(b)))
        .orderBy("id").select("m").as[Seq[String]].collect()
      rows.zip(got).foreach { case ((i, s), m) =>
        assert(m == refMerge(s, a, b), s"id=$i syms=$s merge=($a,$b)")
      }
    }
    // the canonical overlap case: [a,a,a] with (a,a) keeps the FIRST pair
    val run = Seq((0, Seq("a", "a", "a")), (1, Seq("a", "a", "a", "a")))
      .toDF("id", "syms")
      .withColumn("m", BpeMerge.bpe_merge_pair(col("syms"), lit("a"), lit("a")))
      .orderBy("id").select("m").as[Seq[String]].collect()
    assert(run(0) == Seq("aa", "a") && run(1) == Seq("aa", "aa"))
  }

  test("bpe_apply_merges = sequential bpe_merge_pair in rank order") {
    import spark.implicits._
    val merges = Seq("a b", "ab c", "abc abc")
    val rng = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      (i, Seq.fill(1 + rng.nextInt(10))(Seq("a", "b", "c")(rng.nextInt(3))))
    }
    val got = rows.toDF("id", "syms")
      .withColumn("m", BpeMerge.bpe_apply_merges(col("syms"), typedLit(merges)))
      .orderBy("id").select("m").as[Seq[String]].collect()
    rows.zip(got).foreach { case ((i, s), m) =>
      val want = merges.map(_.split(" ")).foldLeft(s) {
        case (cur, Array(a, b)) => refMerge(cur, a, b)
      }
      assert(m == want, s"id=$i syms=$s")
    }
  }

  test("round-trip property: merges never change the concatenation") {
    // decode(encode(x)) = x for the merge formulation means: any merge
    // pass only groups adjacent symbols, so the concatenation is
    // invariant — for ANY symbol array under ANY well-formed merge list.
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val alpha = Seq("a", "b", "c", "</w>")
    val rows = (0 until 200).map { i =>
      (i, Seq.fill(1 + rng.nextInt(12))(alpha(rng.nextInt(alpha.length))))
    }
    val merges = Seq("a b", "b c", "ab c", "c </w>", "a a")
    val got = rows.toDF("id", "syms")
      .withColumn("m", BpeMerge.bpe_apply_merges(col("syms"), typedLit(merges)))
      .orderBy("id").select("m").as[Seq[String]].collect()
    rows.zip(got).foreach { case ((i, s), m) =>
      assert(m.mkString == s.mkString, s"id=$i: $s -> $m")
    }
  }

  test("malformed merge entries fail loudly, never no-op") {
    // r13 advisor: split(space, 2) let 'a b c' pass the length check
    // with the unmatchable right symbol 'b c' — a silent no-op.
    import spark.implicits._
    def applyM(merges: Seq[String]): Unit =
      Seq((0, Seq("a", "b", "c"))).toDF("id", "syms")
        .withColumn("m", BpeMerge.bpe_apply_merges(col("syms"), typedLit(merges)))
        .collect()
    Seq(Seq("a b c"), Seq("a"), Seq("a "), Seq(" b"), Seq("")).foreach { bad =>
      val e = intercept[Exception](applyM(bad))
      def walk(t: Throwable): Boolean =
        t != null && (t.getMessage != null && t.getMessage.contains("malformed merge")
          || walk(t.getCause))
      assert(walk(e), s"merges=$bad: ${e.getMessage}")
    }
    applyM(Seq("a b")) // well-formed still fine
  }

  test("training learns the hand-computed merges on a tiny corpus") {
    // corpus: "low" x5, "lower" x2, "newest" x6 — the Sennrich running
    // example's shape. Rank 1 is (w,e) 8 ("lower" 2 + "newest" 6);
    // rank 2 (l,o) 7; rank 3 the six-way count-6 tie, broken by left
    // symbol ascending → (e,we); then the "ewest" chain swallows
    // "newest" one suffix merge at a time.
    import spark.implicits._
    val docs = ((Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).mkString(" "))
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val dir = tmpDir("bpetrain")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merged = BpeQueries.defs("bpe_train_merges").build(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merged.take(6).toSeq == Seq(
      (1, "w", "e", 8L), (2, "l", "o", 7L), (3, "e", "we", 6L),
      (4, "ewe", "s", 6L), (5, "ewes", "t", 6L), (6, "ewest", "</w>", 6L)),
      merged.toSeq)
  }

  test("sf0.001 faces are internally consistent") {
    val segs = BpeQueries.defs("bpe_vocab_segments").build(spark, sf).collect()
    assert(segs.nonEmpty)
    // every segmentation reassembles to word + '</w>'
    segs.foreach { r =>
      val word = r.getString(0)
      val seg = r.getString(1).split(" ").mkString
      assert(seg == word + "</w>", s"$word -> ${r.getString(1)}")
    }
    val totals = BpeQueries.defs("bpe_corpus_token_count").build(spark, sf).collect()(0)
    assert(totals.getLong(0) > 0 && totals.getLong(1) >= totals.getLong(0))
    // per-doc encode sums to the corpus total
    val docsSum = BpeQueries.defs("bpe_encode_docs").build(spark, sf)
      .agg(sum("bpe_tokens")).collect()(0).getLong(0)
    assert(docsSum == totals.getLong(1), s"$docsSum != ${totals.getLong(1)}")
    // OOV face: segmentations reassemble to the holdout word + '</w>'
    val oov = BpeQueries.defs("bpe_encode_oov").build(spark, sf).collect()
    oov.foreach { r =>
      assert(r.getString(1).split(" ").mkString == r.getString(0) + "</w>")
    }
  }
}
