package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Aho–Corasick expression: brute-force agreement with per-pattern
  * contains() over randomized word soup, the overlap/nesting corners
  * (dictionary-suffix closure), UTF-8 multibyte needles, codegen vs
  * interpreted equality, and the loud-failure contract. */
class AcMatchesSpec extends SparkFunSuite {
  import spark.implicits._

  private def ac(pats: Seq[String]): AhoCorasick =
    new AhoCorasick(pats.map(_.getBytes("UTF-8")).toArray)

  private def run(a: AhoCorasick, text: String): Seq[Int] = {
    val r = a.matches(UTF8String.fromString(text))
    (0 until r.numElements()).map(r.getInt)
  }

  test("matches equal per-pattern contains() on randomized word soup") {
    val vocab = Array("a", "ab", "aba", "b", "ba", "bab", "c")
    val pats = Seq("ab", "aba", "ba", "bab", "abab", "c c", "ca")
    val a = ac(pats)
    val rng = new graft.TestRng(0xACE1L)
    for (_ <- 1 to 300) {
      val n = 1 + (rng.nextLong().abs % 12).toInt
      val text = (1 to n).map(_ => vocab((rng.nextLong().abs % vocab.length).toInt))
        .mkString(" ")
      val want = pats.indices.filter(i => text.contains(pats(i)))
      assert(run(a, text) == want, s"text=$text")
    }
  }

  test("nested and overlapping patterns all report") {
    val a = ac(Seq("he", "she", "his", "hers"))
    assert(run(a, "ushers") == Seq(0, 1, 3)) // he, she, hers — the AC75 example
    assert(run(a, "his hers") == Seq(0, 2, 3))
    assert(run(a, "xyz") == Seq())
  }

  test("utf-8 multibyte needles match exactly") {
    val a = ac(Seq("über", "naïve", "ü"))
    assert(run(a, "the über naïve test") == Seq(0, 1, 2))
    assert(run(a, "uber naive") == Seq())
  }

  test("pattern equal to whole text, at start, at end") {
    val a = ac(Seq("abc", "ab", "bc"))
    assert(run(a, "abc") == Seq(0, 1, 2))
    assert(run(a, "ab") == Seq(1))
    assert(run(a, "xbc") == Seq(2))
    assert(run(a, "") == Seq())
  }

  test("codegen and interpreted paths agree through SQL and Column API") {
    val df = Seq("the slow merge slow path", "batch batch stream", "nothing here")
      .toDF("text")
    df.createOrReplaceTempView("ac_t")
    val viaSql = spark.sql(
      "SELECT ac_matches(text, array('merge slow', 'slow', 'batch batch')) AS m " +
        "FROM ac_t").collect().map(_.getSeq[Int](0)).toSeq
    assert(viaSql == Seq(Seq(0, 1), Seq(2), Seq()))
    val viaCol = df.select(AcMatches.ac_matches(col("text"),
      array(lit("merge slow"), lit("slow"), lit("batch batch"))).as("m"))
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(viaCol == viaSql)
    // null text → null result
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(AcMatches.ac_matches(col("text"), array(lit("x"))).as("m"))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  test("loud failures: empty pattern, non-foldable patterns") {
    val e1 = intercept[Exception] {
      Seq("t").toDF("text")
        .select(AcMatches.ac_matches(col("text"), array(lit(""))))
        .collect()
    }
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[Exception] {
      Seq(("t", Seq("p"))).toDF("text", "pats")
        .select(AcMatches.ac_matches(col("text"), col("pats")))
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable"))
  }
}
