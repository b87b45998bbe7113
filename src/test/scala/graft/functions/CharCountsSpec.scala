package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[CharCounts]] must reproduce the per-character counts of the
  * `explode(split(text, '')) … filter(c <> '')` shape it replaced in
  * text_char_entropy — including code-point (not code-unit) splitting
  * and the empty-input/null conventions. */
class CharCountsSpec extends SparkFunSuite {

  test("char_counts ≡ explode(split(text, '')) counts per char") {
    import spark.implicits._
    val docs = Seq(null, "", "a", "aab", "héllo wörld", "日本語語", "x😀x😀",
      "a b\tc\nd", "  ", "ab" * 100).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val expect = docs
      .select(col("id"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy("id", "c").agg(count(lit(1)).as("n"))
    val got = docs
      .select(col("id"), explode(CharCounts.char_counts(col("text"))))
      .groupBy(col("id"), col("key").as("c")).agg(sum("value").as("n"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      s"expect:\n${expect.orderBy("id", "c").collect().mkString("\n")}\n" +
        s"got:\n${got.orderBy("id", "c").collect().mkString("\n")}")
  }
}
