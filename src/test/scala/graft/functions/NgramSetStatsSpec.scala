package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[NgramSetStats]] must be exactly the explode → substring →
  * groupBy{sort_array(collect_set), min(md5), min(md5('x'||·))} chain it
  * replaced in the ngram-Jaccard candidate machinery: same distinct
  * 12-gram sets in the same (binary) sort order, same min-md5 band keys,
  * on every text shape the SQL path can see. */
class NgramSetStatsSpec extends SparkFunSuite {

  test("ngram_set_stats ≡ explode/collect_set/min(md5) composition") {
    import spark.implicits._
    val rnd = new java.util.Random(12)
    val vocab = Array("alpha", "beta", "gamma", "δέλτα", "日本", "x")
    val texts = Seq(
      null, "", "a", "exactly12ch.", "short",
      "repeat repeat repeat repeat repeat repeat repeat",
      "héllo wörld héllo wörld héllo wörld",
      "日本語のテキストの重複排除のテスト日本語のテキスト",
      "ab" * 40, // periodic: heavy shingle duplication
      "z" * 11, "z" * 12, "z" * 13,
      (0 until 600).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    ) ++ Seq.fill(200)(
      (0 until rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    // Non-null texts only: for NULL text the old chain emitted
    // (doc, [], null, null) (greatest() skips nulls → one NULL shingle
    // → empty collect_set) while the kernel propagates null. Both are
    // unreachable in the query — a null band key never joins into the
    // candidate table, and docSets rows are only consumed via that
    // join — and the corpus has no null texts at any SF.
    val oracle = df.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(length(text)-11, 1))")).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, i, 12)").as("shingle"))
      .groupBy("doc_id").agg(
        sort_array(collect_set(col("shingle"))).as("shs"),
        min(md5(col("shingle").cast("binary"))).as("s1"),
        min(md5(concat(lit("x"), col("shingle")).cast("binary"))).as("s2"))

    val kernel = df.filter(col("text").isNotNull)
      .select(col("doc_id"),
        NgramSetStats.ngram_set_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.shs").as("kshs"),
        col("st.s1").as("ks1"), col("st.s2").as("ks2"))

    val mismatches = oracle.join(kernel, Seq("doc_id"), "full")
      .filter(!(col("shs") <=> col("kshs")) ||
        !(col("s1") <=> col("ks1")) || !(col("s2") <=> col("ks2")))
      .collect()
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))

    // null text → null struct (the UnaryExpression default the query
    // path relies on never materializing)
    val nullRow = df.filter(col("text").isNull)
      .select(NgramSetStats.ngram_set_stats(col("text"))).collect()
    assert(nullRow.forall(_.isNullAt(0)))
  }
}
