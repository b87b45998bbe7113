package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The per-row top-bigram computation behind text_repetition: the
  * sorted-array longest-equal-run must agree exactly with naive bigram
  * counting, and the query plan must stay a stateless projection (the
  * point of the rewrite — at 100 TB the alternative shuffles every
  * distinct bigram of the corpus twice). */
class RepetitionSpec extends SparkFunSuite {
  import spark.implicits._

  private def naiveMaxCount(toks: Seq[String]): Long =
    toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      .toSeq.groupBy(identity).values.map(_.size.toLong).max

  test("sorted-run max equals naive bigram counting on randomized docs") {
    val rng = new scala.util.Random(42)
    // small vocab forces heavy bigram collisions; tokens containing the
    // join separator exercise the same space-concat convention the
    // DuckDB oracle uses (both sides alias identically by construction)
    val vocab = Vector("a", "b", "c", "aa", "a a", "b c", "x")
    val docs = (1 to 200).map { i =>
      val n = 2 + rng.nextInt(30)
      (i.toLong, Vector.fill(n)(vocab(rng.nextInt(vocab.size))))
    }
    val expected = docs.map { case (id, tk) => id -> naiveMaxCount(tk) }.toMap
    val got = docs.toDF("doc_id", "tk")
      .select(col("doc_id"), expr(TextQueries.maxBigramRunSql("tk")).as("max_rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("degenerate docs: 2 tokens, all-equal tokens, no repeats") {
    val docs = Seq(
      (1L, Seq("x", "y")),          // one bigram
      (2L, Seq("x", "x", "x", "x")), // "x x" three times
      (3L, Seq("a", "b", "c", "d"))  // all distinct bigrams
    ).toDF("doc_id", "tk")
    val got = docs.select(col("doc_id"), expr(TextQueries.maxBigramRunSql("tk")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 3L -> 1L))
  }

  test("text_repetition plan is aggregate-free (no bigram reaches a shuffle)") {
    val q = TextQueries.defs("text_repetition").build(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.sparkPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.isEmpty, s"repetition must be a per-row projection, found aggregates:\n$plan")
    assert(q.count() > 0)
  }
}
