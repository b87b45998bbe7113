package graft.operators

import graft.SparkFunSuite
import graft.functions.MaxBigramRun.max_bigram_run
import org.apache.spark.sql.functions._

/** The per-row top-bigram computation behind text_repetition: the native
  * [[graft.functions.MaxBigramRun]] expression must agree exactly with
  * naive bigram counting, and the query plan must stay a stateless
  * projection (the point of the rewrite — at 100 TB the alternative
  * shuffles every distinct bigram of the corpus twice). */
class RepetitionSpec extends SparkFunSuite {
  import spark.implicits._

  private def naiveMaxCount(toks: Seq[String]): Long =
    toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      .toSeq.groupBy(identity).values.map(_.size.toLong).max

  test("native max_bigram_run equals naive bigram counting on randomized docs") {
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
      .select(col("doc_id"), max_bigram_run(col("tk")).as("max_rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("native max_ngram_run equals naive n-gram counting for n in 2..4") {
    import graft.functions.MaxNgramRun.max_ngram_run
    def naiveN(toks: Seq[String], n: Int): Long =
      if (toks.length < n) 0L
      else toks.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .toSeq.groupBy(identity).values.map(_.size.toLong).max
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "x y", "z")
    val docs = (1 to 100).map { i =>
      val len = 1 + rng.nextInt(25)
      (i.toLong, Vector.fill(len)(vocab(rng.nextInt(vocab.size))))
    }
    for (n <- 2 to 4) {
      val expected = docs.map { case (id, tk) => id -> naiveN(tk, n) }.toMap
      val got = docs.toDF("doc_id", "tk")
        .select(col("doc_id"), max_ngram_run(col("tk"), lit(n)).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n")
    }
  }

  test("degenerate docs: 2 tokens, all-equal tokens, no repeats, too-short") {
    val docs = Seq(
      (1L, Seq("x", "y")),          // one bigram
      (2L, Seq("x", "x", "x", "x")), // "x x" three times
      (3L, Seq("a", "b", "c", "d")), // all distinct bigrams
      (4L, Seq("solo")),             // no bigram possible
      (5L, Seq.empty[String])        // empty array
    ).toDF("doc_id", "tk")
    val got = docs.select(col("doc_id"), max_bigram_run(col("tk")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("max_bigram_run works from plain SQL and stays codegen (no Filter fallback)") {
    val df = Seq((1L, Seq("a", "b", "a", "b"))).toDF("doc_id", "tk")
    df.createOrReplaceTempView("mbr_docs")
    val viaSql = spark.sql("SELECT max_bigram_run(tk) AS m FROM mbr_docs").collect()
    assert(viaSql.head.getLong(0) == 2L)
    // the expression must not break whole-stage codegen: a projection
    // using it compiles into a WholeStageCodegen stage (a range source,
    // not local rows — LocalTableScan would constant-fold the plan away)
    val ranged = spark.range(8)
      .select(max_bigram_run(split(concat_ws(" ", lit("a"), lit("b"), col("id")), " ")))
    val plan = ranged.queryExecution.executedPlan
    // "*(n)" is the WholeStageCodegen marker in the plan's simpleString
    assert(plan.toString.contains("*(1)"), s"expected codegen:\n$plan")
    assert(ranged.collect().forall(_.getLong(0) == 1L))
  }

  test("max_ngram_run coerces integral literals of other widths from SQL") {
    val df = Seq((1L, Seq("a", "b", "a", "b"))).toDF("doc_id", "tk")
    df.createOrReplaceTempView("mnr_docs")
    // BIGINT literal: ImplicitCastInputTypes must coerce to INT instead
    // of failing analysis
    val viaSql = spark.sql(
      "SELECT max_ngram_run(tk, CAST(2 AS BIGINT)) AS m FROM mnr_docs").collect()
    assert(viaSql.head.getLong(0) == 2L)
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
