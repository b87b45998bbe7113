package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.AnalysisException

/** The SQL `DISTINCT ON` surface: the lexical rewrite in isolation,
  * executed keep-first-per-key semantics against the hand-built window
  * spelling, composition with the QUALIFY rewrite, and the loud-failure
  * contract (ORDER BY required). */
class DistinctOnSqlSpec extends SparkFunSuite {
  import spark.implicits._

  // ---------- the rewrite as a pure function ----------

  test("rewrite: basic clause becomes the rn = 1 window wrap") {
    val got = DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (g) g, v FROM t ORDER BY g, v DESC")
    // whitespace-normalized: the rewrite inserts newlines before each
    // generated continuation (comment-swallow defense); sort keys are
    // materialized as helper columns (hidden-sort-key support)
    assert(got.replaceAll("\\s+", " ").trim ==
      "SELECT * EXCEPT (__graft_don_0, __graft_dord_0_0, __graft_dord_0_1) " +
        "FROM (SELECT g, v , row_number() OVER " +
        "(PARTITION BY g ORDER BY g, v DESC ) AS __graft_don_0 , (g ) AS __graft_dord_0_0 " +
        ", (v ) AS __graft_dord_0_1 FROM t ) __graft_d_0 " +
        "WHERE __graft_don_0 = 1 ORDER BY __graft_dord_0_0 , __graft_dord_0_1 DESC")
  }

  test("rewrite: plain DISTINCT and aggregate DISTINCT are left alone") {
    val q1 = "SELECT DISTINCT g FROM t"
    assert(DistinctOnSqlSyntax.rewrite(q1) == q1)
    val q2 = "SELECT count(DISTINCT v) FROM t"
    assert(DistinctOnSqlSyntax.rewrite(q2) == q2)
    val q3 = "SELECT DISTINCT on_time FROM t" // identifier starting with 'on'
    assert(DistinctOnSqlSyntax.rewrite(q3) == q3)
  }

  test("rewrite: multi-key list and a LIMIT tail stay intact") {
    val got = DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (a, b) a, b, v FROM t ORDER BY a, b, v LIMIT 3")
    val norm = got.replaceAll("\\s+", " ")
    assert(norm.contains("PARTITION BY a, b ORDER BY a, b, v"))
    assert(norm.endsWith(
      "ORDER BY __graft_dord_0_0 , __graft_dord_0_1 , __graft_dord_0_2 LIMIT 3"))
  }

  test("executed: a HIDDEN sort key (not in the projection) works — DuckDB parity") {
    Seq(("A", 1L, 10L), ("A", 2L, 30L), ("A", 3L, 20L),
      ("B", 4L, 5L), ("B", 5L, 50L))
      .toDF("g", "id", "score").createOrReplaceTempView("don_hidden")
    // pick each group's top-score row, but project only (g, id):
    // `score` is a hidden sort key the old rewrite could not resolve
    val got = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_hidden ORDER BY g, score DESC, id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A", 2L), ("B", 5L)), got.toString)
    // positional ordinals expand to the select item's VALUE expression
    // (DuckDB semantics, fuzz P6 — they used to be refused; unexpanded
    // they'd be CONSTANTS inside the injected OVER())
    val ords = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_hidden ORDER BY 1, 2 DESC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ords == Seq(("A", 3L), ("B", 5L)), ords.toString)
    // and a bare ALIAS word resolves against the OUTPUT list even when
    // a base column shadows it (DuckDB: `-id AS id ORDER BY g, id` is
    // sorted by -id, so the per-key pick is the SMALLEST base id)
    val ali = spark.sql(
      "SELECT DISTINCT ON (g) g, -id AS id FROM don_hidden ORDER BY g, id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ali == Seq(("A", -3L), ("B", -5L)), ali.toString)
  }

  test("rewrite: 'DISTINCT ON' inside strings/comments survives") {
    val lit = "SELECT 'DISTINCT ON (x)' AS s FROM t ORDER BY s"
    assert(DistinctOnSqlSyntax.rewrite(lit) == lit)
    val cmt = "SELECT 1 -- DISTINCT ON (x)\nFROM t"
    assert(DistinctOnSqlSyntax.rewrite(cmt) == cmt)
  }

  test("a line comment after a modifier cannot swallow later sort keys (r11 advisor)") {
    // the old ", " outer-ORDER-BY joint buried every key after the
    // comment inside it — wrong row order and, with LIMIT, a wrong row
    // set. Deterministic catch: strip comment spans from the REWRITTEN
    // text and demand the later helper key is still live syntax.
    val got = DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (g) g, id FROM don_cmt " +
        "ORDER BY g, score DESC -- latest\n, id DESC LIMIT 1")
    val spans = QualifySqlSyntax.commentSpans(got)
    val code = got.zipWithIndex.collect {
      case (c, i) if !spans.exists(s => s._1 <= i && i < s._2) => c
    }.mkString
    val outer = code.substring(code.lastIndexOf("ORDER BY"))
    assert(outer.replaceAll("\\s+", " ").startsWith(
      "ORDER BY __graft_dord_0_0 , __graft_dord_0_1 DESC , __graft_dord_0_2 DESC"),
      s"later sort keys lost to the comment:\n$got")
    // and the statement executes with the tiebreaker in force
    Seq(("A", 1L, 10L), ("A", 2L, 10L), ("B", 9L, 5L))
      .toDF("g", "id", "score").createOrReplaceTempView("don_cmt")
    val rows = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_cmt " +
        "ORDER BY g, score DESC -- latest\n, id DESC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("A", 2L), ("B", 9L)), rows.toString)
  }

  test("executed: bare columns named like modifiers and quoted identifiers sort (r11 advisor)") {
    Seq(("A", 2L, 1L), ("A", 1L, 2L), ("B", 5L, 3L))
      .toDF("g", "first", "Weird Col").createOrReplaceTempView("don_mods")
    // `first` is a legal bare column — the trailing-modifier scan must
    // not strip it down to an empty expression
    val got = spark.sql(
      "SELECT DISTINCT ON (g) g FROM don_mods ORDER BY g, first")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("A", "B"), got.toString)
    // quoted identifiers emit no word events — with and without mods
    val q = spark.sql(
      "SELECT DISTINCT ON (g) g, `Weird Col` AS w FROM don_mods " +
        "ORDER BY g, `Weird Col` DESC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(q == Seq(("A", 2L), ("B", 3L)), q.toString)
  }

  test("rewrite failures: missing ORDER BY, not after SELECT, no FROM") {
    val e1 = intercept[AnalysisException] {
      DistinctOnSqlSyntax.rewrite("SELECT DISTINCT ON (g) g, v FROM t")
    }
    assert(e1.getMessage.contains("ORDER BY is required"))
    val e2 = intercept[AnalysisException] {
      DistinctOnSqlSyntax.rewrite("SELECT v, DISTINCT ON (g) FROM t ORDER BY g")
    }
    assert(e2.getMessage.contains("directly follow SELECT"))
    val e3 = intercept[AnalysisException] {
      DistinctOnSqlSyntax.rewrite("SELECT DISTINCT ON (g) 1 ORDER BY g")
    }
    assert(e3.getMessage.contains("FROM"))
  }

  // ---------- executed semantics ----------

  private def fixture(): Unit = {
    spark.range(12)
      .selectExpr("id", "id % 3 AS g", "(id * 7) % 11 AS v")
      .createOrReplaceTempView("don_t")
  }

  test("executed: keep-first-per-key equals the hand-built window spelling") {
    fixture()
    val rows = spark.sql(
      """SELECT DISTINCT ON (g) g, id, v FROM don_t
        |ORDER BY g, v DESC, id""".stripMargin).collect()
    val want = spark.sql(
      """SELECT g, id, v FROM (
        |  SELECT g, id, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
        |  FROM don_t) x WHERE rn = 1 ORDER BY g, v DESC, id""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.toSeq == want.toSeq)
  }

  test("executed: helper column never leaks into the output schema") {
    fixture()
    val df = spark.sql(
      "SELECT DISTINCT ON (g) g, v FROM don_t ORDER BY g, v DESC")
    assert(df.columns.toSeq == Seq("g", "v"))
  }

  test("executed: composes with QUALIFY in the same statement chain") {
    fixture()
    // DISTINCT ON in a subquery, QUALIFY outside — both rewrites fire
    val n = spark.sql(
      """SELECT g, v,
        |  row_number() OVER (ORDER BY v DESC) AS rn
        |FROM (SELECT DISTINCT ON (g) g, v FROM don_t ORDER BY g, v DESC) u
        |QUALIFY rn <= 2
        |ORDER BY rn""".stripMargin).collect()
    assert(n.length == 2)
  }

  test("rewrite: ORDER BY ALL expands to value expressions, operand keywords don't fake aliases") {
    // ALL expands to the select list's VALUE expressions with the
    // modifier distributed (r13 fuzz P5); an UNALIASED boolean item
    // must expand whole — `b` after AND is that AND's operand, never an
    // implicit output alias (the operand-expecting guard)
    val got = DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (g) g , v > 1 AND w FROM t ORDER BY ALL DESC")
    val norm = got.replaceAll("\\s+", " ")
    assert(norm.contains("ORDER BY g DESC , v > 1 AND w DESC"), got)
    // aliased items DO strip to the expression
    val got2 = DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (g) g , v * 2 AS dbl FROM t ORDER BY ALL")
    assert(got2.replaceAll("\\s+", " ").contains("ORDER BY g , v * 2"), got2)
    // CASE … END alias still strips (END is expression-ENDING)
    assert(QualifySqlSyntax.stripSelectAlias(
      "CASE WHEN v > 1 THEN 2 ELSE 3 END big") ==
      "CASE WHEN v > 1 THEN 2 ELSE 3 END")
    // star items refuse loudly (they need the bound schema)
    val e = intercept[AnalysisException](DistinctOnSqlSyntax.rewrite(
      "SELECT DISTINCT ON (g) * FROM t ORDER BY ALL"))
    assert(e.getMessage.contains("cannot expand a star select item"), e.getMessage)
  }

  test("plan: the rank-limit pushdown fires through the wrap") {
    fixture()
    val df = spark.sql(
      "SELECT DISTINCT ON (g) g, id FROM don_t ORDER BY g, id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank-limit pushdown for rn = 1:\n$plan")
  }
}
