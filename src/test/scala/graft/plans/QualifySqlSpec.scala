package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.AnalysisException

/** The SQL `QUALIFY` surface: the lexical rewrite in isolation, the
  * executed semantics (filter AFTER windows, select aliases visible,
  * tail ORDER BY/LIMIT outside the wrap, nesting, set-op scoping), the
  * plan shape (Filter over Window, ONE exchange, no extra shuffle from
  * the wrap), and the loud-failure contract. */
class QualifySqlSpec extends SparkFunSuite {
  import spark.implicits._

  // ---------- the rewrite as a pure function ----------

  test("rewrite: basic clause becomes the * EXCEPT wrap") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT g, v FROM t QUALIFY v > 1 ORDER BY g")
    // whitespace-normalized: the rewrite inserts newlines before each
    // generated continuation (comment-swallow defense)
    assert(got.replaceAll("\\s+", " ") ==
      "SELECT * EXCEPT (__graft_qualify_0) FROM (SELECT g, v , (v > 1 ) AS __graft_qualify_0 " +
        "FROM t ) __graft_q_0 WHERE __graft_qualify_0 ORDER BY g")
  }

  test("rewrite: no QUALIFY → identity (fast path)") {
    val q = "SELECT a FROM t WHERE b ORDER BY a"
    assert(QualifySqlSyntax.rewrite(q) eq q)
  }

  test("rewrite: QUALIFY inside string literals and comments survives") {
    val lit = "SELECT 'use QUALIFY here' AS s FROM t"
    assert(QualifySqlSyntax.rewrite(lit) == lit)
    val cmt = "SELECT 1 -- QUALIFY nope\nFROM t"
    assert(QualifySqlSyntax.rewrite(cmt) == cmt)
    val blk = "SELECT 1 /* QUALIFY nope */ FROM t"
    assert(QualifySqlSyntax.rewrite(blk) == blk)
  }

  test("trailing line comments cannot swallow injected syntax") {
    // regression (found by the o28 adversarial gate on FROM-first): a
    // user clause ending in `-- comment` used to absorb the generated
    // continuation appended on the same line
    val got = QualifySqlSyntax.rewrite(
      "SELECT g, v -- tail\nFROM t QUALIFY v > 1 -- pred\nORDER BY g")
    val stripped = got.replaceAll("--[^\n]*", "").replaceAll("\\s+", " ")
    assert(stripped ==
      "SELECT * EXCEPT (__graft_qualify_0) FROM (SELECT g, v , (v > 1 ) " +
        "AS __graft_qualify_0 FROM t ) __graft_q_0 WHERE __graft_qualify_0 ORDER BY g",
      s"\nrewritten:\n$got")
  }

  test("rewrite: predicate ends at ORDER/LIMIT, tail stays outside") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT g FROM t QUALIFY x <= 2 LIMIT 5")
    assert(got.endsWith("WHERE __graft_qualify_0 LIMIT 5"))
    val got2 = QualifySqlSyntax.rewrite(
      "SELECT g FROM t QUALIFY x <= 2 ORDER BY g DESC LIMIT 5")
    assert(got2.endsWith("WHERE __graft_qualify_0 ORDER BY g DESC LIMIT 5"))
  }

  test("rewrite: ORDER BY inside an OVER() does not end the predicate") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT g FROM t QUALIFY row_number() OVER (ORDER BY v) = 1 ORDER BY g")
    assert(got.replaceAll("\\s+", " ")
      .contains("(row_number() OVER (ORDER BY v) = 1 ) AS __graft_qualify_0"))
    assert(got.endsWith("WHERE __graft_qualify_0 ORDER BY g"))
  }

  test("rewrite: a subquery QUALIFY closes at its own paren") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT * FROM (SELECT g FROM t QUALIFY x = 1) u WHERE g > 0")
    assert(got.replaceAll("\\s+", " ") ==
      "SELECT * FROM (SELECT * EXCEPT (__graft_qualify_0) FROM (SELECT g , (x = 1 ) " +
        "AS __graft_qualify_0 FROM t ) __graft_q_0 WHERE __graft_qualify_0 ) u WHERE g > 0")
  }

  test("rewrite: two QUALIFYs (outer + subquery) get distinct helper names") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT a FROM (SELECT g FROM t QUALIFY x = 1) u QUALIFY y = 2")
    assert(got.contains("__graft_qualify_0") && got.contains("__graft_qualify_1"))
    assert(!got.toUpperCase.matches(".*\\bQUALIFY\\b.*") ||
      !got.toUpperCase.contains(" QUALIFY "))
  }

  test("rewrite: QUALIFY scopes to its own set-op branch") {
    val got = QualifySqlSyntax.rewrite(
      "SELECT g FROM t QUALIFY x = 1 UNION ALL SELECT g FROM u")
    assert(got.contains("WHERE __graft_qualify_0 UNION ALL SELECT g FROM u"))
  }

  test("rewrite failures: DISTINCT, no FROM, empty predicate") {
    val e1 = intercept[AnalysisException] {
      QualifySqlSyntax.rewrite("SELECT DISTINCT g FROM t QUALIFY x = 1")
    }
    assert(e1.getMessage.contains("DISTINCT"))
    val e2 = intercept[AnalysisException] {
      QualifySqlSyntax.rewrite("SELECT 1 QUALIFY x = 1")
    }
    assert(e2.getMessage.contains("FROM"))
    val e3 = intercept[AnalysisException] {
      QualifySqlSyntax.rewrite("SELECT g FROM t QUALIFY ORDER BY g")
    }
    assert(e3.getMessage.contains("empty"))
  }

  test("mixed qualified-ref + select-alias ORDER BY items fail loudly (r12 advisor)") {
    // `rn` is a select-list alias; materializing the CASE inside the wrap
    // would re-resolve `rn` against the base tables (silent divergence
    // when a base column shadows it) — refuse with a clear message.
    val e = intercept[AnalysisException] {
      QualifySqlSyntax.rewrite(
        "SELECT t.g, row_number() OVER (ORDER BY t.v) AS rn " +
          "FROM t QUALIFY rn <= 2 ORDER BY CASE WHEN t.v > 0 THEN rn END")
    }
    assert(e.getMessage.contains("mixes a table-qualified column"), e.getMessage)
    assert(e.getMessage.contains("RN"), e.getMessage)
    // pure-qualified items still materialize; pure-alias items stay outside
    val ok = QualifySqlSyntax.rewrite(
      "SELECT t.g, row_number() OVER (ORDER BY t.v) AS rn " +
        "FROM t QUALIFY rn <= 2 ORDER BY t.v DESC, rn")
    assert(ok.contains("__graft_qord_0_0"), ok)
    // alias words inside function calls / keywords don't false-positive
    val ok2 = QualifySqlSyntax.rewrite(
      "SELECT t.g, max(v) AS rn FROM t QUALIFY rn > 0 " +
        "ORDER BY CASE WHEN t.v IS NULL THEN abs(t.v) END")
    assert(ok2.contains("__graft_qord"), ok2)
  }

  test("selectListAliases: explicit AS, implicit trailing word, bare columns excluded") {
    assert(QualifySqlSyntax.selectListAliases("a, b AS x, sum(c) total, t.d")
      == Set("X", "TOTAL"))
    assert(QualifySqlSyntax.selectListAliases(
      "cast(a AS int), f(b), a + b") == Set.empty)
    // comments between expr and alias stay whitespace-equivalent
    assert(QualifySqlSyntax.selectListAliases("a + b /* why */ s") == Set("S"))
  }

  // ---------- executed semantics ----------

  private def fixture(): Unit = {
    spark.range(12)
      .selectExpr("id", "id % 3 AS g", "(id * 7) % 11 AS v")
      .createOrReplaceTempView("qualify_t")
  }

  test("executed: per-group top-2 via QUALIFY on a window alias") {
    fixture()
    val rows = spark.sql(
      """SELECT g, id,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
        |FROM qualify_t
        |QUALIFY rn <= 2
        |ORDER BY g, rn""".stripMargin).collect()
    assert(rows.length == 6) // 3 groups × top-2
    assert(rows.forall(_.getInt(2) <= 2))
    // against the hand-built window+filter spelling
    val want = spark.sql(
      """SELECT g, id, rn FROM (
        |  SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
        |  FROM qualify_t) x WHERE rn <= 2 ORDER BY g, rn""".stripMargin).collect()
    assert(rows.toSeq == want.toSeq)
  }

  test("executed: QUALIFY with a direct window expression (no alias)") {
    fixture()
    val n = spark.sql(
      """SELECT g, id FROM qualify_t
        |QUALIFY rank() OVER (PARTITION BY g ORDER BY v DESC) = 1""".stripMargin).count()
    assert(n == 3)
  }

  test("executed: QUALIFY over an aggregate query (window over sum)") {
    fixture()
    val rows = spark.sql(
      """SELECT g, sum(v) AS sv FROM qualify_t GROUP BY g
        |QUALIFY CAST(rank() OVER (ORDER BY sum(v) DESC) AS BIGINT) <= 1""".stripMargin)
      .collect()
    assert(rows.length == 1)
    val top = spark.sql(
      "SELECT g, sum(v) AS sv FROM qualify_t GROUP BY g ORDER BY sv DESC LIMIT 1")
      .collect()
    assert(rows.head.toSeq == top.head.toSeq)
  }

  test("executed: helper column never leaks into the output schema") {
    fixture()
    val df = spark.sql(
      "SELECT g, v FROM qualify_t QUALIFY row_number() OVER (ORDER BY v) <= 3")
    assert(df.columns.toSeq == Seq("g", "v"))
  }

  // ---------- plan shape ----------

  test("plan: Filter over Window, one exchange, and the rank-limit pushdown fires") {
    fixture()
    val df = spark.sql(
      """SELECT g, id,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
        |FROM qualify_t QUALIFY rn <= 2""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Window ["), s"expected a Window node in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"the QUALIFY wrap must not add exchanges:\n$plan")
    // the wrap's Filter lands directly over the Window, so Spark's
    // InferWindowGroupLimit recognizes `rn <= 2` and inserts a PARTIAL
    // group-limit BELOW the shuffle — QUALIFY gets map-side top-k for
    // free, exactly what a native grammar rule would produce
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank-limit pushdown to fire:\n$plan")
  }
}
