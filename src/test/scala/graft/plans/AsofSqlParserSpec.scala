package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.AnalysisException

/** The SQL `ASOF JOIN` surface: the lexical rewrite in isolation, the
  * physical plan it produces (the native AsofJoinExec, never a
  * sort-merge join), left/inner and backward/forward quadrant
  * semantics on planted data, and the loud-failure contract for every
  * documented limitation. */
class AsofSqlParserSpec extends SparkFunSuite {
  import spark.implicits._

  // ---------- the rewrite as a pure function ----------

  test("rewrite: ASOF JOIN gains the marker, plain JOIN untouched") {
    val got = GraftSqlParser.rewrite(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t")
    assert(got ==
      "SELECT * FROM a JOIN b ON graft_asof_marker('inner') AND a.k = b.k AND a.t >= b.t")
    val plain = "SELECT * FROM a JOIN b ON a.k = b.k"
    assert(GraftSqlParser.rewrite(plain) == plain)
  }

  test("rewrite: ASOF LEFT JOIN carries mode 'left'") {
    val got = GraftSqlParser.rewrite("FROM a ASOF LEFT JOIN b ON x")
    assert(got == "FROM a JOIN b ON graft_asof_marker('left') AND x")
  }

  test("rewrite: case-insensitive and whitespace-tolerant") {
    // the rewrite canonicalizes the JOIN/ON keywords it touches
    val got = GraftSqlParser.rewrite("from a asof  Left\n  join b on x")
    assert(got == "from a JOIN b ON graft_asof_marker('left') AND x")
  }

  test("rewrite: 'ASOF JOIN' inside string literals and comments survives") {
    val lit = "SELECT 'an ASOF JOIN ON demo' AS s FROM t"
    assert(GraftSqlParser.rewrite(lit) == lit)
    val cmt = "SELECT 1 -- ASOF JOIN ON nope\nFROM t"
    assert(GraftSqlParser.rewrite(cmt) == cmt)
    val blk = "SELECT 1 /* ASOF JOIN ON nope */ FROM t"
    assert(GraftSqlParser.rewrite(blk) == blk)
  }

  test("rewrite: ASOF as a plain identifier is left alone") {
    val q = "SELECT asof, asof_col FROM asof WHERE asof = 1"
    assert(GraftSqlParser.rewrite(q) == q)
  }

  test("rewrite: an ON inside a joined subquery does not consume the outer ASOF") {
    val got = GraftSqlParser.rewrite(
      "FROM a ASOF JOIN (SELECT * FROM x JOIN y ON x.i = y.i) b ON a.k = b.k AND a.t >= b.t")
    assert(got ==
      "FROM a JOIN (SELECT * FROM x JOIN y ON x.i = y.i) b ON graft_asof_marker('inner') AND a.k = b.k AND a.t >= b.t")
  }

  test("rewrite: two ASOF joins each mark their own ON") {
    val got = GraftSqlParser.rewrite(
      "FROM a ASOF JOIN b ON c1 ASOF LEFT JOIN c ON c2")
    assert(got ==
      "FROM a JOIN b ON graft_asof_marker('inner') AND c1 JOIN c ON graft_asof_marker('left') AND c2")
  }

  // ---------- end-to-end plan + semantics ----------

  private def trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"), (2L, 50L, "t3"))
    .toDF("sym", "tus", "trade")
  private def quotes = Seq(
    (1L, 8L, "q8"), (1L, 15L, "q15"), (1L, 30L, "q30"), (3L, 1L, "qx"))
    .toDF("qsym", "qus", "quote")

  private def run(sql: String): Array[(Long, Long, String, Option[String])] = {
    trades.createOrReplaceTempView("sqltest_trades")
    quotes.createOrReplaceTempView("sqltest_quotes")
    spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), Option(r.getAs[String](3))))
  }

  test("SQL ASOF LEFT JOIN plans the native exec (no sort-merge join) " +
      "and matches backward semantics") {
    val df = {
      trades.createOrReplaceTempView("sqltest_trades")
      quotes.createOrReplaceTempView("sqltest_quotes")
      spark.sql(
        """SELECT sym, tus, trade, quote FROM sqltest_trades
          |ASOF LEFT JOIN sqltest_quotes
          |ON sym = qsym AND tus >= qus ORDER BY sym, tus""".stripMargin)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getAs[String](3))))
    assert(got.toSeq == Seq(
      (1L, 5L, "t0", None), // nothing at or before 5
      (1L, 10L, "t1", Some("q8")),
      (1L, 20L, "t2", Some("q15")),
      (2L, 50L, "t3", None))) // no quotes for sym 2 — LEFT keeps it
  }

  test("SQL ASOF JOIN (inner) drops unmatched left rows") {
    val got = run(
      """SELECT sym, tus, trade, quote FROM sqltest_trades
        |ASOF JOIN sqltest_quotes
        |ON sym = qsym AND tus >= qus ORDER BY sym, tus""".stripMargin)
    assert(got.toSeq == Seq(
      (1L, 10L, "t1", Some("q8")),
      (1L, 20L, "t2", Some("q15"))))
  }

  test("tus <= qus picks the forward strategy") {
    val got = run(
      """SELECT sym, tus, trade, quote FROM sqltest_trades
        |ASOF JOIN sqltest_quotes
        |ON sym = qsym AND tus <= qus ORDER BY sym, tus""".stripMargin)
    assert(got.toSeq == Seq(
      (1L, 5L, "t0", Some("q8")), // smallest qus >= 5
      (1L, 10L, "t1", Some("q15")),
      (1L, 20L, "t2", Some("q30"))))
  }

  test("reversed operand order (r.t <= l.t) still reads as backward") {
    val got = run(
      """SELECT sym, tus, trade, quote FROM sqltest_trades
        |ASOF JOIN sqltest_quotes
        |ON sym = qsym AND qus <= tus ORDER BY sym, tus""".stripMargin)
    assert(got.toSeq == Seq(
      (1L, 10L, "t1", Some("q8")),
      (1L, 20L, "t2", Some("q15"))))
  }

  // ---------- the loud-failure contract ----------

  private def failing(sql: String): String = {
    trades.createOrReplaceTempView("sqltest_trades")
    quotes.createOrReplaceTempView("sqltest_quotes")
    intercept[AnalysisException](spark.sql(sql).collect()).getMessage
  }

  test("OR around the join predicates fails loudly") {
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON sym = qsym OR tus >= qus""".stripMargin)
    assert(msg.contains("top-level conjunction"), msg)
  }

  test("missing time inequality fails loudly") {
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON sym = qsym""".stripMargin)
    assert(msg.contains("needs one time inequality"), msg)
  }

  test("two time inequalities fail loudly") {
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON tus >= qus AND tus <= qus""".stripMargin)
    assert(msg.contains("exactly one time inequality"), msg)
  }

  test("a strict inequality is rejected, not silently reinterpreted") {
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON sym = qsym AND tus > qus""".stripMargin)
    assert(msg.contains("unsupported predicate"), msg)
  }

  test("non-long time operands get the cast hint") {
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON sym = qsym AND CAST(tus AS INT) >= CAST(qus AS INT)""".stripMargin)
    assert(msg.contains("unix_micros"), msg)
  }

  test("hand-written marker outside a join condition fails loudly") {
    val msg = intercept[AnalysisException](
      spark.sql("SELECT graft_asof_marker('left') FROM sqltest_trades")
        .collect()).getMessage
    assert(msg.contains("internal to ASOF JOIN rewriting"), msg)
  }

  test("USING after ASOF JOIN fails loudly instead of poisoning the next ON") {
    // advisor r9: the queued marker used to ride the NEXT unrelated ON
    // at the same depth, silently converting the wrong join
    val msg = intercept[AnalysisException](GraftSqlParser.rewrite(
      "SELECT * FROM a ASOF JOIN b USING (k) JOIN c ON a.t >= c.t AND a.k = c.k"))
      .getMessage
    assert(msg.contains("USING is not supported after ASOF"), msg)
    // plain JOIN ... USING without a pending ASOF is untouched
    val q = "SELECT * FROM a JOIN b USING (k)"
    assert(GraftSqlParser.rewrite(q) == q)
  }

  test("inner ASOF rejects a non-null-propagating right time operand") {
    // coalesce(qus, 0) evaluates NON-null on unmatched left-outer rows,
    // so IsNotNull over it would silently turn inner into left —
    // rejected loudly (advisor r9)
    val msg = failing(
      """SELECT * FROM sqltest_trades ASOF JOIN sqltest_quotes
        |ON sym = qsym AND tus >= coalesce(qus, 0L)""".stripMargin)
    assert(msg.contains("null when the right side is unmatched"), msg)
    // null-propagating arithmetic over a right column is still fine
    val got = run(
      """SELECT sym, tus, trade, quote FROM sqltest_trades
        |ASOF JOIN sqltest_quotes
        |ON sym = qsym AND tus >= qus + 0L ORDER BY sym, tus""".stripMargin)
    assert(got.toSeq == Seq(
      (1L, 10L, "t1", Some("q8")),
      (1L, 20L, "t2", Some("q15"))))
  }
}
