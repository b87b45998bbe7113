package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The SQL `PIVOT` / `UNPIVOT` statement surface: the static-list
  * rewrite as a pure function, the dynamic (probe) path against the
  * hand-built DataFrame pivot, implicit group-by, suffix naming, the
  * statement-position rule that keeps Spark's native FROM-clause forms
  * untouched, the round-trip identity, and the loud-failure contract. */
class PivotSqlSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val sales = {
    val df = Seq(
      ("1-URGENT", "F", 10L, "a"),
      ("1-URGENT", "O", 20L, "b"),
      ("2-HIGH", "F", 30L, "c"),
      ("2-HIGH", "F", 40L, "d"),
      ("2-HIGH", "P", 50L, "e"),
      ("3-LOW", "O", 60L, "f"))
      .toDF("prio", "status", "amount", "tag")
    df.createOrReplaceTempView("piv_sales")
    df
  }

  // ---------- the rewrite as a pure function (IN list: no session) ----------

  test("rewrite: static IN list expands to FILTER aggregates, no probe") {
    val got = PivotSqlSyntax.rewrite(
      "PIVOT t ON c IN ('a', 'b') USING sum(x) GROUP BY g ORDER BY g")
    assert(got ==
      "SELECT g\n, sum(x)\nFILTER (WHERE c = 'a') AS `a`, " +
        "sum(x)\nFILTER (WHERE c = 'b') AS `b`\nFROM t\nGROUP BY g\nORDER BY g")
  }

  test("rewrite: AS suffix names columns value_suffix") {
    val got = PivotSqlSyntax.rewrite(
      "PIVOT t ON c IN ('a') USING sum(x) AS total GROUP BY g")
    assert(got.contains("AS `a_total`"))
  }

  test("rewrite: native FROM-clause PIVOT/UNPIVOT pass through untouched") {
    val q1 = "SELECT * FROM t PIVOT (sum(x) FOR c IN ('a', 'b'))"
    assert(PivotSqlSyntax.rewrite(q1) == q1)
    val q2 = "SELECT * FROM t UNPIVOT (v FOR n IN (a, b))"
    assert(UnpivotSqlSyntax.rewrite(q2) == q2)
    val q3 = "SELECT pivot FROM t" // a column actually named pivot
    assert(PivotSqlSyntax.rewrite(q3) == q3)
    val lit = "SELECT 'PIVOT t ON c' AS s FROM t" // inside a string literal
    assert(PivotSqlSyntax.rewrite(lit) == lit)
  }

  test("rewrite: WITH prelude — statement body rewrites, native forms inside WITH pass through") {
    // the r12 prelude rule admits PIVOT/UNPIVOT exactly AT the prelude
    // end; Spark's native FROM-clause forms anywhere later in a WITH
    // statement must stay byte-identical (they also follow a close
    // paren, so the rule must not over-match)
    val n1 = "WITH c AS (SELECT 1 AS x) SELECT * FROM (SELECT * FROM t) PIVOT (sum(x) FOR p IN ('a'))"
    assert(PivotSqlSyntax.rewrite(n1) == n1)
    val n2 = "WITH c AS (SELECT 1 AS x) SELECT * FROM c UNPIVOT (v FOR n IN (x))"
    assert(UnpivotSqlSyntax.rewrite(n2) == n2)
    // a CTE literally named pivot is a name, not a statement body
    val n3 = "WITH pivot AS (SELECT 1 AS x) SELECT * FROM pivot"
    assert(PivotSqlSyntax.rewrite(n3) == n3)
    // statement-form body AFTER the prelude rewrites (and keeps the
    // prelude verbatim) — multi-CTE with a comment before the comma
    val s1 = "WITH a AS (SELECT 1 AS x) -- c\n, b AS (SELECT 2 AS y, 3 AS g) " +
      "PIVOT b ON y IN (2) USING count(*) GROUP BY g ORDER BY 1"
    val r1 = PivotSqlSyntax.rewrite(s1)
    assert(r1 != s1 &&
      r1.startsWith("WITH a AS (SELECT 1 AS x) -- c\n, b AS (SELECT 2 AS y, 3 AS g) ") &&
      r1.contains("FILTER"), r1)
  }

  test("rewrite failures: multi-agg, non-call USING, name collision, multi-ON") {
    val e1 = intercept[AnalysisException] {
      PivotSqlSyntax.rewrite("PIVOT t ON c IN ('a') USING sum(x), count(*) GROUP BY g")
    }
    assert(e1.getMessage.contains("one USING aggregate"))
    val e2 = intercept[AnalysisException] {
      PivotSqlSyntax.rewrite("PIVOT t ON c IN ('a') USING sum(x) + 1 GROUP BY g")
    }
    assert(e2.getMessage.contains("single aggregate call"))
    val e3 = intercept[AnalysisException] {
      PivotSqlSyntax.rewrite("PIVOT t ON c IN ('g') USING sum(x) GROUP BY g")
    }
    assert(e3.getMessage.contains("collides"))
    val e4 = intercept[AnalysisException] {
      PivotSqlSyntax.rewrite("PIVOT t ON a, b USING count(*) GROUP BY g")
    }
    assert(e4.getMessage.contains("multi-column ON"))
    val e5 = intercept[AnalysisException] {
      PivotSqlSyntax.rewrite("PIVOT t ON c IN ('a', 'A') USING count(*) GROUP BY g")
    }
    assert(e5.getMessage.contains("same column name"))
  }

  // ---------- executed semantics ----------

  test("dynamic pivot equals the hand-built DataFrame pivot") {
    sales
    val got = spark.sql(
      "PIVOT piv_sales ON status USING sum(amount) GROUP BY prio ORDER BY prio")
    val want = sales.groupBy("prio").pivot("status", Seq("F", "O", "P"))
      .agg(sum("amount")).orderBy("prio")
    assert(got.columns.toSeq == Seq("prio", "F", "O", "P"))
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("dynamic probe re-enumerates per parse; session scope pins; conf gates") {
    sales
    try {
      val q = "PIVOT piv_sales ON status USING count(*) GROUP BY prio ORDER BY prio"
      val before = spark.sql(q).columns.toSeq
      assert(!before.contains("Z"))
      // a new value lands AFTER the first parse: the DEFAULT parse-scoped
      // memo re-enumerates at the next parse, so incremental ingest
      // surfaces the new column — DuckDB rebinds PIVOT values at each
      // prepare too (advisor r10: the session-lifetime pin silently
      // omitted new values' columns forever)
      sales.union(Seq(("4-NONE", "Z", 1L, "z")).toDF("prio", "status", "amount", "tag"))
        .createOrReplaceTempView("piv_sales")
      val after = spark.sql(q).columns.toSeq
      assert(after.contains("Z"),
        s"re-parse after ingest kept the stale pivot schema: ${after.mkString(",")}")
      // legacy opt-in: session scope pins the first enumeration
      spark.conf.set("spark.graft.pivot.probeMemoScope", "session")
      val pinned = spark.sql(q).columns.toSeq
      sales.union(Seq(("5-NONE", "Y", 2L, "y")).toDF("prio", "status", "amount", "tag"))
        .createOrReplaceTempView("piv_sales")
      assert(spark.sql(q).columns.toSeq == pinned,
        "session-scoped memo should pin the first enumeration")
      spark.conf.unset("spark.graft.pivot.probeMemoScope")
      // conf kill-switch for production SQL
      spark.conf.set("spark.graft.pivot.dynamicProbe", "false")
      val e = intercept[AnalysisException](spark.sql(
        "PIVOT piv_sales ON status USING max(amount) GROUP BY prio"))
      assert(e.getMessage.contains("dynamicProbe"), e.getMessage)
      // the static IN form still works with probing disabled
      val still = spark.sql(
        "PIVOT piv_sales ON status IN ('F') USING count(*) GROUP BY prio")
      assert(still.columns.toSeq == Seq("prio", "F"))
    } finally {
      spark.conf.set("spark.graft.pivot.dynamicProbe", "true")
      spark.conf.unset("spark.graft.pivot.probeMemoScope")
      sales.createOrReplaceTempView("piv_sales") // restore for later tests
    }
  }

  test("IN subset restricts columns and skips absent values") {
    sales
    val got = spark.sql(
      "PIVOT piv_sales ON status IN ('F', 'X') USING count(*) GROUP BY prio ORDER BY prio")
    assert(got.columns.toSeq == Seq("prio", "F", "X"))
    val rows = got.collect()
    // count FILTER: absent value 'X' yields 0, not null
    assert(rows.forall(_.getLong(2) == 0L))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("1-URGENT", 1L), ("2-HIGH", 2L), ("3-LOW", 0L)))
  }

  test("implicit group-by uses every column not consumed by ON or USING") {
    sales
    // amount is consumed by USING, status by ON → group by (prio, tag)
    val got = spark.sql(
      "PIVOT (SELECT prio, status, amount FROM piv_sales WHERE tag <> 'd') " +
        "ON status USING sum(amount) ORDER BY prio")
    assert(got.columns.toSeq == Seq("prio", "F", "O", "P"))
    val urgent = got.filter($"prio" === "1-URGENT").collect()(0)
    assert(urgent.getLong(1) == 10L && urgent.getLong(2) == 20L && urgent.isNullAt(3))
  }

  test("unpivot statement melts and round-trips the pivot") {
    sales
    val wide = spark.sql(
      "PIVOT piv_sales ON status USING count(*) GROUP BY prio")
    wide.createOrReplaceTempView("piv_wide")
    val long = spark.sql(
      """UNPIVOT piv_wide ON "F", "O", "P" INTO NAME status VALUE n
        |ORDER BY prio, status""".stripMargin)
    assert(long.columns.toSeq == Seq("prio", "status", "n"))
    // count cells are never null → every (prio, status) combo survives
    assert(long.count() == 9)
    val back = long.groupBy("prio").pivot("status", Seq("F", "O", "P"))
      .agg(first("n")).orderBy("prio")
    assert(back.collect().toSeq == wide.orderBy("prio").collect().toSeq)
  }

  test("nested statement: UNPIVOT over a parenthesized PIVOT") {
    sales
    val got = spark.sql(
      """UNPIVOT (PIVOT piv_sales ON status USING count(*) GROUP BY prio)
        |ON "F", "O", "P" INTO NAME status VALUE n
        |ORDER BY prio, status""".stripMargin)
    assert(got.count() == 9)
    assert(got.collect()(0).getString(1) == "F")
  }

  test("unpivot failures: missing INTO, multi-value melt") {
    val e1 = intercept[AnalysisException] {
      UnpivotSqlSyntax.rewrite("UNPIVOT t ON a, b ORDER BY x")
    }
    assert(e1.getMessage.contains("INTO"))
    val e2 = intercept[AnalysisException] {
      UnpivotSqlSyntax.rewrite("UNPIVOT t ON a, b INTO NAME n VALUE v, w")
    }
    assert(e2.getMessage.contains("one VALUE column"))
  }
}
