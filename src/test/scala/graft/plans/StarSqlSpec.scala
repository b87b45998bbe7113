package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The star-modifier (`* EXCLUDE/REPLACE`) and FROM-first rewrites:
  * pure-lexical corners, executed semantics against hand-built
  * equivalents, pass-through guarantees, and loud failures. */
class StarSqlSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val t = {
    val df = Seq((1, "a", 10L), (2, "b", 20L), (3, "c", 30L))
      .toDF("id", "name", "v")
    df.createOrReplaceTempView("star_t")
    df
  }

  // ---------- EXCLUDE ----------

  test("EXCLUDE is the EXCEPT alias: schema drops the column") {
    t
    val got = spark.sql("SELECT * EXCLUDE (name) FROM star_t ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.count() == 3)
  }

  test("pure EXCLUDE rewrite is one word swap, no probe") {
    val got = StarSqlSyntax.rewrite("SELECT * EXCLUDE (a, b) FROM t")
    assert(got == "SELECT * EXCEPT (a, b) FROM t")
  }

  // ---------- REPLACE ----------

  test("REPLACE keeps position and name, expression applies") {
    t
    val got = spark.sql(
      "SELECT * REPLACE (v * 2 AS v) FROM star_t ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "name", "v"))
    assert(got.select("v").collect().map(_.getLong(0)).toSeq == Seq(20L, 40L, 60L))
  }

  test("EXCLUDE and REPLACE compose in one star group") {
    t
    val got = spark.sql(
      "SELECT * EXCLUDE (name) REPLACE (id + 100 AS id) FROM star_t ORDER BY v")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.collect().map(_.getInt(0)).toSeq == Seq(101, 102, 103))
  }

  test("pass-through: count(*), EXCEPT set-op, exclude as identifier") {
    val q1 = "SELECT count(*) FROM t"
    assert(StarSqlSyntax.rewrite(q1) == q1)
    val q2 = "SELECT a FROM t EXCEPT SELECT a FROM u"
    assert(StarSqlSyntax.rewrite(q2) == q2)
    val q3 = "SELECT exclude FROM t" // a column named exclude
    assert(StarSqlSyntax.rewrite(q3) == q3)
    val q4 = "SELECT replace(name, 'a', 'b') FROM t" // the function
    assert(StarSqlSyntax.rewrite(q4) == q4)
  }

  test("multiplication by replace()/a column named exclude is not a modifier") {
    // '*' after an identifier is the multiplication operator — the
    // word REPLACE that follows is the builtin function, not the
    // star modifier (advisor r9 finding: this used to fail loudly)
    val q1 = "SELECT id * replace(name, 'a', '1') FROM t"
    assert(StarSqlSyntax.rewrite(q1) == q1)
    val q2 = "SELECT v * exclude (x) FROM t" // exclude as a UDF name
    assert(StarSqlSyntax.rewrite(q2) == q2)
    // and it EXECUTES: replace on a numeric-string column
    t
    val got = spark.sql(
      "SELECT id * cast(replace(name, 'a', '5') AS INT) AS p " +
        "FROM star_t WHERE name = 'a'").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(5))
    // select-list position still triggers after a comma
    val q3 = StarSqlSyntax.rewrite("SELECT id, * EXCLUDE (name) FROM t")
    assert(q3 == "SELECT id, * EXCEPT (name) FROM t")
    // ... and after DISTINCT
    val q4 = StarSqlSyntax.rewrite("SELECT DISTINCT * EXCLUDE (name) FROM t")
    assert(q4 == "SELECT DISTINCT * EXCEPT (name) FROM t")
  }

  test("comments and hints between SELECT and '*' do not defeat the modifier") {
    t
    // a hint IS a block comment: the backward scan must skip it and
    // still see SELECT (advisor r10: the raw charAt walk read the hint
    // text and let the modifier pass through unrewritten)
    val got = spark.sql(
      "SELECT /*+ BROADCAST(star_t) */ * EXCLUDE (name) FROM star_t ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "v"))
    val got2 = spark.sql(
      "SELECT -- project all but v\n * EXCLUDE (v) FROM star_t ORDER BY id")
    assert(got2.columns.toSeq == Seq("id", "name"))
    // REPLACE path (schema expansion) through a hint too
    val got3 = spark.sql(
      "SELECT /*+ REPARTITION(1) */ * REPLACE (v * 2 AS v) FROM star_t ORDER BY id")
    assert(got3.columns.toSeq == Seq("id", "name", "v"))
    assert(got3.select("v").collect().map(_.getLong(0)).toSeq == Seq(20L, 40L, 60L))
    // arithmetic stays arithmetic even with a comment before the '*'
    val arith = "SELECT id /*c*/ * replace(name, 'a', 'b') FROM t"
    assert(StarSqlSyntax.rewrite(arith) == arith)
  }

  test("loud failures: unknown column, no AS, qualified star untouched") {
    t
    // pure EXCLUDE delegates to * EXCEPT, so Spark's own analyzer is
    // the binder: unresolved-column failure, loud by construction
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT * EXCLUDE (nope) FROM star_t").collect()
    }
    assert(e1.getMessage.contains("nope"))
    // REPLACE + EXCLUDE takes the schema-probe path: our binder check
    val e1b = intercept[AnalysisException] {
      spark.sql("SELECT * EXCLUDE (nope) REPLACE (v AS v) FROM star_t").collect()
    }
    assert(e1b.getMessage.contains("not found"))
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT * REPLACE (v * 2) FROM star_t").collect()
    }
    assert(e2.getMessage.contains("AS"))
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT * REPLACE (0 AS nope) FROM star_t").collect()
    }
    assert(e3.getMessage.contains("not found"))
  }

  // ---------- FROM-first ----------

  test("FROM t SELECT list reorders; bare FROM gains SELECT *") {
    t
    val got = spark.sql(
      "FROM star_t SELECT id, v WHERE v >= 20 ORDER BY id")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.count() == 2)
    val bare = spark.sql("FROM star_t WHERE id = 2")
    assert(bare.columns.toSeq == Seq("id", "name", "v"))
    assert(bare.count() == 1)
  }

  test("FROM-first composes with star modifiers") {
    t
    val got = spark.sql("FROM star_t SELECT * EXCLUDE (name) ORDER BY id LIMIT 2")
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.count() == 2)
  }

  test("FROM-first rewrite is positional: mid-query FROM untouched") {
    val q = "SELECT a FROM t WHERE x IN (SELECT y FROM u)"
    assert(FromFirstSqlSyntax.rewrite(q) == q)
  }

  test("FROM-first after a WITH prelude (DuckDB-legal, r12)") {
    t
    // SELECT form and bare form, prelude verbatim in both
    val got = spark.sql(
      "WITH w AS (SELECT id, v * 2 AS v2 FROM star_t) FROM w SELECT v2 ORDER BY v2")
    assert(got.columns.toSeq == Seq("v2") && got.count() == 3)
    val bare = spark.sql(
      "WITH w AS (SELECT id FROM star_t WHERE id <= 2) FROM w ORDER BY id")
    assert(bare.columns.toSeq == Seq("id") && bare.count() == 2)
    // a regular statement after a prelude is untouched (its FROM is
    // mid-query, not at the prelude end)
    val q = "WITH w AS (SELECT 1 AS x) SELECT x FROM w"
    assert(FromFirstSqlSyntax.rewrite(q) == q)
  }
}
