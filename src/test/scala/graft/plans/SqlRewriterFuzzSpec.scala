package graft.plans

import graft.SparkFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz for the seven lexical SQL-grammar extensions (r10
  * verdict #4): the o28 adversarial gate caught a REAL rewriter bug
  * (trailing `--` comments swallowed injected syntax) on its first run,
  * which is evidence this class of input finds more. Two properties,
  * ≥500 deterministic seeds total:
  *
  *   1. PASS-THROUGH: a statement whose extension keywords appear ONLY
  *      inside string literals, line/block comments, and quoted
  *      identifiers must come out of the full seven-rewriter channel
  *      BYTE-IDENTICAL — no rewriter may read non-code text as syntax.
  *
  *   2. DECORATION INVARIANCE (self-differential): a statement that
  *      genuinely uses an extension, decorated at random token
  *      boundaries with keyword-bearing comments, hostile literals and
  *      a trailing no-newline `--` comment, must EXECUTE to the same
  *      rows as its undecorated twin. This is exactly the property the
  *      o28 bug violated. No oracle engine needed: the plain statement
  *      is its own reference.
  *
  * Seeds are fixed (CI-deterministic, offline classpath only). */
class SqlRewriterFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def rewriteAll(sql: String): String =
    QualifySqlSyntax.rewrite(
      DistinctOnSqlSyntax.rewrite(GraftSqlParser.rewrite(
        StarSqlSyntax.rewrite(FromFirstSqlSyntax.rewrite(
          UnpivotSqlSyntax.rewrite(PivotSqlSyntax.rewrite(sql)))))))

  // every trigger word of the seven extensions, plus near-miss noise
  // (incl. the GROUP BY ALL / ORDER BY ALL forms the rewriters must
  // step over — P5)
  private val Keywords = Seq("QUALIFY", "ASOF", "ASOF JOIN", "EXCLUDE",
    "REPLACE", "PIVOT", "UNPIVOT", "DISTINCT ON", "FROM", "SELECT",
    "USING", "ON", "* EXCLUDE (x)", "PIVOT t ON c USING sum(x)",
    "FROM t SELECT", "QUALIFY row_number() OVER ()",
    "ALL", "GROUP BY ALL", "ORDER BY ALL", "ORDER BY ALL DESC")

  private val genSoup: Gen[String] = for {
    n <- Gen.choose(1, 4)
    ws <- Gen.listOfN(n, Gen.oneOf(Keywords))
    sep <- Gen.oneOf(" ", ", ", " - ")
  } yield ws.mkString(sep)

  // decorations legal BETWEEN tokens of a statement
  private def genDecor(trailing: Boolean): Gen[String] = {
    val block = genSoup.map(s => s"/* ${s.replace("*/", "")} */")
    val line = genSoup.map(s => s"-- ${s.replace("\n", " ")}\n")
    val lineNoNl = genSoup.map(s => s"-- ${s.replace("\n", " ")}")
    if (trailing) Gen.oneOf(block, line, lineNoNl) else Gen.oneOf(block, line)
  }

  private val genLit: Gen[String] =
    genSoup.map(s => "'" + s.replace("'", "''") + " it''s '")

  private lazy val views: Unit = {
    Seq((1L, 100L, "A"), (2L, 50L, "A"), (3L, 200L, "B"),
      (4L, 150L, "B"), (5L, 75L, "C"), (6L, 300L, "C"))
      .toDF("o_orderkey", "o_totalprice", "o_prio")
      .createOrReplaceTempView("fuzz_t")
    // a column literally named `exclude` — the quoted-identifier trap
    Seq((1L, "x"), (2L, "y")).toDF("id", "exclude")
      .createOrReplaceTempView("fuzz_q")
    Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 15L, 3L))
      .toDF("k", "t", "v").createOrReplaceTempView("fuzz_e1")
    Seq((1L, 9L, 7L), (1L, 19L, 8L), (2L, 1L, 9L))
      .toDF("k", "t2", "w").createOrReplaceTempView("fuzz_e2")
  }

  test("P1: keywords in literals/comments/quoted identifiers pass through byte-identical (300 seeds)") {
    views
    val gen = for {
      lit <- genLit
      c1 <- genDecor(trailing = false)
      c2 <- genDecor(trailing = false)
      tail <- genDecor(trailing = true)
      qid <- Gen.oneOf("`exclude`", "\"exclude\"")
      whereLit <- genLit
      // half the statements open with a WITH prelude (r12: the prelude
      // rule admits PIVOT/UNPIVOT/FROM bodies at its end — a decorated
      // prelude followed by a REGULAR statement must never trip it)
      prelude <- Gen.oneOf("", "WITH w AS ( SELECT 1 AS one ) ")
    } yield s"${prelude}SELECT $c1 id, $qid, $lit AS s $c2 FROM fuzz_q " +
      s"WHERE $whereLit <> 'zz' ORDER BY id $tail"
    val stmts = samples(gen, 300, 0xF0221L)
    assert(stmts.size >= 290, s"generator drought: ${stmts.size}")
    stmts.foreach { sql =>
      val out = rewriteAll(sql)
      assert(out == sql,
        s"pass-through statement was rewritten:\nIN : $sql\nOUT: $out")
    }
    // and a sampled subset actually EXECUTES unchanged through the channel
    stmts.take(10).foreach { sql =>
      val rows = spark.sql(sql).collect()
      assert(rows.length == 2, sql)
    }
  }

  /** Insert decorations at random inter-token positions of `core`,
    * replace the `§` placeholder with a hostile literal, and append a
    * trailing comment. Tokens are split on single spaces — cores are
    * written one-token-per-space so every boundary is legal. */
  private def decorate(core: String, seed: Long): Gen[String] = for {
    lit <- genLit
    nIns <- Gen.choose(1, 3)
    toks = core.replace("§", lit).split(" ").toVector
    poss <- Gen.listOfN(nIns, Gen.choose(1, toks.size - 1))
    decs <- Gen.listOfN(nIns, genDecor(trailing = false))
    tail <- genDecor(trailing = true)
  } yield {
    val ins = poss.zip(decs).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val body = toks.zipWithIndex.map { case (t, i) =>
      ins.getOrElse(i, Nil).mkString(" ") match {
        case "" => t
        case d  => s"$d $t"
      }
    }.mkString(" ")
    s"$body $tail"
  }

  // each core uses one extension for real; `§` marks a literal slot.
  // written one-token-per-space so decorate() can split safely.
  private val Cores = Seq(
    "qualify" -> ("SELECT o_orderkey, o_totalprice, § AS tag FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC, o_orderkey) <= 1 " +
      "ORDER BY o_orderkey"),
    "from_first" -> ("FROM fuzz_t SELECT o_orderkey, § AS tag " +
      "WHERE o_totalprice > 60 ORDER BY o_orderkey"),
    "star_exclude" -> "SELECT * EXCLUDE (o_prio) FROM fuzz_t WHERE § <> 'zz' ORDER BY o_orderkey",
    "star_replace" -> ("SELECT * REPLACE (o_totalprice * 2 AS o_totalprice) " +
      "FROM fuzz_t WHERE § <> 'zz' ORDER BY o_orderkey"),
    // o_totalprice is a HIDDEN sort key (not projected) — the helper-
    // column materialization must resolve it (r11). Commas in the
    // select list and ORDER BY are STANDALONE tokens so the decorator
    // can land a line comment between a modifier and the following
    // comma — the position the r11 advisor's comment-swallow bug hid in
    "distinct_on" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey"),
    "pivot_static" -> ("PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY o_orderkey"),
    "asof_join" -> ("SELECT fuzz_e1.k, fuzz_e1.t, w, § AS tag FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "ORDER BY fuzz_e1.k, fuzz_e1.t"),
    // statement-form UNPIVOT over a pivoted subquery (both rewriters in
    // one text), and the DYNAMIC pivot (probe path) without IN
    "unpivot" -> ("UNPIVOT (PIVOT fuzz_t ON o_prio IN ('A', 'B') USING count(*) " +
      "GROUP BY o_orderkey) ON \"A\", \"B\" INTO NAME prio VALUE n " +
      "ORDER BY o_orderkey, prio"),
    "pivot_dynamic" -> ("PIVOT fuzz_t ON o_prio USING sum(o_orderkey) " +
      "GROUP BY o_totalprice ORDER BY o_totalprice"))

  test("P2: decorated extension statements execute identically to their plain twins (270 seeds)") {
    views
    Cores.foreach { case (name, core) =>
      val plain = spark.sql(core.replace("§", "'p'")).collect()
        .map(_.toSeq.toList).toList
      assert(plain.nonEmpty, s"$name: empty plain result")
      samples(decorate(core, 0), 30, 0xF0222L + name.hashCode).zipWithIndex
        .foreach { case (sql, i) =>
          val got =
            try spark.sql(sql).collect().map(_.toSeq.toList).toList
            catch {
              case e: Throwable =>
                fail(s"$name seed $i failed to execute:\n$sql\n${e.getMessage}")
            }
          // the literal slot differs between plain and decorated; compare
          // with the tag column masked (it is always the LAST projected
          // literal only in cores that carry §; row counts always match)
          assert(got.length == plain.length,
            s"$name seed $i row count ${got.length} != ${plain.length}:\n$sql")
          got.zip(plain).foreach { case (g, p) =>
            val (gm, pm) = (mask(g), mask(p))
            assert(gm == pm, s"$name seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
          }
        }
    }
  }

  // ----- P3: multi-extension COMPOSITIONS (r11 verdict #3) -----
  // Real queries nest the extensions; each rewriter sees the others'
  // keywords as ordinary text it must step over. Every core below uses
  // 2–3 extensions AT ONCE (channel order: PIVOT → UNPIVOT → FROM-first
  // → star → ASOF → DISTINCT ON → QUALIFY), written one-token-per-space
  // so decorate() can land hostile comments on any boundary — including
  // BETWEEN the keywords of two different extensions.
  private val ComposedCores = Seq(
    // PIVOT statement over a QUALIFY'd CTE: the PIVOT scanner must not
    // treat the CTE body as the pivot table, and QUALIFY must rewrite
    // inside the emitted aggregate's source text
    "pivot_cte_qualify" -> ("WITH c AS ( SELECT o_orderkey , o_prio , o_totalprice , § AS tag " +
      "FROM fuzz_t QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 2 ) " +
      "PIVOT c ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY o_orderkey"),
    // DISTINCT ON over an ASOF join, hidden sort key from the RIGHT side
    "distinct_on_asof" -> ("SELECT DISTINCT ON (fuzz_e1.k) fuzz_e1.k , w , § AS tag " +
      "FROM fuzz_e1 ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "ORDER BY fuzz_e1.k , fuzz_e1.t DESC"),
    // FROM-first + star EXCLUDE
    "from_first_exclude" -> ("FROM fuzz_t SELECT * EXCLUDE (o_prio) " +
      "WHERE o_totalprice > 60 ORDER BY o_orderkey"),
    // TRIPLE: FROM-first + star REPLACE + QUALIFY
    "from_first_replace_qualify" -> ("FROM fuzz_t SELECT * REPLACE (o_totalprice * 2 AS o_totalprice) " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY o_orderkey"),
    // TRIPLE: UNPIVOT over PIVOT over a QUALIFY'd subquery
    "unpivot_pivot_qualify" -> ("UNPIVOT (PIVOT ( SELECT o_orderkey , o_prio , o_totalprice FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 2 ) " +
      "ON o_prio IN ('A', 'B') USING count(*) GROUP BY o_orderkey) " +
      "ON \"A\", \"B\" INTO NAME prio VALUE n ORDER BY o_orderkey , prio"),
    // DISTINCT ON + star EXCLUDE where the EXCLUDED column is also the
    // HIDDEN sort key (star expansion and helper-column materialization
    // must not fight over it)
    "distinct_on_exclude_hidden" -> ("SELECT DISTINCT ON (o_prio) * EXCLUDE (o_totalprice) " +
      "FROM fuzz_t WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey"),
    // ASOF join + QUALIFY over the joined shape
    "asof_qualify" -> ("SELECT fuzz_e1.k , fuzz_e1.t , w , § AS tag " +
      "FROM fuzz_e1 ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "QUALIFY row_number() OVER (PARTITION BY fuzz_e1.k ORDER BY fuzz_e1.t DESC) <= 1 " +
      "ORDER BY fuzz_e1.k"),
    // FROM-first + DISTINCT ON with a hidden sort key
    "from_first_distinct_on" -> ("FROM fuzz_t SELECT DISTINCT ON (o_prio) o_prio , o_orderkey " +
      "WHERE o_totalprice > 40 ORDER BY o_prio , o_totalprice DESC , o_orderkey"),
    // star EXCLUDE + QUALIFY in one block
    "star_exclude_qualify" -> ("SELECT * EXCLUDE (o_prio) , § AS tag FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY o_orderkey"),
    // FROM-first body AFTER a WITH prelude (the r12 prelude rule on a
    // third rewriter), composed with star EXCLUDE
    "with_from_first_exclude" -> ("WITH w AS ( SELECT o_orderkey , o_prio , o_totalprice " +
      "FROM fuzz_t WHERE o_totalprice > 40 ) " +
      "FROM w SELECT * EXCLUDE (o_prio) WHERE o_totalprice > 60 ORDER BY o_orderkey"))

  test("P3: multi-extension compositions execute identically to their plain twins (600 seeds)") {
    views
    ComposedCores.foreach { case (name, core) =>
      val plain = spark.sql(core.replace("§", "'p'")).collect()
        .map(_.toSeq.toList).toList
      assert(plain.nonEmpty, s"$name: empty plain result")
      samples(decorate(core, 0), 60, 0xF0223L + name.hashCode).zipWithIndex
        .foreach { case (sql, i) =>
          val got =
            try spark.sql(sql).collect().map(_.toSeq.toList).toList
            catch {
              case e: Throwable =>
                fail(s"$name seed $i failed to execute:\n$sql\n${e.getMessage}")
            }
          assert(got.length == plain.length,
            s"$name seed $i row count ${got.length} != ${plain.length}:\n$sql")
          got.zip(plain).foreach { case (g, p) =>
            val (gm, pm) = (mask(g), mask(p))
            assert(gm == pm, s"$name seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
          }
        }
    }
  }

  /** Drop string-typed cells (the hostile-literal tag column varies by
    * construction); every numeric/key cell must match exactly. */
  private def mask(row: List[Any]): List[Any] =
    row.filterNot(_.isInstanceOf[String])

  // ----- P4: WITH-prelude × statement-body, ALL seven extensions -----
  // (r12 verdict #5). r12 found the prelude rule broken for ONE body
  // (statement PIVOT after WITH) and ONE prelude content (FROM-first at
  // its end); this corpus runs the full cross product: every extension
  // in CTE-BODY position × every extension in the statement body after
  // the prelude, decorated with keyword-bearing comments at random
  // boundaries. Every prelude yields the same (o_orderkey, o_prio,
  // o_totalprice) shape so every body composes with every prelude.
  private val PreludeCtes = Seq(
    "plain" -> "WITH c AS ( SELECT o_orderkey , o_prio , o_totalprice FROM fuzz_t )",
    "qualify" -> ("WITH c AS ( SELECT o_orderkey , o_prio , o_totalprice FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 2 )"),
    "from_first" -> ("WITH c AS ( FROM fuzz_t SELECT o_orderkey , o_prio , o_totalprice " +
      "WHERE o_totalprice > 40 )"),
    "star_exclude" -> "WITH c AS ( SELECT * EXCLUDE (o_totalprice) , o_totalprice FROM fuzz_t )",
    "star_replace" -> "WITH c AS ( SELECT * REPLACE (o_totalprice + 1 AS o_totalprice) FROM fuzz_t )",
    "distinct_on" -> ("WITH c AS ( SELECT DISTINCT ON (o_prio) o_prio , o_orderkey , o_totalprice " +
      "FROM fuzz_t ORDER BY o_prio , o_totalprice DESC , o_orderkey )"),
    // statement-form PIVOT (wrapped back to the 3-column shape by the
    // statement-form UNPIVOT) as the CTE body itself
    "pivot_unpivot" -> ("WITH c AS ( UNPIVOT (PIVOT fuzz_t ON o_prio IN ('A', 'B') " +
      "USING sum(o_totalprice) GROUP BY o_orderkey) " +
      "ON \"A\", \"B\" INTO NAME o_prio VALUE o_totalprice ) "),
    "asof" -> ("WITH c AS ( SELECT fuzz_e1.k AS o_orderkey , 'A' AS o_prio , w AS o_totalprice " +
      "FROM fuzz_e1 ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t )"),
    // a star REPLACE inside the SECOND CTE referencing the FIRST: the
    // bind-time schema probe must put only the PRIOR complete CTEs in
    // scope (the r13 P4 find's general form)
    "cte_chain_replace" -> ("WITH a AS ( SELECT o_orderkey , o_prio , o_totalprice FROM fuzz_t ) , " +
      "c AS ( SELECT * REPLACE (o_totalprice + 0 AS o_totalprice) FROM a )"))

  private val BodyCores = Seq(
    "qualify" -> ("SELECT o_prio , o_orderkey , o_totalprice , § AS tag FROM c " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY o_prio , o_orderkey"),
    "from_first" -> ("FROM c SELECT o_orderkey , § AS tag WHERE o_totalprice > 0 " +
      "ORDER BY o_orderkey"),
    "star_exclude" -> ("SELECT * EXCLUDE (o_prio) FROM c WHERE § <> 'zz' " +
      "ORDER BY o_orderkey , o_totalprice"),
    "star_replace" -> ("SELECT * REPLACE (o_totalprice * 2 AS o_totalprice) FROM c " +
      "WHERE § <> 'zz' ORDER BY o_orderkey , o_totalprice"),
    "distinct_on" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM c " +
      "WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey"),
    "pivot" -> ("PIVOT c ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY o_orderkey"),
    "unpivot" -> ("UNPIVOT (PIVOT c ON o_prio IN ('A', 'B') USING count(*) GROUP BY o_orderkey) " +
      "ON \"A\", \"B\" INTO NAME prio VALUE n ORDER BY o_orderkey , prio"),
    "asof" -> ("SELECT fuzz_e1.k , fuzz_e1.t , w , § AS tag FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "WHERE fuzz_e1.k <= ( SELECT max(o_orderkey) FROM c ) " +
      "ORDER BY fuzz_e1.k , fuzz_e1.t"),
    // the P5 ALL forms in statement-body position after every prelude
    // (P4 x P5 cross): star EXCLUDE + GROUP BY ALL + ORDER BY ALL over
    // the prelude CTE
    "gba_all" -> ("SELECT * EXCLUDE (o_orderkey , o_totalprice) , count(*) AS n , § AS tag " +
      "FROM c GROUP BY ALL ORDER BY ALL"))

  // ----- P5: GROUP BY ALL / ORDER BY ALL × every extension -----
  // Spark 4 and DuckDB both support the ALL forms natively; the hazard
  // is each lexical rewriter seeing the bare word ALL where it expects
  // an expression list. The probe round found two real cases: DISTINCT
  // ON treated ALL as a sort EXPRESSION (unresolved-column garbage →
  // now expanded to the select list's value expressions, DuckDB
  // semantics, modifiers distributed), and statement PIVOT let GROUP BY
  // ALL through to a baffling analysis error (DuckDB's parser rejects
  // it → now refused loudly at rewrite time). These cores pin the whole
  // matrix under decoration.
  private val AllCores = Seq(
    "gba_exclude" -> ("SELECT * EXCLUDE (o_orderkey , o_totalprice) , sum(o_totalprice) AS s , § AS tag " +
      "FROM fuzz_t GROUP BY ALL ORDER BY ALL"),
    "gba_replace" -> ("SELECT * REPLACE (o_totalprice * 0 AS o_totalprice) FROM fuzz_t " +
      "WHERE § <> 'zz' GROUP BY ALL ORDER BY ALL"),
    "gba_from_first" -> ("FROM fuzz_t SELECT o_prio , sum(o_totalprice) AS s , § AS tag " +
      "WHERE o_totalprice > 40 GROUP BY ALL ORDER BY ALL"),
    // (GROUP BY ALL + QUALIFY is NOT here: the wrap's injected predicate
    // column would change what ALL groups by, so the combination is
    // refused loudly — DuckDB parity; asserted below with the other
    // refusals. The explicit-GROUP-BY twin composes fine:)
    "gb_qualify" -> ("SELECT o_prio , sum(o_totalprice) AS s , § AS tag FROM fuzz_t GROUP BY o_prio " +
      "QUALIFY row_number() OVER (ORDER BY sum(o_totalprice) DESC) <= 2 ORDER BY ALL"),
    "oba_qualify" -> ("SELECT o_orderkey , o_prio , o_totalprice FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC) <= 1 ORDER BY ALL"),
    "oba_distinct_on" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY ALL"),
    "oba_distinct_on_desc" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY ALL DESC"),
    // aliased + computed select items: ALL must sort by the VALUE
    // expressions (aliases stripped), not the alias words
    "oba_distinct_on_alias" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_totalprice * 2 AS dbl , " +
      "o_orderkey AS k FROM fuzz_t ORDER BY ALL"),
    "gba_asof" -> ("SELECT fuzz_e1.k , sum(w) AS sw , § AS tag FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "GROUP BY ALL ORDER BY ALL"),
    "oba_pivot" -> ("PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY ALL"))

  test("P5: GROUP BY ALL / ORDER BY ALL compose with every extension (300 seeds)") {
    views
    AllCores.foreach { case (name, core) =>
      val plain = spark.sql(core.replace("§", "'p'")).collect()
        .map(_.toSeq.toList).toList
      assert(plain.nonEmpty, s"$name: empty plain result")
      samples(decorate(core, 0), 30, 0xF0225L + name.hashCode).zipWithIndex
        .foreach { case (sql, i) =>
          val got =
            try spark.sql(sql).collect().map(_.toSeq.toList).toList
            catch {
              case e: Throwable =>
                fail(s"$name seed $i failed to execute:\n$sql\n${e.getMessage}")
            }
          assert(got.length == plain.length,
            s"$name seed $i row count ${got.length} != ${plain.length}:\n$sql")
          got.zip(plain).foreach { case (g, p) =>
            assert(mask(g) == mask(p), s"$name seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
          }
        }
    }
    // the matrix's two loud refusals stay loud under decoration
    val gbaPivot = "PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY ALL ORDER BY o_orderkey"
    samples(decorate(gbaPivot, 0), 5, 0xF0226L).foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("GROUP BY ALL is not supported in a PIVOT"), sql)
    }
    val starAll = "SELECT DISTINCT ON (o_prio) * FROM fuzz_t ORDER BY ALL"
    val e2 = intercept[Exception](spark.sql(starAll).collect())
    assert(e2.getMessage.contains("cannot expand a star select item"), e2.getMessage)
    val gbaQualify = "SELECT o_prio , sum(o_totalprice) AS s FROM fuzz_t GROUP BY ALL " +
      "QUALIFY row_number() OVER (ORDER BY sum(o_totalprice) DESC) <= 2 ORDER BY ALL"
    samples(decorate(gbaQualify, 0), 5, 0xF0227L).foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("QUALIFY with GROUP BY ALL is not supported"), sql)
    }
  }

  // ----- P6: ordinal references and WITH RECURSIVE (r13 verdict #6) -----
  // `GROUP BY 1` / `ORDER BY 2` ordinals are positions into the select
  // list — the exact thing a rewriter that reorders or injects select
  // items can silently break (the DISTINCT ON key `1` used to become
  // `PARTITION BY 1`, a CONSTANT — one global row instead of one per
  // key). RECURSIVE preludes exercise the withWalk prelude rule and the
  // bind probes' verbatim prefix replay. Every core is DuckDB-legal
  // (judge-probed) and self-differential like P2/P3.
  private val OrdinalCores = Seq(
    // DISTINCT ON key as an ordinal: 1 = o_prio (the silent-wrong pin)
    "don_key_ordinal" -> ("SELECT DISTINCT ON (1) o_prio , o_orderkey FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey"),
    // ordinal sort keys under DISTINCT ON — 2 names the VALUE k*2, not
    // a constant inside the injected OVER()
    "don_order_ordinal" -> ("SELECT DISTINCT ON (o_prio) o_prio , o_totalprice * 2 AS d " +
      "FROM fuzz_t WHERE § <> 'zz' ORDER BY 1 , 2 DESC , o_orderkey"),
    // both at once, with a hidden non-ordinal key in the middle
    "don_both_ordinal" -> ("SELECT DISTINCT ON (1) o_prio , o_orderkey FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY 1 , o_totalprice DESC , 2"),
    // QUALIFY with GROUP BY ordinal (inner list gains the injected
    // predicate column at the END — position 1 must stay o_prio)
    "qualify_group_ordinal" -> ("SELECT o_prio , sum(o_totalprice) AS s FROM fuzz_t " +
      "GROUP BY 1 QUALIFY row_number() OVER (ORDER BY sum(o_totalprice) DESC) <= 2 " +
      "ORDER BY 1"),
    // QUALIFY with ordinal outer sort (outer * EXCEPT list keeps order)
    "qualify_order_ordinal" -> ("SELECT o_orderkey , o_totalprice , § AS tag FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY 2 DESC , 1"),
    // FROM-first with ordinals (clause move must not renumber)
    "from_first_ordinal" -> ("FROM fuzz_t SELECT o_orderkey , o_prio , § AS tag " +
      "WHERE o_totalprice > 60 ORDER BY 2 , 1 DESC"),
    // star EXCLUDE with ordinals: 2 = the POST-exclusion second column
    // (o_totalprice), both engines
    "star_exclude_ordinal" -> ("SELECT * EXCLUDE (o_prio) FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY 2 DESC , 1"),
    // star REPLACE with ordinals: 2 still names o_totalprice, replaced
    "star_replace_ordinal" -> ("SELECT * REPLACE (o_totalprice * 2 AS o_totalprice) " +
      "FROM fuzz_t WHERE § <> 'zz' ORDER BY 2 DESC , 1"),
    // ASOF join + ordinal sort
    "asof_ordinal" -> ("SELECT fuzz_e1.k , fuzz_e1.t , w , § AS tag FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "ORDER BY 1 , 2"),
    // PIVOT tail ORDER BY ordinal: 1 = the first group key of the
    // emitted aggregate (same position DuckDB's pivot output has)
    "pivot_order_ordinal" -> ("PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY 1"),
    // QUALIFY whose ORDER BY mixes a table-QUALIFIED item (helper
    // materialization path) with an ordinal item (stays positional
    // against the outer * EXCEPT list) — the two mechanisms in one sort
    "qualify_mixed_ordinal" -> ("SELECT fuzz_e1.k , w , § AS tag FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "QUALIFY row_number() OVER (PARTITION BY fuzz_e1.k ORDER BY fuzz_e1.t DESC) <= 1 " +
      "ORDER BY fuzz_e1.k , 2 DESC"))

  // RECURSIVE preludes × extension bodies: the prelude walker skips the
  // RECURSIVE keyword, and the star/pivot bind probes replay the prefix
  // VERBATIM (so the probe statement stays recursive). rgen = 1..4.
  private val RecursivePrelude =
    "WITH RECURSIVE rgen AS ( SELECT 1 AS n UNION ALL SELECT n + 1 FROM rgen WHERE n < 4 ) "
  private val RecursiveBodies = Seq(
    "rec_distinct_on" -> ("SELECT DISTINCT ON (n % 2) n % 2 AS par , n , § AS tag " +
      "FROM rgen ORDER BY par , n DESC"),
    "rec_qualify" -> ("SELECT n , § AS tag FROM rgen " +
      "QUALIFY row_number() OVER (ORDER BY n DESC) <= 2 ORDER BY 1"),
    "rec_star_replace" -> "SELECT * REPLACE (n * 10 AS n) FROM rgen ORDER BY 1",
    "rec_star_exclude_join" -> ("SELECT * EXCLUDE (o_prio) FROM fuzz_t " +
      "WHERE o_orderkey IN ( SELECT n FROM rgen ) ORDER BY 1"),
    "rec_from_first" -> "FROM rgen SELECT n , § AS tag WHERE n > 1 ORDER BY 1",
    "rec_pivot" -> ("PIVOT ( SELECT n , n % 2 AS par FROM rgen ) ON par IN (0, 1) " +
      "USING count(*) GROUP BY n ORDER BY n"),
    "rec_second_cte" -> (", big AS ( SELECT n FROM rgen WHERE n > 2 ) " +
      "SELECT DISTINCT ON (1) n % 2 , n FROM big ORDER BY 1 , 2 DESC"))

  test("P6: ordinal refs and WITH RECURSIVE preludes compose with every extension (540 seeds)") {
    views
    (OrdinalCores ++ RecursiveBodies.map { case (n, b) =>
      n -> (if (n == "rec_second_cte") RecursivePrelude.trim + b
            else RecursivePrelude + b)
    }).foreach { case (name, core) =>
      val plain = spark.sql(core.replace("§", "'p'")).collect()
        .map(_.toSeq.toList).toList
      assert(plain.nonEmpty, s"$name: empty plain result\n$core")
      samples(decorate(core, 0), 30, 0xF0228L + name.hashCode).zipWithIndex
        .foreach { case (sql, i) =>
          val got =
            try spark.sql(sql).collect().map(_.toSeq.toList).toList
            catch {
              case e: Throwable =>
                fail(s"$name seed $i failed to execute:\n$sql\n${e.getMessage}")
            }
          assert(got.length == plain.length,
            s"$name seed $i row count ${got.length} != ${plain.length}:\n$sql")
          got.zip(plain).foreach { case (g, p) =>
            assert(mask(g) == mask(p), s"$name seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
          }
        }
    }
    // DISTINCT ON ordinal semantics pin: ORDER BY 2 DESC over an
    // ALIASED computed item sorts by the VALUE (k*2), DuckDB-probed —
    // per prio the kept row is the max-price one, not an arbitrary pick
    val don = spark.sql("SELECT DISTINCT ON (o_prio) o_prio, o_totalprice * 2 AS d " +
      "FROM fuzz_t ORDER BY 1, 2 DESC").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(don.toSeq == Seq(("A", 200L), ("B", 400L), ("C", 600L)), don.toSeq)
    // loud refusals, pinned under decoration
    val pivotOrdinal = "PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY 1 ORDER BY o_orderkey"
    samples(decorate(pivotOrdinal, 0), 5, 0xF0229L).foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("positional GROUP BY is not supported in a PIVOT"), sql)
    }
    val outOfRange = "SELECT DISTINCT ON (o_prio) o_prio, o_orderkey FROM fuzz_t " +
      "ORDER BY 1, 9"
    val e2 = intercept[Exception](spark.sql(outOfRange).collect())
    assert(e2.getMessage.contains("ordinal 9 out of range"), e2.getMessage)
    val starOrd = "SELECT DISTINCT ON (1) * FROM fuzz_t ORDER BY o_prio, o_totalprice DESC"
    val e3 = intercept[Exception](spark.sql(starOrd).collect())
    assert(e3.getMessage.contains("star select item"), e3.getMessage)
  }

  // ----- P7: set-operation compound bodies (r14 verdict #5) -----
  // UNION / UNION ALL / EXCEPT / INTERSECT between a decorated extension
  // statement and a plain select is DuckDB-legal and the one statement
  // SHAPE the rewriters' span-scanners had never been fuzzed against —
  // they assumed one SELECT spine, so a second top-level SELECT after
  // UNION was exactly the o33/o39-class lexical hazard. Inspection
  // found it before the fuzz did: a FIRST-arm DISTINCT ON wrapped the
  // ENTIRE compound inside its subquery (silent wrong rows when arm
  // arities line up), and a LAST-arm one consumed the compound-level
  // ORDER BY into helper columns the compound's output doesn't carry.
  // Both now refuse loudly (an unparenthesized arm can never own the
  // trailing ORDER BY — DuckDB-probed); FROM-first and statement
  // PIVOT/UNPIVOT gained the after-set-op trigger position; the
  // select-list `* EXCEPT (cols)` form is disambiguated from the
  // set-operation EXCEPT. Every core is DuckDB-legal (probed) and
  // self-differential like P2/P3.
  private val SetOpCores = Seq(
    // QUALIFY in the FIRST arm: the predicate span must stop at UNION
    "union_qualify_first" -> ("SELECT o_orderkey , o_totalprice , § AS tag FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "UNION ALL SELECT o_orderkey , o_totalprice , 'u' FROM fuzz_t WHERE o_totalprice > 250 " +
      "ORDER BY 1 , 2"),
    // QUALIFY in the LAST arm: the compound ORDER BY stays OUTSIDE the wrap
    "union_qualify_last" -> ("SELECT o_orderkey , o_totalprice , 'u' AS tag FROM fuzz_t " +
      "WHERE o_totalprice > 250 " +
      "UNION ALL SELECT o_orderkey , o_totalprice , § AS tag FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY 1 , 2"),
    // QUALIFY in the MIDDLE arm of three
    "union_qualify_middle" -> ("SELECT o_orderkey , o_totalprice FROM fuzz_t WHERE o_totalprice > 250 " +
      "UNION ALL SELECT o_orderkey , o_totalprice FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "UNION ALL SELECT 0 , 0 ORDER BY 1 , 2"),
    // DISTINCT ON arms must be PARENTHESIZED with their own ORDER BY
    "union_don_paren_first" -> ("( SELECT DISTINCT ON (o_prio) o_orderkey , o_totalprice FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey ) " +
      "UNION ALL SELECT o_orderkey , o_totalprice FROM fuzz_t WHERE o_totalprice > 250 " +
      "ORDER BY 1 , 2"),
    "union_don_paren_last" -> ("SELECT o_orderkey , o_totalprice FROM fuzz_t WHERE o_totalprice > 250 " +
      "UNION ALL ( SELECT DISTINCT ON (o_prio) o_orderkey , o_totalprice FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY o_prio , o_totalprice DESC , o_orderkey ) " +
      "ORDER BY 1 , 2"),
    // star EXCLUDE against the set-operation EXCEPT in one statement
    "except_exclude" -> ("SELECT * EXCLUDE (o_totalprice) FROM fuzz_t " +
      "EXCEPT SELECT o_orderkey , o_prio FROM fuzz_t WHERE o_prio = 'C' ORDER BY 1"),
    // Spark's native select-list `* EXCEPT (cols)` + the set-op EXCEPT
    // + a last-arm QUALIFY: the compound detector must read the first
    // EXCEPT as a column list and the second as the set operation
    "except_selectlist_vs_setop" -> ("SELECT * EXCEPT (o_prio) FROM fuzz_t " +
      "EXCEPT SELECT o_orderkey , o_totalprice FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 1 " +
      "ORDER BY 1"),
    "intersect_qualify" -> ("SELECT o_orderkey FROM fuzz_t " +
      "QUALIFY row_number() OVER (PARTITION BY o_prio ORDER BY o_totalprice DESC , o_orderkey) <= 2 " +
      "INTERSECT SELECT o_orderkey FROM fuzz_t WHERE § <> 'zz' ORDER BY 1"),
    // star REPLACE in the second arm (per-SELECT scanners, not triggers)
    "union_replace_arm2" -> ("SELECT o_orderkey , o_totalprice , o_prio FROM fuzz_t " +
      "WHERE o_totalprice > 250 " +
      "UNION ALL SELECT * REPLACE (o_totalprice * 2 AS o_totalprice) FROM fuzz_t " +
      "WHERE § <> 'zz' ORDER BY 1 , 2"),
    // EXCLUDE in BOTH arms under distinct UNION
    "union_exclude_both" -> ("SELECT * EXCLUDE (o_totalprice) FROM fuzz_t " +
      "UNION SELECT * EXCLUDE (o_totalprice) FROM fuzz_t WHERE § <> 'zz' ORDER BY 1"),
    // FROM-first as the SECOND arm — the after-set-op trigger position
    "union_from_first_arm2" -> ("SELECT o_orderkey , o_totalprice FROM fuzz_t WHERE o_totalprice > 250 " +
      "UNION ALL FROM fuzz_t SELECT o_orderkey , o_totalprice WHERE o_totalprice > 150 " +
      "ORDER BY 1 , 2"),
    // FROM-first as the FIRST arm (start-of-statement trigger + UNION tail)
    "union_from_first_arm1" -> ("FROM fuzz_t SELECT o_orderkey , o_totalprice WHERE o_totalprice > 150 " +
      "UNION ALL SELECT o_orderkey , o_totalprice FROM fuzz_t WHERE o_totalprice > 250 " +
      "ORDER BY 1 , 2"),
    // statement PIVOT as the FIRST arm: its tail scan must stop at UNION
    "union_pivot_arm1" -> ("PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey UNION ALL SELECT 99 , 1 , 2 ORDER BY 1"),
    // statement PIVOT as the SECOND arm — the after-set-op trigger
    "union_pivot_arm2" -> ("SELECT 99 AS o_orderkey , 1 AS a , 2 AS b " +
      "UNION ALL PIVOT fuzz_t ON o_prio IN ('A', 'B') USING sum(o_totalprice) " +
      "GROUP BY o_orderkey ORDER BY 1"),
    // ASOF JOIN inside the second arm
    "union_asof_arm2" -> ("SELECT 0 AS k , 0 AS t , 0 AS w " +
      "UNION ALL SELECT fuzz_e1.k , fuzz_e1.t , w FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "ORDER BY 1 , 2"),
    // parenthesized last arm: QUALIFY + its own ORDER BY + LIMIT inside
    // the parens (the paren group must NOT read the outer UNION as its
    // own compound — group-scoped detection)
    "union_paren_qualify_limit" -> ("SELECT 0 AS k , 0 AS w " +
      "UNION ALL ( SELECT fuzz_e1.k , w FROM fuzz_e1 " +
      "ASOF JOIN fuzz_e2 ON fuzz_e1.k = fuzz_e2.k AND fuzz_e2.t2 <= fuzz_e1.t " +
      "QUALIFY row_number() OVER (PARTITION BY fuzz_e1.k ORDER BY fuzz_e1.t DESC) <= 1 " +
      "ORDER BY fuzz_e1.k DESC LIMIT 2 ) ORDER BY 1 , 2"))

  test("P7: set-operation compound bodies compose with every extension (510 seeds)") {
    views
    SetOpCores.foreach { case (name, core) =>
      val plain = spark.sql(core.replace("§", "'p'")).collect()
        .map(_.toSeq.toList).toList
      assert(plain.nonEmpty, s"$name: empty plain result\n$core")
      samples(decorate(core, 0), 30, 0xF022AL + name.hashCode).zipWithIndex
        .foreach { case (sql, i) =>
          val got =
            try spark.sql(sql).collect().map(_.toSeq.toList).toList
            catch {
              case e: Throwable =>
                fail(s"$name seed $i failed to execute:\n$sql\n${e.getMessage}")
            }
          assert(got.length == plain.length,
            s"$name seed $i row count ${got.length} != ${plain.length}:\n$sql")
          got.zip(plain).foreach { case (g, p) =>
            assert(mask(g) == mask(p), s"$name seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
          }
        }
    }
    // the refusals stay loud under decoration: an unparenthesized
    // DISTINCT ON arm (first and last), and a qualified-ref compound
    // ORDER BY after a last-arm QUALIFY
    val donFirst = "SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM fuzz_t " +
      "UNION ALL SELECT o_prio , o_orderkey FROM fuzz_t ORDER BY 1 , 2"
    samples(decorate(donFirst, 0), 5, 0xF022BL).foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("set-operation arm"), sql)
    }
    val donLast = "SELECT o_prio , o_orderkey FROM fuzz_t " +
      "UNION ALL SELECT DISTINCT ON (o_prio) o_prio , o_orderkey FROM fuzz_t ORDER BY 1 , 2"
    samples(decorate(donLast, 0), 5, 0xF022CL).foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("set-operation arm"), sql)
    }
    val qualRef = "SELECT k , v FROM fuzz_e1_kv UNION ALL SELECT k , v FROM fuzz_e1_kv " +
      "QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) <= 1 ORDER BY fuzz_e1_kv.k"
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("fuzz_e1_kv")
    val eq = intercept[Exception](spark.sql(qualRef).collect())
    assert(eq.getMessage.contains("set operation"), eq.getMessage)
  }

  test("SOAK: shifted-seed decoration sweep over every core family (env-gated)") {
    // not part of the CI suite: set GRAFT_FUZZ_SOAK=<seeds-per-core> to
    // run N fresh decorations per core from a DIFFERENT seed base than
    // the fixed P2/P3/P5/P6 seeds — the r13 post-close soak found a
    // real bug (QUALIFY + GROUP BY ALL) exactly this way; r14 runs it
    // PRE-close. Self-differential like the fixed passes.
    val n = sys.env.get("GRAFT_FUZZ_SOAK").flatMap(_.toIntOption)
    assume(n.nonEmpty, "set GRAFT_FUZZ_SOAK=<seeds-per-core> to run the soak")
    views
    val families = Seq("P2" -> Cores, "P3" -> ComposedCores, "P5" -> AllCores,
      "P6o" -> OrdinalCores, "P7" -> SetOpCores,
      "P6r" -> RecursiveBodies.map { case (nm, b) =>
        nm -> (if (nm == "rec_second_cte") RecursivePrelude.trim + b
               else RecursivePrelude + b)
      },
      // the P4 cross product, precomposed (soak seeds are per COMBO)
      "P4" -> (for ((pn, pre) <- PreludeCtes; (bn, body) <- BodyCores)
        yield s"${pn}_$bn" -> s"$pre $body"))
    var ran = 0
    families.foreach { case (fam, cores) =>
      cores.foreach { case (name, core) =>
        val plain = spark.sql(core.replace("§", "'p'")).collect()
          .map(_.toSeq.toList).toList
        samples(decorate(core, 0), n.get, 0xF14057L + fam.hashCode * 131 + name.hashCode)
          .zipWithIndex.foreach { case (sql, i) =>
            val got =
              try spark.sql(sql).collect().map(_.toSeq.toList).toList
              catch {
                case e: Throwable =>
                  fail(s"$fam/$name soak seed $i failed to execute:\n$sql\n${e.getMessage}")
              }
            assert(got.length == plain.length,
              s"$fam/$name soak seed $i row count ${got.length} != ${plain.length}:\n$sql")
            got.zip(plain).foreach { case (g, p) =>
              assert(mask(g) == mask(p),
                s"$fam/$name soak seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
            }
            ran += 1
          }
      }
    }
    info(s"soak executed $ran decorated statements across ${families.map(_._2.size).sum} cores")
  }

  test("P4: WITH-prelude extension CTEs compose with every statement body (729 seeds)") {
    views
    PreludeCtes.foreach { case (pn, pre) =>
      BodyCores.foreach { case (bn, body) =>
        val core = s"$pre $body"
        val plain =
          try spark.sql(core.replace("§", "'p'")).collect()
            .map(_.toSeq.toList).toList
          catch {
            case e: Throwable =>
              fail(s"$pn x $bn plain core failed to execute:\n$core\n${e.getMessage}")
          }
        assert(plain.nonEmpty, s"$pn x $bn: empty plain result\n$core")
        samples(decorate(core, 0), 9, 0xF0224L + pn.hashCode * 31 + bn.hashCode)
          .zipWithIndex.foreach { case (sql, i) =>
            val got =
              try spark.sql(sql).collect().map(_.toSeq.toList).toList
              catch {
                case e: Throwable =>
                  fail(s"$pn x $bn seed $i failed to execute:\n$sql\n${e.getMessage}")
              }
            assert(got.length == plain.length,
              s"$pn x $bn seed $i row count ${got.length} != ${plain.length}:\n$sql")
            got.zip(plain).foreach { case (g, p) =>
              assert(mask(g) == mask(p),
                s"$pn x $bn seed $i row mismatch:\n$sql\ngot  $g\nwant $p")
            }
          }
      }
    }
  }
}
