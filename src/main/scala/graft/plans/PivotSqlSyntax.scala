package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}

/** SQL `PIVOT` statement support — the fourth grammar extension on the
  * [[GraftSqlParser]] channel (ASOF JOIN, QUALIFY, DISTINCT ON, PIVOT),
  * in the DuckDB simplified-statement spelling:
  *
  * {{{
  * PIVOT orders ON o_orderstatus USING count(*)
  * GROUP BY o_orderpriority ORDER BY o_orderpriority
  * }}}
  *
  * Stock Spark has a FROM-clause `PIVOT (agg FOR col IN (...))` that
  * REQUIRES the value list up front; DuckDB's statement form is dynamic
  * — the distinct values of the ON column become the output columns.
  * DuckDB implements that by eagerly enumerating the values at bind time
  * and macro-expanding into filtered aggregates; this extension does the
  * SAME two-phase trick at parse time (the one rewrite on this channel
  * that is allowed to touch data, because the clause's OUTPUT SCHEMA is
  * data-dependent by definition):
  *
  *   1. probe `SELECT DISTINCT col FROM src WHERE col IS NOT NULL
  *      ORDER BY 1` on the active session (NULL pivot values produce no
  *      column — probe-verified DuckDB behavior; value count capped, the
  *      cap failing loudly — a pivot wider than 10k columns is a schema
  *      bug, not a query);
  *   2. rewrite to the conditional-aggregate expansion, which is also
  *      what DuckDB expands to (probe-verified: `count` fills empty
  *      cells with 0, `sum` with NULL — FILTER semantics exactly):
  *
  * {{{
  * SELECT <keys>, <agg> FILTER (WHERE <col> = <v1>) AS `v1`, ...
  * FROM <src> GROUP BY <keys> <tail>
  * }}}
  *
  * `ON col IN (v1, v2)` skips the probe entirely (static value list,
  * zero jobs at parse time — the form to prefer in production SQL, for
  * the same new-value-appears schema-stability reason the repo's
  * DataFrame pivots always pass explicit lists). Without a GROUP BY,
  * DuckDB groups by every column not consumed by ON or USING; the
  * rewrite replicates that from the source's analyzed schema (analysis
  * only — no job). `USING agg AS suffix` names columns `value_suffix`,
  * as DuckDB does.
  *
  * A word `PIVOT`/`UNPIVOT` is treated as this statement form ONLY at
  * statement start or directly after `(` — the two positions the
  * DuckDB grammar allows — so Spark's own FROM-clause `PIVOT (...)`
  * and `UNPIVOT (...)`, and any column actually named pivot, pass
  * through untouched.
  *
  * Documented limits, each failing loudly (never a silent wrong
  * answer): one USING aggregate (a single aggregate-function call —
  * the DuckDB binder enforces the same shape), one bare-identifier ON
  * column, no multi-column ON, and a pivot value whose column name
  * collides with a grouping column or another value is rejected
  * (DuckDB silently renames to `v_1`; a data-dependent silent rename
  * is exactly what a 100 TB pipeline must not depend on).
  *
  * Reference anchor: the reference engine has no SQL surface
  * (`icecube/core/cube.py`); dynamic-PIVOT parity with the DuckDB
  * oracle dialect is capability beyond it, gated by `o23_pivot_sql`
  * whose oracle IS DuckDB's native PIVOT statement on identical text.
  */
object PivotSqlSyntax {
  import QualifySqlSyntax.{events, Ev}

  private val TailStops = Set(
    "ORDER", "LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT", "MINUS")
  private val MaxValues = 10000

  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"PIVOT: $msg"))

  /** Is the raw text between two positions whitespace (or comments)
    * only? Guards against quoted identifiers (invisible to the event
    * scan) hiding between tokens the parser below assumes adjacent; a
    * comment between tokens is ordinary separation (fuzz find r11:
    * `ON /* c */ col` was rejected). */
  private def wsOnly(sql: String, from: Int, to: Int): Boolean = {
    val span = sql.substring(from, to)
    if (span.forall(_.isWhitespace)) true
    else {
      val spans = QualifySqlSyntax.commentSpans(span)
      span.indices.forall(i =>
        span.charAt(i).isWhitespace || spans.exists(s => i >= s._1 && i < s._2))
    }
  }

  /** Source relation: either a parenthesized block or a dotted bare
    * identifier chain. Returns (fromSql-ready text, next event index).
    * Shared with [[UnpivotSqlSyntax]]. */
  private[plans] def parseSource(sql: String, evs: Vector[Ev], k: Int,
      alias: String, fail: String => Nothing): (String, Int) = {
    if (k >= evs.length) fail("missing source relation")
    val e = evs(k)
    if (e.kind == 1) { // parenthesized subquery
      var j = k + 1
      while (j < evs.length && !(evs(j).kind == 2 && evs(j).depth == e.depth)) j += 1
      if (j >= evs.length) fail("unclosed source subquery")
      (sql.substring(e.pos, evs(j).end) + " " + alias, j + 1)
    } else if (e.kind == 0) { // dotted identifier chain
      var end = e.end
      var j = k + 1
      while (j < evs.length && evs(j).kind == 0 &&
          sql.substring(end, evs(j).pos).trim == ".") {
        end = evs(j).end; j += 1
      }
      (sql.substring(e.pos, end), j)
    } else fail("source must be a table name or a parenthesized subquery")
  }

  /** If the statement opens with a complete `WITH` prelude (one or more
    * CTE definitions), the index of the first event AFTER the prelude —
    * the third position (besides statement start and directly after
    * `(`) where DuckDB's grammar admits a statement-form PIVOT/UNPIVOT
    * body (`WITH c AS (...) PIVOT c ON ...` — probe-verified DuckDB
    * behavior, fuzz find r12). None when the statement doesn't start
    * with WITH or the prelude doesn't parse as CTE definitions; a
    * Spark FROM-clause `FROM (...) PIVOT (...)` inside a WITH statement
    * never matches because its PIVOT is not AT the prelude end. */
  private[plans] def withPreludeEnd(sql: String, evs: Vector[Ev]): Option[Int] =
    withWalk(sql, evs)._2

  /** The complete `name AS ( body )` CTE definitions of a leading WITH
    * prelude, as (name event index, event index just past the body's
    * close paren). Empty when the statement has no well-formed prelude.
    * Lets a bind-time schema probe put the CTEs IN SCOPE that precede
    * the position being probed (fuzz P4 find, r13: a `* REPLACE` whose
    * FROM body is a CTE of the statement's own prelude probed
    * `SELECT * FROM c` with no `c` in the session). */
  private[plans] def withCteDefs(sql: String, evs: Vector[Ev]): Seq[(Int, Int)] =
    withWalk(sql, evs)._1

  private def withWalk(sql: String,
      evs: Vector[Ev]): (Seq[(Int, Int)], Option[Int]) = {
    val none = (Seq.empty[(Int, Int)], Option.empty[Int])
    if (evs.isEmpty || evs(0).kind != 0 || evs(0).up != "WITH") return none
    def skipParen(k0: Int): Option[Int] = {
      // k0 at an open paren: index just past its matching close
      val d = evs(k0).depth
      var k = k0 + 1
      while (k < evs.length && !(evs(k).kind == 2 && evs(k).depth == d)) k += 1
      if (k >= evs.length) None else Some(k + 1)
    }
    // raw separator text with comments blanked (a `-- x` before the
    // comma between two CTEs is ordinary separation)
    def sep(from: Int, to: Int): String = {
      val span = sql.substring(from, to)
      val spans = QualifySqlSyntax.commentSpans(span)
      span.indices.map(i =>
        if (spans.exists(s => i >= s._1 && i < s._2)) ' '
        else span.charAt(i)).mkString.trim
    }
    val defs = Seq.newBuilder[(Int, Int)]
    var k = 1
    if (k < evs.length && evs(k).kind == 0 && evs(k).up == "RECURSIVE") k += 1
    var more = true
    while (more) {
      val nameIdx = k
      if (k >= evs.length || evs(k).kind != 0) return none // CTE name
      k += 1
      if (k < evs.length && evs(k).kind == 1) // optional (col, ...) list
        skipParen(k) match {
          case Some(nk) => k = nk
          case None     => return none
        }
      if (k >= evs.length || evs(k).kind != 0 || evs(k).up != "AS") return none
      k += 1
      if (k >= evs.length || evs(k).kind != 1) return none // AS (body)
      skipParen(k) match {
        case Some(nk) => k = nk
        case None     => return none
      }
      defs += ((nameIdx, k))
      more = k < evs.length && sep(evs(k - 1).end, evs(k).pos) == ","
    }
    (defs.result(), if (k < evs.length) Some(k) else None)
  }

  /** Split raw text on commas at paren/quote depth 0 — comment-aware: a
    * comma inside a `--` or `/* */` comment is prose, not a separator
    * (found by SqlRewriterFuzzSpec: a block comment inside a REPLACE
    * item was split mid-comment). */
  private[plans] def splitTop(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\'') { i += 1; while (i < n && text.charAt(i) != '\'') i += 1 }
      else if (c == '"' || c == '`') { val q = c; i += 1; while (i < n && text.charAt(i) != q) i += 1 }
      else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        while (i < n && text.charAt(i) != '\n') i += 1
        i -= 1 // outer i += 1 lands on the newline (ordinary whitespace)
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
        i = math.min(n - 1, i + 1) // outer i += 1 passes the closing '/'
      } else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { out += text.substring(start, i); start = i + 1 }
      i += 1
    }
    out += text.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** One pivot value: the literal as it appears in emitted Spark SQL,
    * and the column name DuckDB would give it. */
  private final case class PivotValue(litSql: String, name: String)

  private def literalOf(v: Any): PivotValue = v match {
    case s: String => PivotValue("'" + s.replace("'", "''") + "'", s)
    case n @ (_: Byte | _: Short | _: Int | _: Long) =>
      PivotValue(n.toString, n.toString)
    case b: Boolean => PivotValue(b.toString, b.toString)
    case d: java.sql.Date => PivotValue(s"DATE '$d'", d.toString)
    case d: java.math.BigDecimal =>
      PivotValue(d.toPlainString, d.toPlainString)
    case other => fail(s"unsupported pivot value type ${other.getClass.getSimpleName} " +
      "— supported: string, integer, boolean, date, decimal")
  }

  /** Drop comment spans from one IN-list item: `/* c */ 'B'` is the
    * value 'B' — keeping the comment would leak it into the emitted
    * FILTER and the output column NAME (fuzz find r11; DuckDB itself
    * leaks in-list comment text into its pivot column names, a quirk
    * not worth reproducing). */
  private def stripItemComments(s: String): String = {
    val spans = QualifySqlSyntax.commentSpans(s)
    if (spans.isEmpty) s.trim
    else {
      val b = new java.lang.StringBuilder(s.length)
      var i = 0
      spans.foreach { case (st, en) => b.append(s, i, st); i = en }
      b.append(s, i, s.length)
      b.toString.trim
    }
  }

  private def fromInList(text: String): Seq[PivotValue] =
    splitTop(text).map(stripItemComments).map { lit =>
      val name =
        if (lit.startsWith("'") && lit.endsWith("'") && lit.length >= 2)
          lit.substring(1, lit.length - 1).replace("''", "'")
        else lit
      PivotValue(lit, name)
    }

  private def session: SparkSession =
    SparkSession.getActiveSession.getOrElse(
      fail("no active SparkSession to enumerate pivot values on"))

  /** Dynamic-probe memo, keyed by the probe SQL and scoped to ONE
    * parse cycle (one [[rewrite]] invocation — i.e. one statement
    * text): two PIVOT blocks in the same statement probing the same
    * column see one enumeration (a consistent value set for UNION
    * compatibility), but a LATER parse of the same text re-enumerates,
    * exactly like DuckDB binds PIVOT values afresh at each prepare.
    * The previous session-lifetime memo silently froze the first
    * enumeration: a pivot re-run after incremental ingest omitted new
    * values' columns with no error. `SET
    * spark.graft.pivot.probeMemoScope=session` restores the old
    * pinning for workloads that re-parse one statement against static
    * data; `SET spark.graft.pivot.dynamicProbe=false` disables probing
    * outright for production SQL (the static `ON col IN (...)` form
    * never probes and never hits this path). */
  private val cycleMemo =
    new ThreadLocal[scala.collection.concurrent.TrieMap[String, Seq[PivotValue]]]

  private val sessionMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, Seq[PivotValue]]]())

  private def probeValues(s: SparkSession, probeSql: String): Seq[PivotValue] = {
    if (s.conf.get("spark.graft.pivot.dynamicProbe", "true") == "false")
      fail("dynamic value probing is disabled " +
        "(spark.graft.pivot.dynamicProbe=false) — use ON <col> IN (...)")
    val memo =
      if (s.conf.get("spark.graft.pivot.probeMemoScope", "parse") == "session")
        sessionMemo.synchronized {
          var m = sessionMemo.get(s)
          if (m == null) {
            m = scala.collection.concurrent.TrieMap.empty[String, Seq[PivotValue]]
            sessionMemo.put(s, m)
          }
          m
        }
      else cycleMemo.get() // installed by rewrite(); null only off-channel
    val enumerate = () => {
      val rows = s.sql(probeSql).limit(MaxValues + 1).collect()
      if (rows.length > MaxValues)
        fail(s"more than $MaxValues distinct pivot values — use ON ... IN (...)")
      rows.toSeq.map(r => literalOf(r.get(0)))
    }
    if (memo == null) enumerate()
    else memo.getOrElseUpdate(probeSql, enumerate())
  }

  /** Bare words of an expression that could reference source columns:
    * every identifier NOT directly followed by '(' (function call). */
  private def exprWords(text: String): Set[String] = {
    val evs = events(text)
    evs.indices.collect {
      case i if evs(i).kind == 0 &&
          !(i + 1 < evs.length && evs(i + 1).kind == 1 &&
            evs(i + 1).pos == evs(i).end) =>
        evs(i).up
    }.toSet
  }

  def rewrite(sql0: String): String = {
    if (!sql0.toUpperCase.contains("PIVOT")) return sql0 // fast path
    // one parse cycle = one memo (see [[cycleMemo]]); save/restore so a
    // hypothetical reentrant parse cannot clobber its caller's cycle
    val outer = cycleMemo.get()
    cycleMemo.set(scala.collection.concurrent.TrieMap.empty)
    // remove() when there was no outer cycle: set(null) would leave a
    // stale ThreadLocal entry on long-lived session pool threads
    try rewriteImpl(sql0)
    finally if (outer == null) cycleMemo.remove() else cycleMemo.set(outer)
  }

  private def rewriteImpl(sql0: String): String = {
    var sql = sql0
    var idx = 0
    var more = true
    while (more) {
      val evs = events(sql)
      val prelude = withPreludeEnd(sql, evs)
      val ki = evs.indices.find { k =>
        val e = evs(k)
        e.kind == 0 && e.up == "PIVOT" &&
          (k == 0 || evs(k - 1).kind == 1 || prelude.contains(k) ||
            QualifySqlSyntax.afterSetOp(evs, k))
      }
      ki match {
        case None => more = false
        case Some(k) =>
          val piv = evs(k)
          val d = piv.depth
          // statement-form body after a WITH prelude: the CTEs must
          // prefix every bind-time probe, or a CTE-named source would
          // resolve against the catalog instead of the prelude
          val preludeSql =
            if (prelude.contains(k)) sql.substring(0, piv.pos) + "\n" else ""
          val alias = s"__graft_piv_$idx"
          val (fromSql, afterSrc) = parseSource(sql, evs, k + 1, alias, fail)
          // ON <col>
          if (afterSrc >= evs.length || evs(afterSrc).kind != 0 ||
              evs(afterSrc).up != "ON")
            fail("expected ON <column> after the source relation")
          val ci = afterSrc + 1
          if (ci >= evs.length || evs(ci).kind != 0 ||
              !wsOnly(sql, evs(afterSrc).end, evs(ci).pos))
            fail("the ON column must be a single bare identifier")
          val colText = sql.substring(evs(ci).pos, evs(ci).end)
          if (ci + 1 < evs.length && evs(ci + 1).kind == 0 &&
              sql.substring(evs(ci).end, evs(ci + 1).pos).trim == ",")
            fail("multi-column ON is not supported — pivot one column")
          // optional IN (...)
          var cur = ci + 1
          var inValues: Option[Seq[PivotValue]] = None
          if (cur < evs.length && evs(cur).kind == 0 && evs(cur).up == "IN") {
            if (cur + 1 >= evs.length || evs(cur + 1).kind != 1)
              fail("IN must be followed by a parenthesized value list")
            val open = evs(cur + 1)
            var j = cur + 2
            while (j < evs.length && !(evs(j).kind == 2 && evs(j).depth == open.depth)) j += 1
            if (j >= evs.length) fail("unclosed IN value list")
            inValues = Some(fromInList(sql.substring(open.end, evs(j).pos)))
            cur = j + 1
          }
          // USING <agg> [AS suffix]
          if (cur >= evs.length || evs(cur).kind != 0 || evs(cur).up != "USING")
            fail("expected USING <aggregate>")
          var aggEnd = sql.length
          var tailStart = sql.length
          var j = cur + 1
          var stopped = false
          var suffix: Option[String] = None
          var groupText: Option[String] = None
          while (j < evs.length && !stopped) {
            val e = evs(j)
            if (e.kind == 2 && e.depth < d) { aggEnd = e.pos; tailStart = e.pos; stopped = true }
            else if (e.kind == 0 && e.depth == d &&
                (TailStops.contains(e.up) || e.up == "AS" || e.up == "GROUP")) {
              aggEnd = e.pos; tailStart = e.pos; stopped = true
              if (e.up == "AS") {
                if (j + 1 >= evs.length || evs(j + 1).kind != 0)
                  fail("AS must be followed by a bare suffix identifier")
                suffix = Some(sql.substring(evs(j + 1).pos, evs(j + 1).end))
                j += 2
                tailStart = if (j < evs.length) evs(j).pos else sql.length
                // GROUP may still follow the suffix
                if (j < evs.length && evs(j).kind == 0 && evs(j).depth == d &&
                    evs(j).up == "GROUP") {
                  val (g, t) = parseGroupBy(sql, evs, j, d)
                  groupText = Some(g); tailStart = t
                }
              } else if (e.up == "GROUP") {
                val (g, t) = parseGroupBy(sql, evs, j, d)
                groupText = Some(g); tailStart = t
              }
            }
            j += 1
          }
          val aggText = sql.substring(evs(cur).end, aggEnd).trim
          if (aggText.isEmpty) fail("empty USING aggregate")
          if (splitTop(aggText).size != 1)
            fail("exactly one USING aggregate is supported")
          // must be a single aggregate-function call so FILTER can
          // attach; only whitespace/comments may follow the call's
          // closing paren (a raw endsWith(")") rejected a trailing
          // comment — SqlRewriterFuzzSpec find, r11)
          val aggEvs = events(aggText)
          val aggSpans = QualifySqlSyntax.commentSpans(aggText)
          val callShaped = aggEvs.length >= 2 && aggEvs(0).kind == 0 &&
            aggEvs(1).kind == 1 && aggEvs(1).pos == aggEvs(0).end &&
            aggEvs.last.kind == 2 && aggEvs.last.depth == aggEvs(1).depth && {
              val tailFrom = aggEvs.last.end
              (tailFrom until aggText.length).forall(i =>
                aggText.charAt(i).isWhitespace ||
                  aggSpans.exists(s => i >= s._1 && i < s._2))
            }
          if (!callShaped)
            fail(s"USING expression must be a single aggregate call, got: $aggText")

          // values: static list or eager probe (the DuckDB bind-time trick)
          val values = inValues.getOrElse {
            probeValues(session,
              s"${preludeSql}SELECT DISTINCT $colText AS __graft_piv_v FROM $fromSql " +
                s"WHERE $colText IS NOT NULL ORDER BY 1")
          }

          // grouping keys
          val (keysSel, keysBy) = groupText match {
            case Some(g) => (g, g)
            case None =>
              val fields = session.sql(s"${preludeSql}SELECT * FROM $fromSql")
                .schema.fieldNames.toSeq
              val used = exprWords(aggText) + colText.toUpperCase
              val keys = fields.filterNot(f => used.contains(f.toUpperCase))
              (keys.map(f => s"`$f`").mkString(", "),
                keys.map(f => s"`$f`").mkString(", "))
          }
          // collision + duplicate checks (loud, not DuckDB's silent _1)
          val names = values.map(v => suffix.fold(v.name)(s => s"${v.name}_$s"))
          val lower = names.map(_.toLowerCase)
          if (lower.distinct.size != lower.size)
            fail("two pivot values map to the same column name")
          val keyWords = splitTop(keysBy).map(_.split("[^A-Za-z0-9_]").last.toLowerCase).toSet
          names.find(n => keyWords.contains(n.toLowerCase)).foreach { n =>
            fail(s"pivot value column '$n' collides with a grouping column — " +
              "alias the aggregate with USING ... AS <suffix>")
          }
          val aggCols = values.zip(names).map { case (v, n) =>
            val quoted = "`" + n.replace("`", "``") + "`"
            // newline before FILTER: aggText may end in a line comment
            // whose terminating newline .trim stripped — appending on
            // the same line would swallow the FILTER clause
            s"$aggText\nFILTER (WHERE $colText = ${v.litSql}) AS $quoted"
          }
          val selParts =
            (if (keysSel.nonEmpty) Seq(keysSel) else Nil) ++
              (if (aggCols.nonEmpty) Seq(aggCols.mkString(", ")) else Nil)
          if (selParts.isEmpty) fail("pivot has no grouping columns and no values")
          // newline-separated reassembly throughout: keysSel/keysBy are
          // USER text that may end in a `--` line comment whose newline
          // .trim stripped — a same-line continuation (", agg…", "FROM",
          // the ORDER BY tail) would be swallowed (fuzz find r11, the
          // o28 class inside the PIVOT emitter)
          val rewritten = s"SELECT ${selParts.mkString("\n, ")}\nFROM $fromSql" +
            (if (keysBy.nonEmpty) s"\nGROUP BY $keysBy" else "") + "\n"
          sql = sql.substring(0, piv.pos) + rewritten + sql.substring(tailStart)
          idx += 1
      }
    }
    sql
  }

  /** Capture `GROUP BY <keys>` starting at the GROUP event; returns
    * (keys text, tail start position). */
  private def parseGroupBy(sql: String, evs: Vector[Ev], gi: Int,
      d: Int): (String, Int) = {
    if (gi + 1 >= evs.length || evs(gi + 1).kind != 0 || evs(gi + 1).up != "BY")
      fail("GROUP must be followed by BY")
    var end = sql.length
    var j = gi + 2
    var stopped = false
    while (j < evs.length && !stopped) {
      val e = evs(j)
      if (e.kind == 2 && e.depth < d) { end = e.pos; stopped = true }
      else if (e.kind == 0 && e.depth == d && TailStops.contains(e.up)) {
        end = e.pos; stopped = true
      }
      j += 1
    }
    val keys = sql.substring(evs(gi + 1).end, end).trim
    if (keys.isEmpty) fail("empty GROUP BY key list")
    // GROUP BY ALL inside a PIVOT statement: DuckDB's own parser rejects
    // it (the pivot's grouping keys must be explicit — the value columns
    // are synthesized, so "all non-aggregated" is ill-defined here), and
    // letting it through would surface as a baffling unresolved-column
    // error on `ALL` from the emitted aggregate. Match DuckDB: refuse.
    val kevs = QualifySqlSyntax.events(keys)
    if (kevs.length == 1 && kevs.head.kind == 0 && kevs.head.up == "ALL")
      fail("GROUP BY ALL is not supported in a PIVOT statement (DuckDB " +
        "rejects it too) — list the grouping columns explicitly")
    // positional keys (fuzz P6): the emitter re-uses this text as BOTH
    // the select list and the GROUP BY of a freshly synthesized
    // aggregate, where `1` is a LITERAL select item and a one-group
    // grouping — silently wrong results. DuckDB's own parser rejects
    // ordinals here; match it.
    splitTop(keys).foreach { k =>
      if (QualifySqlSyntax.codeText(k).trim.matches("\\d+"))
        fail(s"positional GROUP BY is not supported in a PIVOT statement " +
          s"(ordinal ${QualifySqlSyntax.codeText(k).trim} — DuckDB's own " +
          "parser rejects it too); name the grouping columns")
    }
    (keys, end)
  }
}

/** SQL `UNPIVOT` statement support (DuckDB spelling) — the fifth grammar
  * extension, and PIVOT's static inverse:
  *
  * {{{
  * UNPIVOT (PIVOT orders ON o_orderstatus USING count(*)
  *          GROUP BY o_orderpriority)
  * ON "F", "O", "P" INTO NAME status VALUE n
  * ORDER BY o_orderpriority, status
  * }}}
  *
  * Rewritten (purely lexically — no probe: the melt's schema is static)
  * into Spark's own FROM-clause UNPIVOT:
  *
  * {{{
  * SELECT * FROM <src> UNPIVOT (`n` FOR `status` IN (`F`, `O`, `P`)) <tail>
  * }}}
  *
  * Double-quoted identifiers in the ON list are translated to backticks
  * (the emitted text is parsed by Spark, where `"F"` is a string
  * literal). Both engines exclude NULL cells by default and label each
  * melted row with the source column's name, so the statement runs
  * VERBATIM on DuckDB as the oracle. Statement-position detection is
  * shared with PIVOT, so Spark's native `FROM t UNPIVOT (...)` form
  * passes through untouched. Multi-VALUE melts fail loudly.
  */
object UnpivotSqlSyntax {
  import QualifySqlSyntax.events

  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"UNPIVOT: $msg"))

  /** `"x"` → `` `x` `` for the Spark-parsed output. */
  private def quoteFix(text: String): String = {
    val out = new java.lang.StringBuilder(text.length)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '"') {
        val j = text.indexOf('"', i + 1)
        if (j < 0) fail("unclosed quoted identifier in ON list")
        out.append('`').append(text, i + 1, j).append('`')
        i = j + 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  def rewrite(sql0: String): String = {
    if (!sql0.toUpperCase.contains("UNPIVOT")) return sql0 // fast path
    var sql = sql0
    var idx = 0
    var more = true
    while (more) {
      val evs = events(sql)
      val prelude = PivotSqlSyntax.withPreludeEnd(sql, evs)
      val ki = evs.indices.find { k =>
        val e = evs(k)
        e.kind == 0 && e.up == "UNPIVOT" &&
          (k == 0 || evs(k - 1).kind == 1 || prelude.contains(k) ||
            QualifySqlSyntax.afterSetOp(evs, k))
      }
      ki match {
        case None => more = false
        case Some(k) =>
          val unp = evs(k)
          val d = unp.depth
          val alias = s"__graft_unp_$idx"
          val (fromSql, afterSrc) =
            PivotSqlSyntax.parseSource(sql, evs, k + 1, alias, fail)
          if (afterSrc >= evs.length || evs(afterSrc).kind != 0 ||
              evs(afterSrc).up != "ON")
            fail("expected ON <columns> after the source relation")
          val ii = evs.indexWhere(
            e => e.kind == 0 && e.depth == d && e.up == "INTO", afterSrc + 1)
          if (ii < 0) fail("expected INTO NAME <col> VALUE <col>")
          // comments BLANKED, not carried: the ON list is re-emitted on
          // ONE line inside `IN (...)`, so a `--` comment between two
          // columns would swallow the emitted closing parens (fuzz find
          // r12, the o28 class inside the UNPIVOT emitter)
          val colsRaw = sql.substring(evs(afterSrc).end, evs(ii).pos)
          val colsSpans = QualifySqlSyntax.commentSpans(colsRaw)
          val colsText = colsRaw.indices.map(i =>
            if (colsSpans.exists(s => i >= s._1 && i < s._2)) ' '
            else colsRaw.charAt(i)).mkString.trim
          if (colsText.isEmpty) fail("empty ON column list")
          if (ii + 3 >= evs.length ||
              evs(ii + 1).kind != 0 || evs(ii + 1).up != "NAME" ||
              evs(ii + 2).kind != 0 ||
              evs(ii + 3).kind != 0 || evs(ii + 3).up != "VALUE")
            fail("expected INTO NAME <col> VALUE <col>")
          val nameCol = sql.substring(evs(ii + 2).pos, evs(ii + 2).end)
          if (ii + 4 >= evs.length || evs(ii + 4).kind != 0)
            fail("expected a bare identifier after VALUE")
          val valueCol = sql.substring(evs(ii + 4).pos, evs(ii + 4).end)
          val tailStart =
            if (ii + 5 < evs.length) evs(ii + 5).pos else sql.length
          // comment-aware: a comma inside a comment after the VALUE
          // column is prose, not a second melt column (fuzz find r11)
          val afterValue = sql.substring(evs(ii + 4).end,
            math.min(tailStart, sql.length))
          val avSpans = QualifySqlSyntax.commentSpans(afterValue)
          val commaOutside = afterValue.indices.exists(i =>
            afterValue.charAt(i) == ',' &&
              !avSpans.exists(s => i >= s._1 && i < s._2))
          if (commaOutside)
            fail("one VALUE column only — multi-value melts are not supported")
          val rewritten = s"SELECT * FROM $fromSql UNPIVOT (`$valueCol` FOR " +
            s"`$nameCol` IN (${quoteFix(colsText)})) "
          sql = sql.substring(0, unp.pos) + rewritten + sql.substring(tailStart)
          idx += 1
      }
    }
    sql
  }
}
