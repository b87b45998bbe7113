package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}

/** DuckDB star modifiers `* EXCLUDE (...)` / `* REPLACE (expr AS col,
  * ...)` — the sixth grammar extension on the [[GraftSqlParser]]
  * channel:
  *
  * {{{
  * SELECT * EXCLUDE (o_comment)
  *          REPLACE (upper(o_orderstatus) AS o_orderstatus)
  * FROM orders
  * }}}
  *
  * `EXCLUDE` alone is a pure lexical alias for Spark 4's native
  * `* EXCEPT (...)` — a one-word substitution. `REPLACE` has no Spark
  * spelling at all, so the star group expands into the EXPLICIT select
  * list: the FROM body's analyzed schema (analysis only — no job; the
  * [[PivotSqlSyntax]] bind-time precedent) minus the excluded columns,
  * with each replaced column's expression in its original position —
  * exactly DuckDB's defined semantics (REPLACE keeps position and name,
  * EXCLUDE drops the column). Binder-parity failure modes are
  * preserved: an EXCLUDE/REPLACE name not in the schema fails loudly,
  * as do duplicate replacements and a qualified star (`t.* EXCLUDE` is
  * not supported — alias the subquery instead).
  *
  * The modifier must directly follow a bare `*` in a select list, so
  * `count(*)`, a column named `exclude`, and Spark's own `* EXCEPT`
  * all pass through untouched.
  */
object StarSqlSyntax {
  import QualifySqlSyntax.{events, Ev}
  import PivotSqlSyntax.splitTop

  private val ClauseStops = Set("WHERE", "GROUP", "HAVING", "WINDOW",
    "QUALIFY", "ORDER", "LIMIT", "OFFSET", "FETCH",
    "UNION", "INTERSECT", "EXCEPT", "MINUS")

  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"star modifiers: $msg"))

  /** Index of the last code character before `pos0`, skipping
    * whitespace AND comment spans — the backward twin of the events()
    * lexer's forward skip. Raw `charAt` walks read comment/hint text
    * as code: `SELECT /*+ BROADCAST(t) */ * EXCLUDE (c)` must still
    * land on the L of SELECT. Returns -1 at statement start. */
  private def prevCode(sql: String, pos0: Int, spans: Vector[(Int, Int)]): Int = {
    var i = pos0 - 1
    var scanning = true
    while (i >= 0 && scanning) {
      spans.find(s => i >= s._1 && i < s._2) match {
        case Some((s, _)) => i = s - 1
        case None if sql.charAt(i).isWhitespace => i -= 1
        case None => scanning = false
      }
    }
    i
  }

  /** The index of the '*' this modifier word directly follows, or -1.
    *
    * The '*' must itself sit in SELECT-LIST position — directly after
    * `SELECT` / `DISTINCT` / `ALL` or after a list comma — or the word
    * is ordinary multiplication by a function call and passes through:
    * `SELECT x * replace(s,'a','b') FROM t` is arithmetic, not a star
    * REPLACE modifier (the '*' there follows the identifier `x`). */
  private def starBefore(sql: String, pos: Int, spans: Vector[(Int, Int)],
      evs: Vector[Ev]): Int = {
    val i = prevCode(sql, pos, spans)
    if (i >= 0 && sql.charAt(i) == '*' &&
        !(prevCode(sql, i, spans) >= 0 && sql.charAt(prevCode(sql, i, spans)) == '.') &&
        inSelectListPosition(sql, i, spans, evs)) i
    else -1
  }

  /** True when the ')' event at raw index `i` closes a `DISTINCT ON
    * (...)` key list — the one parenthesized prefix DuckDB's grammar
    * puts between SELECT and the first select-list item, so a '*'
    * after it IS in list position (`SELECT DISTINCT ON (k) * EXCLUDE
    * (c)`, fuzz find r12). */
  private def closesDistinctOn(sql: String, i: Int, evs: Vector[Ev]): Boolean = {
    val ci = evs.indexWhere(e => e.kind == 2 && e.pos == i)
    if (ci < 0) return false
    var oi = ci - 1
    while (oi >= 0 && !(evs(oi).kind == 1 && evs(oi).depth == evs(ci).depth))
      oi -= 1
    oi >= 2 && evs(oi - 1).kind == 0 && evs(oi - 1).up == "ON" &&
      evs(oi - 2).kind == 0 && evs(oi - 2).up == "DISTINCT"
  }

  /** True when the char before index `star` (skipping whitespace and
    * comments) is a list comma, the tail of SELECT/DISTINCT/ALL, or
    * the close of a `DISTINCT ON (...)` prefix — the only places a
    * bare select-list '*' can stand. Anything else (identifier, other
    * ')', digit, quote) means the '*' is the multiplication operator. */
  private def inSelectListPosition(sql: String, star: Int,
      spans: Vector[(Int, Int)], evs: Vector[Ev]): Boolean = {
    val i = prevCode(sql, star, spans)
    if (i < 0) return false
    val c = sql.charAt(i)
    if (c == ',') return true
    if (c == ')') return closesDistinctOn(sql, i, evs)
    if (!(c.isLetter || c == '_')) return false
    var s = i
    while (s > 0 && {
      val p = sql.charAt(s - 1); p.isLetterOrDigit || p == '_'
    }) s -= 1
    // a quoted identifier `"all"` is a column reference, not the keyword
    if (s > 0 && (sql.charAt(s - 1) == '"' || sql.charAt(s - 1) == '`'))
      return false
    val w = sql.substring(s, i + 1).toUpperCase
    w == "SELECT" || w == "DISTINCT" || w == "ALL"
  }

  /** Matching close-paren event index for the open paren at `k`. */
  private def closeOf(evs: Vector[Ev], k: Int): Int = {
    var j = k + 1
    while (j < evs.length && !(evs(j).kind == 2 && evs(j).depth == evs(k).depth)) j += 1
    if (j >= evs.length) fail("unclosed modifier list")
    j
  }

  def rewrite(sql0: String): String = {
    val up0 = sql0.toUpperCase
    if (!up0.contains("EXCLUDE") && !up0.contains("REPLACE")) return sql0
    var sql = sql0
    var more = true
    while (more) {
      val evs = events(sql)
      val spans = QualifySqlSyntax.commentSpans(sql)
      val ki = evs.indices.find { k =>
        val e = evs(k)
        e.kind == 0 && (e.up == "EXCLUDE" || e.up == "REPLACE") &&
          starBefore(sql, e.pos, spans, evs) >= 0 &&
          k + 1 < evs.length && evs(k + 1).kind == 1
      }
      ki match {
        case None => more = false
        case Some(k) =>
          val first = evs(k)
          val d = first.depth
          val starPos = starBefore(sql, first.pos, spans, evs)
          // parse [EXCLUDE (...)] [REPLACE (...)] in either presence
          var excludeCols = Seq.empty[String]
          var replaceItems = Seq.empty[String]
          var cur = k
          var groupEnd = first.pos
          var done = false
          while (!done && cur + 1 < evs.length && evs(cur).kind == 0 &&
              (evs(cur).up == "EXCLUDE" || evs(cur).up == "REPLACE") &&
              evs(cur).depth == d && evs(cur + 1).kind == 1) {
            val close = closeOf(evs, cur + 1)
            val inside = sql.substring(evs(cur + 1).end, evs(close).pos)
            if (evs(cur).up == "EXCLUDE") {
              if (excludeCols.nonEmpty) fail("duplicate EXCLUDE list")
              excludeCols = splitTop(inside)
              if (excludeCols.isEmpty) fail("empty EXCLUDE list")
            } else {
              if (replaceItems.nonEmpty) fail("duplicate REPLACE list")
              replaceItems = splitTop(inside)
              if (replaceItems.isEmpty) fail("empty REPLACE list")
            }
            groupEnd = evs(close).end
            cur = close + 1
            done = !(cur < evs.length && evs(cur).kind == 0 &&
              (evs(cur).up == "EXCLUDE" || evs(cur).up == "REPLACE"))
          }
          if (replaceItems.isEmpty) {
            // pure EXCLUDE → Spark's native * EXCEPT, one word swap
            sql = sql.substring(0, first.pos) + "EXCEPT" + sql.substring(first.end)
          } else {
            // REPLACE (± EXCLUDE) → explicit select list from the
            // FROM body's analyzed schema
            val fi = evs.indexWhere(
              e => e.kind == 0 && e.depth == d && e.up == "FROM", cur)
            if (fi < 0) fail("REPLACE needs a FROM clause to take the schema from")
            var bodyEnd = sql.length
            var j = fi + 1
            var stopped = false
            while (j < evs.length && !stopped) {
              val e = evs(j)
              if (e.kind == 2 && e.depth < d) { bodyEnd = e.pos; stopped = true }
              else if (e.kind == 0 && e.depth == d && ClauseStops.contains(e.up)) {
                bodyEnd = e.pos; stopped = true
              }
              j += 1
            }
            val body = sql.substring(evs(fi).end, bodyEnd).trim
            if (body.isEmpty) fail("empty FROM body")
            val session = SparkSession.getActiveSession.getOrElse(
              fail("no active SparkSession to resolve the star schema on"))
            // the FROM body may reference CTEs of the statement's own
            // WITH prelude (fuzz P4 find, r13: `WITH c AS (...) SELECT
            // * REPLACE (...) FROM c` probed a bare `SELECT * FROM c`);
            // prepend every complete CTE definition that CLOSES before
            // this star group so the probe binds in the same scope —
            // covers both the post-prelude statement body and a star
            // inside a LATER CTE referencing an earlier one
            val priorCtes = PivotSqlSyntax.withCteDefs(sql, evs)
              .filter { case (_, endIdx) => evs(endIdx - 1).end <= first.pos }
            val preludeSql =
              if (priorCtes.isEmpty) ""
              else sql.substring(0, evs(priorCtes.last._2 - 1).end) + "\n"
            val fields = session.sql(s"${preludeSql}SELECT * FROM $body")
              .schema.fieldNames.toSeq
            val excl = excludeCols.map(c => stripQuote(c).toLowerCase).toSet
            excl.foreach { c =>
              if (!fields.exists(_.toLowerCase == c))
                fail(s"EXCLUDE column '$c' not found in the FROM schema")
            }
            val repl = replaceItems.map { item =>
              val ievs = events(item)
              val ai = ievs.lastIndexWhere(e => e.kind == 0 && e.depth == 0 && e.up == "AS")
              if (ai < 0 || ai + 1 >= ievs.length || ievs(ai + 1).kind != 0)
                fail(s"REPLACE item needs 'expr AS column': $item")
              val name = item.substring(ievs(ai + 1).pos - 0, ievs(ai + 1).end - 0)
              val expr = item.substring(0, ievs(ai).pos).trim
              stripQuote(name).toLowerCase -> expr
            }.toMap
            if (repl.size != replaceItems.size) fail("duplicate REPLACE column")
            repl.keys.foreach { c =>
              if (!fields.exists(_.toLowerCase == c))
                fail(s"REPLACE column '$c' not found in the FROM schema")
            }
            // newlines around user expressions: a REPLACE item ending
            // in a `--` line comment must not swallow the `) AS col`
            // or the clause that follows the expanded list
            val list = fields
              .filterNot(f => excl.contains(f.toLowerCase))
              .map { f =>
                val q = "`" + f.replace("`", "``") + "`"
                repl.get(f.toLowerCase).fold(q)(e => s"($e\n) AS $q")
              }
            if (list.isEmpty) fail("the star group excludes every column")
            sql = sql.substring(0, starPos) + list.mkString(", ") +
              "\n" + sql.substring(groupEnd)
          }
      }
    }
    sql
  }

  private def stripQuote(s0: String): String = {
    val s = s0.trim
    if (s.length >= 2 && (s.head == '"' && s.last == '"' ||
        s.head == '`' && s.last == '`')) s.substring(1, s.length - 1)
    else s
  }
}

/** DuckDB FROM-first syntax — the seventh grammar extension:
  *
  * {{{
  * FROM orders SELECT o_orderkey, o_totalprice
  * WHERE o_totalprice > 100000 ORDER BY o_orderkey
  * -- and the bare form:
  * FROM orders WHERE o_orderkey = 7
  * }}}
  *
  * Purely lexical: `FROM <body> SELECT <list> <tail>` becomes
  * `SELECT <list> FROM <body> <tail>`; without a SELECT clause the
  * statement gains `SELECT * ` in front (the body and every trailing
  * clause stay verbatim). Statement-position detection as for PIVOT —
  * the word FROM only starts this form at statement start or directly
  * after `(` , so every ordinary query passes through untouched.
  * A SELECT appearing after other clauses (DuckDB permits a few exotic
  * permutations) is not recognized — the stock parser then reports its
  * ordinary syntax error, never a silent misread.
  */
object FromFirstSqlSyntax {
  import QualifySqlSyntax.events

  private val ClauseStops = Set("WHERE", "GROUP", "HAVING", "WINDOW",
    "QUALIFY", "ORDER", "LIMIT", "OFFSET", "FETCH",
    "UNION", "INTERSECT", "EXCEPT", "MINUS")

  def rewrite(sql0: String): String = {
    if (!sql0.toUpperCase.contains("FROM")) return sql0
    var sql = sql0
    var more = true
    while (more) {
      val evs = events(sql)
      // DuckDB admits the FROM-first body after a WITH prelude too
      // (`WITH c AS (...) FROM c SELECT ...` — probe-verified, r12);
      // a regular post-prelude statement starts with SELECT/VALUES, so
      // a FROM exactly AT the prelude end is unambiguous
      val prelude = PivotSqlSyntax.withPreludeEnd(sql, evs)
      val ki = evs.indices.find { k =>
        val e = evs(k)
        e.kind == 0 && e.up == "FROM" &&
          (k == 0 || evs(k - 1).kind == 1 || prelude.contains(k) ||
            QualifySqlSyntax.afterSetOp(evs, k))
      }
      ki match {
        case None => more = false
        case Some(k) =>
          val frm = evs(k)
          val d = frm.depth
          var bodyEnd = sql.length
          var selIdx = -1
          var j = k + 1
          var stopped = false
          while (j < evs.length && !stopped) {
            val e = evs(j)
            if (e.kind == 2 && e.depth < d) { bodyEnd = e.pos; stopped = true }
            else if (e.kind == 0 && e.depth == d && e.up == "SELECT") {
              bodyEnd = e.pos; selIdx = j; stopped = true
            } else if (e.kind == 0 && e.depth == d && ClauseStops.contains(e.up)) {
              bodyEnd = e.pos; stopped = true
            }
            j += 1
          }
          val body = sql.substring(frm.end, bodyEnd).trim
          if (selIdx < 0) {
            // bare form: prefix SELECT *, everything else verbatim
            sql = sql.substring(0, frm.pos) + "SELECT * " + sql.substring(frm.pos)
          } else {
            // find the select list's end (next clause at depth d)
            val sel = evs(selIdx)
            var listEnd = sql.length
            var t = selIdx + 1
            var stop2 = false
            while (t < evs.length && !stop2) {
              val e = evs(t)
              if (e.kind == 2 && e.depth < d) { listEnd = e.pos; stop2 = true }
              else if (e.kind == 0 && e.depth == d && ClauseStops.contains(e.up)) {
                listEnd = e.pos; stop2 = true
              }
              t += 1
            }
            // newline before FROM: a select list ENDING in a `--` line
            // comment would otherwise swallow the appended clause (the
            // statement then parses as a FROM-less SELECT — caught by
            // the o28 adversarial gate)
            val list = sql.substring(sel.end, listEnd).trim
            sql = sql.substring(0, frm.pos) + s"SELECT $list\nFROM $body\n" +
              sql.substring(listEnd)
          }
      }
    }
    sql
  }
}
