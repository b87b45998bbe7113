package graft.plans

import org.apache.spark.sql.AnalysisException

/** SQL `QUALIFY` clause support — the second grammar extension riding
  * [[GraftSqlParser]]'s lexical-rewrite channel (the first is `ASOF
  * JOIN`, [[AsofSqlSyntax]]). With [[graft.GraftExtensions]] installed,
  * plain SQL can filter on window functions directly, in the
  * DuckDB/Snowflake/BigQuery spelling Spark's stock grammar lacks:
  *
  * {{{
  * SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
  * FROM t
  * QUALIFY rn <= 2
  * ORDER BY g, rn
  * }}}
  *
  * Unlike ASOF (marker → analyzer rule), QUALIFY needs NO analyzer
  * cooperation: the rewrite is a complete source-to-source transform —
  *
  * {{{
  * SELECT <sl> FROM <body> QUALIFY <pred> <tail>
  *   ⇒
  * SELECT * EXCEPT (__graft_qualify_N)
  * FROM (SELECT <sl>, (<pred>) AS __graft_qualify_N FROM <body>) __graft_q_N
  * WHERE __graft_qualify_N <tail>
  * }}}
  *
  * — which is exactly QUALIFY's defined semantics (filter applied AFTER
  * window computation, over the select list's own aliases). The
  * predicate column resolves select-list aliases through Spark's
  * lateral-column-alias resolution (probe-verified to cover aliases of
  * window expressions), `* EXCEPT` (stock Spark 4 syntax) removes the
  * helper column, and `<tail>` (ORDER BY / LIMIT / set-op branches)
  * stays OUTSIDE the wrap, so a trailing ORDER BY still sees every
  * user-visible column. Catalyst then plans the wrap as
  * Filter-over-Window with zero extra exchanges — the same plan a
  * native grammar rule would emit — and the filter does NOT push below
  * the Window (the predicate references the window output), so
  * semantics survive optimization.
  *
  * The scan is quote/comment/paren-aware (string literals with ''
  * escapes, double-quoted and backticked identifiers, `--` and
  * `/* */` comments, paren depth), QUALIFY clauses in subqueries are
  * rewritten independently (innermost-or-outermost order is immaterial
  * — each rewrite is local), and each documented limit fails loudly:
  *
  *   - `SELECT DISTINCT ... QUALIFY` is rejected (injecting the
  *     predicate column would change the DISTINCT key set);
  *   - a QUALIFY with no owning SELECT / no FROM / an empty predicate
  *     is rejected;
  *   - like DuckDB and Snowflake, installing the extension makes
  *     QUALIFY effectively a reserved word in query bodies — a bare
  *     column named `qualify` after FROM would be taken as the clause
  *     (quote it: `"qualify"`).
  *
  * Reference anchor: the reference engine has no SQL surface at all
  * (`icecube/core/cube.py` is a Python API); QUALIFY parity with the
  * DuckDB oracle dialect is capability beyond it, gated by
  * `o21_qualify_topk` whose oracle IS DuckDB's native QUALIFY.
  */
object QualifySqlSyntax {

  /** Keywords that terminate a QUALIFY predicate at the block's own
    * paren depth. (`EXCEPT` here is the set operation — the select-list
    * `* EXCEPT (...)` form can't appear inside a predicate.) */
  private val StopWords = Set(
    "ORDER", "LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT", "MINUS")

  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"QUALIFY: $msg"))

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** One lexical event: kind 0 = bare word (up = uppercase text),
    * kind 1 = '(' (depth = before opening), kind 2 = ')' (depth = after
    * closing). Strings, quoted identifiers and comments emit nothing. */
  private final case class Ev(kind: Int, pos: Int, end: Int, depth: Int, up: String)

  private def scan(sql: String): Vector[Ev] = {
    val evs = Vector.newBuilder[Ev]
    val n = sql.length
    var i = 0
    var depth = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal, '' escapes
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
      } else if (c == '"' || c == '`') { // quoted identifier
        i += 1; while (i < n && sql.charAt(i) != c) i += 1
        if (i < n) i += 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '(') {
        evs += Ev(1, i, i + 1, depth, "("); depth += 1; i += 1
      } else if (c == ')') {
        depth -= 1; evs += Ev(2, i, i + 1, depth, ")"); i += 1
      } else if (isWordChar(c)) {
        var k = i
        while (k < n && isWordChar(sql.charAt(k))) k += 1
        evs += Ev(0, i, k, depth, sql.substring(i, k).toUpperCase)
        i = k
      } else i += 1
    }
    evs.result()
  }

  /** Rewrite every `QUALIFY <pred>` into the subquery wrap. Each pass
    * eliminates one QUALIFY word; helper names carry a running index so
    * nested rewrites never collide. */
  def rewrite(sql0: String): String = {
    if (!sql0.toUpperCase.contains("QUALIFY")) return sql0 // fast path
    var sql = sql0
    var idx = 0
    var more = true
    while (more) {
      val evs = scan(sql)
      val qi = evs.indexWhere(e => e.kind == 0 && e.up == "QUALIFY")
      if (qi < 0) more = false
      else {
        val q = evs(qi)
        val si = evs.lastIndexWhere(
          e => e.kind == 0 && e.depth == q.depth && e.up == "SELECT", qi - 1)
        if (si < 0) fail("no SELECT owns this QUALIFY clause")
        val afterSel = evs.indexWhere(e => e.kind == 0, si + 1)
        if (afterSel >= 0 && afterSel < qi && evs(afterSel).depth == q.depth &&
            evs(afterSel).up == "DISTINCT")
          fail("SELECT DISTINCT with QUALIFY is not supported (the injected " +
            "predicate column would change the DISTINCT key set); " +
            "deduplicate in a subquery instead")
        val fi = evs.indexWhere(
          e => e.kind == 0 && e.depth == q.depth && e.up == "FROM", si + 1)
        if (fi < 0 || fi > qi) fail("the QUALIFY block has no FROM clause")
        var predEnd = sql.length
        var j = qi + 1
        var stopped = false
        while (j < evs.length && !stopped) {
          val e = evs(j)
          if (e.kind == 2 && e.depth < q.depth) { predEnd = e.pos; stopped = true }
          else if (e.kind == 0 && e.depth == q.depth && StopWords.contains(e.up)) {
            predEnd = e.pos; stopped = true
          }
          j += 1
        }
        val pred = sql.substring(q.end, predEnd).trim
        if (pred.isEmpty) fail("empty QUALIFY predicate")
        val sel = evs(si)
        val frm = evs(fi)
        val qcol = s"__graft_qualify_$idx"
        val alias = s"__graft_q_$idx"
        sql = sql.substring(0, sel.pos) +
          s"SELECT * EXCEPT ($qcol) FROM (SELECT " +
          sql.substring(sel.end, frm.pos).trim + s", ($pred) AS $qcol " +
          sql.substring(frm.pos, q.pos).trim + s") $alias WHERE $qcol " +
          sql.substring(predEnd)
        idx += 1
      }
    }
    sql
  }
}
