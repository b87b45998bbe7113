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
    * closing). Strings, quoted identifiers and comments emit nothing.
    * Shared with [[DistinctOnSqlSyntax]]. */
  private[plans] final case class Ev(kind: Int, pos: Int, end: Int, depth: Int, up: String)

  private[plans] def events(sql: String): Vector[Ev] = scan(sql)

  /** `[start, end)` spans of `--` and `/* */` comments (hints included
    * — a hint IS a block comment), string-literal- and quoted-
    * identifier-aware like [[scan]]. For the rewriters' BACKWARD
    * character scans: [[events]] emits nothing inside a comment, so a
    * raw `charAt` walk (e.g. "is this '*' directly after SELECT?")
    * would read comment text as code —
    * `SELECT /*+ BROADCAST(t) */ * EXCLUDE (c)` must still see SELECT. */
  private[plans] def commentSpans(sql: String): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
      } else if (c == '"' || c == '`') {
        i += 1; while (i < n && sql.charAt(i) != c) i += 1
        if (i < n) i += 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val s = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        out += ((s, i)) // the terminating newline is ordinary whitespace
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val s = i
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += ((s, i))
      } else i += 1
    }
    out.result()
  }

  /** The text with comments, string literals and quoted identifiers
    * blanked to spaces — for shape checks that must see CODE only
    * (e.g. "is this select item a star glob?"). Length-preserving. */
  private[plans] def codeText(sql: String): String = {
    val out = sql.toCharArray
    val n = sql.length
    def blank(from: Int, until: Int): Unit = {
      var k = from; while (k < until) { out(k) = ' '; k += 1 }
    }
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val s = i; i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        blank(s, i)
      } else if (c == '"' || c == '`') {
        val s = i; i += 1; while (i < n && sql.charAt(i) != c) i += 1
        if (i < n) i += 1
        blank(s, i)
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val s = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        blank(s, i)
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val s = i; i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        blank(s, i)
      } else i += 1
    }
    new String(out)
  }

  /** One select-list item with its trailing output alias (explicit `AS
    * a` or the implicit trailing-identifier form) stripped — the item's
    * VALUE expression, which is what ORDER BY ALL sorts by. Items
    * without an alias come back trimmed and unchanged. Same recognition
    * rules as [[selectListAliases]]. */
  private[plans] def stripSelectAlias(item: String): String = {
    val evs = events(item)
    val dotted = dottedIdx(item)
    val spans = commentSpans(item)
    def wsBetween(a: Ev, b: Ev): Boolean = {
      val base = a.end
      item.substring(a.end, b.pos).indices.forall(i =>
        item.charAt(base + i).isWhitespace ||
          spans.exists(s => base + i >= s._1 && base + i < s._2))
    }
    val lastWord = evs.lastIndexWhere(_.kind == 0)
    if (lastWord <= 0) return item.trim
    val e = evs(lastWord)
    val isTail = lastWord == evs.length - 1 ||
      item.substring(e.end).forall(c => c.isWhitespace)
    val prev = evs(lastWord - 1)
    val explicit = prev.kind == 0 && prev.up == "AS" && wsBetween(prev, e)
    val implicitAlias = (prev.kind == 0 || prev.kind == 2) &&
      !dotted.contains(lastWord) && prev.up != "AS" &&
      !(prev.kind == 0 && OperandExpecting.contains(prev.up)) &&
      !ExprKeywords.contains(e.up) && !e.up.matches("\\d+") &&
      wsBetween(prev, e)
    if (e.depth == 0 && isTail && !e.up.matches("\\d+") &&
        (explicit || implicitAlias))
      item.substring(0, if (explicit) prev.pos else e.pos).trim
    else item.trim
  }

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

  /** Split one ORDER BY item into (expression text, trailing direction
    * modifiers). Comment-aware on both sides (r11 advisor): quoted
    * identifiers, literals and operators emit NO events, so "content
    * before position p" is checked on the raw text — `ORDER BY
    * "Weird Col" DESC` has only the DESC event, and a bare column
    * legally named `first`/`desc` has only a Mods-word event; neither
    * may be stripped down to an empty expression. Shared by the
    * DISTINCT ON and QUALIFY hidden-sort-key materializers. */
  private[plans] def splitOrderItem(item: String,
      failF: String => Nothing): (String, String) = {
    val Mods = Set("ASC", "DESC", "NULLS", "FIRST", "LAST")
    val ievs = events(item)
    val ispans = commentSpans(item)
    def contentBefore(p: Int): Boolean = {
      var c = 0
      var found = false
      while (c < p && !found) {
        if (!item.charAt(c).isWhitespace &&
            !ispans.exists(s => s._1 <= c && c < s._2)) found = true
        c += 1
      }
      found
    }
    var e = ievs.length
    while (e > 0 && ievs(e - 1).kind == 0 && Mods.contains(ievs(e - 1).up) &&
           (e > 1 || contentBefore(ievs(0).pos))) e -= 1
    if (e == 0 && !contentBefore(item.length))
      failF(s"ORDER BY item has no expression: $item")
    val exprEnd = if (e == ievs.length) item.length else ievs(e).pos
    (item.substring(0, exprEnd).trim, item.substring(exprEnd).trim)
  }

  /** Does this ORDER BY expression contain a QUALIFIED column chain
    * (`t.c`)? Checked on events so literals/comments can't fake one,
    * and the left word must not be numeric (`1.5` is a literal, its
    * digit runs ARE word events). A qualified ref cannot be a
    * select-list alias, so materializing it inside the wrap is always
    * semantics-preserving — unqualified items stay outside untouched
    * (an alias there must keep resolving against the OUTPUT list). */
  /** Event indices that participate in a dotted `a.b` word pair — the
    * comment-blanked gap between the two word events trims to exactly a
    * dot. Both sides of each pair are included. */
  private[plans] def dottedIdx(expr: String): Set[Int] = {
    val evs = events(expr)
    val spans = commentSpans(expr)
    def dotBetween(a: Ev, b: Ev): Boolean = {
      val span = expr.substring(a.end, b.pos)
      val base = a.end
      span.indices.map(i =>
        if (spans.exists(s => base + i >= s._1 && base + i < s._2)) ' '
        else span.charAt(i)).mkString.trim == "."
    }
    (0 until evs.length - 1).iterator.filter { k =>
      evs(k).kind == 0 && evs(k + 1).kind == 0 && dotBetween(evs(k), evs(k + 1))
    }.flatMap(k => Iterator(k, k + 1)).toSet
  }

  private[plans] def hasQualifiedRef(expr: String): Boolean = {
    val evs = events(expr)
    val spans = commentSpans(expr)
    def dotBetween(a: Ev, b: Ev): Boolean = {
      val span = expr.substring(a.end, b.pos)
      val base = a.end
      span.indices.map(i =>
        if (spans.exists(s => base + i >= s._1 && base + i < s._2)) ' '
        else span.charAt(i)).mkString.trim == "."
    }
    (0 until evs.length - 1).exists { k =>
      evs(k).kind == 0 && !evs(k).up.matches("\\d+") &&
        evs(k + 1).kind == 0 && dotBetween(evs(k), evs(k + 1))
    }
  }

  /** Is the word event at `k` a SET OPERATION? UNION / INTERSECT /
    * MINUS always are; EXCEPT is ambiguous with Spark's select-list
    * `* EXCEPT (cols)` — that form's paren holds a COLUMN LIST, never a
    * query, so EXCEPT-before-`(` is a set operation only when the first
    * word inside the paren opens a query (fuzz P7). */
  private[plans] def isSetOp(evs: Vector[Ev], k: Int): Boolean = {
    val e = evs(k)
    e.kind == 0 && (e.up match {
      case "UNION" | "INTERSECT" | "MINUS" => true
      case "EXCEPT" =>
        evs.lift(k + 1) match {
          case Some(n) if n.kind == 0 => true // EXCEPT ALL|DISTINCT|SELECT|FROM …
          case Some(n) if n.kind == 1 =>
            val w = evs.indexWhere(x => x.kind == 0, k + 2)
            w >= 0 && Set("SELECT", "FROM", "WITH", "VALUES", "TABLE",
              "PIVOT", "UNPIVOT").contains(evs(w).up)
          case _ => false
        }
      case _ => false
    })
  }

  /** Is event `k` positioned directly after a set-operation marker
    * (UNION / INTERSECT / EXCEPT / MINUS, optionally followed by
    * ALL|DISTINCT) at its own depth — i.e. at the START of a compound's
    * next arm? DuckDB admits its statement forms (FROM-first, PIVOT,
    * UNPIVOT) there, a position the start-of-statement/after-paren/
    * prelude-end triggers miss (fuzz P7). */
  private[plans] def afterSetOp(evs: Vector[Ev], k: Int): Boolean = {
    if (k == 0) return false
    val p = evs(k - 1)
    if (p.kind != 0 || p.depth != evs(k).depth) false
    else if ((p.up == "ALL" || p.up == "DISTINCT") && k >= 2)
      evs(k - 2).kind == 0 && evs(k - 2).depth == p.depth && isSetOp(evs, k - 2)
    else isSetOp(evs, k - 1)
  }

  /** Is the block whose events sit at depth `depth` around index `at`
    * an ARM of a set-operation compound? Scans only the block's own
    * PAREN GROUP (same depth alone is not enough — a sibling subquery
    * elsewhere in the statement can carry a UNION at the same depth):
    * the group spans from the enclosing `(` to its `)`, or the whole
    * statement at depth 0. A trailing ORDER BY after any such compound
    * belongs to the COMPOUND, not to an arm — both engines (DuckDB
    * probed: the arm's DISTINCT ON pick ignores it; `ORDER BY x UNION`
    * is a parse error). */
  private[plans] def inSetOpCompound(evs: Vector[Ev], at: Int, depth: Int): Boolean = {
    var lo = at
    while (lo > 0 && !(evs(lo - 1).kind == 1 && evs(lo - 1).depth == depth - 1)) lo -= 1
    var hi = at
    while (hi < evs.length && !(evs(hi).kind == 2 && evs(hi).depth == depth - 1)) hi += 1
    (lo until hi).exists(k => evs(k).depth == depth && isSetOp(evs, k))
  }

  /** Words that appear bare inside expressions without naming a column. */
  private val ExprKeywords = Set(
    "CASE", "WHEN", "THEN", "ELSE", "END", "AND", "OR", "NOT", "NULL",
    "IS", "IN", "LIKE", "ILIKE", "RLIKE", "ESCAPE", "BETWEEN", "ASC",
    "DESC", "NULLS", "FIRST", "LAST", "TRUE", "FALSE", "AS", "INTERVAL",
    "DISTINCT", "OVER", "PARTITION", "BY", "ORDER", "ROWS", "RANGE",
    "PRECEDING", "FOLLOWING", "UNBOUNDED", "CURRENT", "ROW", "FILTER",
    "WHERE", "EXISTS", "ANY", "ALL", "SOME", "DIV")

  /** Keywords after which a bare word is that keyword's OPERAND, never
    * an implicit output alias (`a AND b` is one expression; `b` is not
    * an alias of `a AND`). Expression-ENDING keywords (END, NULL, TRUE,
    * FALSE …) stay out — `CASE … END x` aliases x legally. */
  private val OperandExpecting = Set(
    "AND", "OR", "NOT", "IS", "IN", "LIKE", "ILIKE", "RLIKE", "ESCAPE",
    "BETWEEN", "WHEN", "THEN", "ELSE", "CASE", "AS", "INTERVAL",
    "DISTINCT", "OVER", "PARTITION", "BY", "ORDER", "WHERE", "EXISTS",
    "ANY", "ALL", "SOME", "DIV")

  /** Bare (unqualified) identifier words of an expression: word events
    * outside every dotted pair, non-numeric, not a keyword, and not a
    * function name (directly followed by `(`). Uppercased. */
  private[plans] def bareIdents(expr: String): Set[String] = {
    val evs = events(expr)
    val dotted = dottedIdx(expr)
    evs.indices.iterator.filter { k =>
      val e = evs(k)
      e.kind == 0 && !dotted.contains(k) && !e.up.matches("\\d+") &&
        !ExprKeywords.contains(e.up) &&
        !(k + 1 < evs.length && evs(k + 1).kind == 1 &&
          expr.substring(e.end, evs(k + 1).pos).trim.isEmpty)
    }.map(evs(_).up).toSet
  }

  /** Output-column aliases a select list declares: explicit `AS a` plus
    * the implicit trailing-identifier form `expr a`. Bare single-word
    * items are NOT aliases (output name == input name — no resolution
    * divergence possible). Uppercased. */
  private[plans] def selectListAliases(selList: String): Set[String] = {
    PivotSqlSyntax.splitTop(selList).iterator.flatMap { item =>
      val evs = events(item)
      val dotted = dottedIdx(item)
      val spans = commentSpans(item)
      def wsBetween(a: Ev, b: Ev): Boolean = {
        val base = a.end
        item.substring(a.end, b.pos).indices.forall(i =>
          item.charAt(base + i).isWhitespace ||
            spans.exists(s => base + i >= s._1 && base + i < s._2))
      }
      val lastWord = evs.lastIndexWhere(_.kind == 0)
      if (lastWord <= 0) Iterator.empty
      else {
        val e = evs(lastWord)
        val isTail = lastWord == evs.length - 1 ||
          item.substring(e.end).forall(c => c.isWhitespace)
        val prev = evs(lastWord - 1)
        val explicit = prev.kind == 0 && prev.up == "AS" && wsBetween(prev, e)
        val implicitAlias = (prev.kind == 0 || prev.kind == 2) &&
          !dotted.contains(lastWord) && prev.up != "AS" &&
          !(prev.kind == 0 && OperandExpecting.contains(prev.up)) &&
          !ExprKeywords.contains(e.up) && !e.up.matches("\\d+") &&
          wsBetween(prev, e)
        if (e.depth == 0 && isTail && !e.up.matches("\\d+") &&
            (explicit || implicitAlias)) Iterator(e.up)
        else Iterator.empty
      }
    }.toSet
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
        // GROUP BY ALL in the same block (r13 soak find): the wrap adds
        // the predicate column to the select list BEFORE Spark resolves
        // ALL, so the injected item changes what ALL groups by — a
        // window-over-plain-column predicate then fails with a baffling
        // UNSUPPORTED_EXPR error, and a plain-expression predicate over
        // a non-grouped column would silently WIDEN the grouping.
        // DuckDB refuses the combination outright ("Combining QUALIFY
        // with GROUP BY ALL is not supported yet") — match it.
        var g = fi + 1
        while (g < qi) {
          if (evs(g).kind == 0 && evs(g).depth == q.depth && evs(g).up == "GROUP" &&
              g + 2 < evs.length && evs(g + 1).kind == 0 && evs(g + 1).up == "BY" &&
              evs(g + 2).kind == 0 && evs(g + 2).up == "ALL")
            fail("QUALIFY with GROUP BY ALL is not supported (DuckDB refuses " +
              "this combination too): the injected predicate column would " +
              "change what ALL groups by — spell the GROUP BY columns " +
              "explicitly")
          g += 1
        }
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
        // HIDDEN QUALIFIED SORT KEYS (fuzz find r12): an ORDER BY after
        // QUALIFY may reference a table-qualified column (`t.c` over an
        // ASOF/plain join) — legal in DuckDB, where QUALIFY is one
        // SELECT, but the wrap's subquery alias hides `t`. Each such
        // item is materialized as a helper column INSIDE the wrap (a
        // qualified ref can never be a select-list alias, so inner
        // resolution is exact) and the outer sort uses the helper with
        // the item's direction modifiers; unqualified items stay
        // outside untouched, where aliases keep resolving against the
        // output list. When nothing qualifies, the statement text is
        // byte-identical to the pre-r12 rewrite.
        val oi = evs.indexWhere(e =>
          e.pos == predEnd && e.kind == 0 && e.up == "ORDER" &&
            e.depth == q.depth)
        val ordInfo =
          if (oi >= 0 && oi + 1 < evs.length && evs(oi + 1).kind == 0 &&
              evs(oi + 1).up == "BY") {
            var ordEnd = sql.length
            var t = oi + 2
            var stopped = false
            while (t < evs.length && !stopped) {
              val e = evs(t)
              if (e.kind == 2 && e.depth < q.depth) { ordEnd = e.pos; stopped = true }
              else if (e.kind == 0 && e.depth == q.depth &&
                  e.up != "ORDER" && StopWords.contains(e.up)) {
                ordEnd = e.pos; stopped = true
              }
              t += 1
            }
            val ord = sql.substring(evs(oi + 1).end, ordEnd).trim
            if (ord.isEmpty) fail("empty ORDER BY list")
            Some((ordEnd, PivotSqlSyntax.splitTop(ord)))
          } else None
        // SET-OPERATION ARM (fuzz P7): when this QUALIFY block is an
        // unparenthesized arm of a compound, the trailing ORDER BY
        // belongs to the WHOLE compound — materializing its qualified
        // items as helper columns INSIDE this arm would emit an outer
        // sort on a column the compound's output doesn't carry. Leave
        // the tail untouched (the wrap itself is arm-local and
        // correct); a qualified-ref compound sort is refused loudly —
        // it can only resolve inside one arm.
        val ordInfoFinal =
          if (ordInfo.isEmpty || !inSetOpCompound(evs, qi, q.depth)) ordInfo
          else {
            ordInfo.get._2.foreach { item =>
              val (expr, _) = splitOrderItem(item, fail)
              if (hasQualifiedRef(expr))
                fail(s"ORDER BY item '${item.trim}' references a table-" +
                  "qualified column, but this QUALIFY block is an arm of a " +
                  "set operation — the trailing ORDER BY sorts the whole " +
                  "compound, where table qualifiers don't resolve; sort by " +
                  "output columns, or parenthesize the arm with its own " +
                  "ORDER BY")
            }
            None
          }
        lazy val aliases = selectListAliases(sql.substring(sel.end, frm.pos))
        val parts = ordInfoFinal.map(_._2.zipWithIndex.map { case (item, i) =>
          val (expr, mods) = splitOrderItem(item, fail)
          if (hasQualifiedRef(expr)) {
            // MIXED REFERENCES (r12 advisor): materializing the item
            // inside the wrap moves any select-list-alias word in it
            // from output-list resolution (DuckDB single-block ORDER BY)
            // to base-table resolution — if the base tables also carry
            // that name, the sort key silently diverges. Refuse loudly.
            val mixed = bareIdents(expr).intersect(aliases)
            if (mixed.nonEmpty)
              fail(s"ORDER BY item '${item.trim}' mixes a table-qualified " +
                s"column with select-list alias${if (mixed.size > 1) "es" else ""} " +
                s"${mixed.toSeq.sorted.mkString(", ")} — the QUALIFY wrap would " +
                "resolve the alias against the base tables instead of the " +
                "output list; use only base columns or only output aliases " +
                "in this sort item")
            val h = s"__graft_qord_${idx}_$i"
            (Some((s", ($expr\n) AS $h\n", h)),
              if (mods.isEmpty) h else s"$h $mods")
          } else (None, item.trim)
        }).getOrElse(Seq.empty)
        val helpers = parts.flatMap(_._1)
        // newline BEFORE each generated continuation: user text ending
        // in a `--` line comment (select list, FROM body, predicate)
        // would otherwise swallow the injected syntax; "\n, " joints in
        // the re-emitted ORDER BY for the same reason (r11 advisor)
        if (helpers.isEmpty)
          sql = sql.substring(0, sel.pos) +
            s"SELECT * EXCEPT ($qcol) FROM (SELECT " +
            sql.substring(sel.end, frm.pos).trim + s"\n, ($pred\n) AS $qcol\n" +
            sql.substring(frm.pos, q.pos).trim + s"\n) $alias WHERE $qcol " +
            sql.substring(predEnd)
        else
          sql = sql.substring(0, sel.pos) +
            s"SELECT * EXCEPT (${(qcol +: helpers.map(_._2)).mkString(", ")}) FROM (SELECT " +
            sql.substring(sel.end, frm.pos).trim + s"\n, ($pred\n) AS $qcol\n" +
            helpers.map(_._1).mkString +
            sql.substring(frm.pos, q.pos).trim + s"\n) $alias WHERE $qcol " +
            s"ORDER BY ${parts.map(_._2).mkString("\n, ")}\n" +
            sql.substring(ordInfoFinal.get._1)
        idx += 1
      }
    }
    sql
  }
}

/** SQL `DISTINCT ON` — the third grammar extension on the
  * [[GraftSqlParser]] channel (Postgres/DuckDB dialect; stock Spark has
  * no spelling for "first row per key" short of writing the window
  * yourself):
  *
  * {{{
  * SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
  * FROM orders
  * ORDER BY o_custkey, o_orderdate DESC, o_orderkey
  * }}}
  *
  * Rewrite (source-to-source, no analyzer cooperation):
  *
  * {{{
  * SELECT DISTINCT ON (<keys>) <sl> FROM <body> ORDER BY <ord> <tail>
  *   ⇒
  * SELECT * EXCEPT (__graft_don_N, __graft_dord_N_i...)
  * FROM (SELECT <sl>,
  *         row_number() OVER (PARTITION BY <keys> ORDER BY <ord>)
  *           AS __graft_don_N,
  *         (<ord-expr_i>) AS __graft_dord_N_i ...
  *       FROM <body>) __graft_d_N
  * WHERE __graft_don_N = 1
  * ORDER BY __graft_dord_N_i <mods_i>... <tail>
  * }}}
  *
  * — DuckDB's own definition of the clause ("keep the first row of
  * each distinct-on group under the query's ORDER BY"), so the oracle
  * runs its NATIVE DISTINCT ON against the rewrite verbatim. Catalyst
  * plans the wrap as the rn=1 filter over one Window and the
  * rank-limit pushdown applies (partial per-key top-1 below the
  * shuffle). Each ORDER BY item's expression is materialized as a
  * HELPER column inside the wrap, so the outer sort works even when
  * the sort key is not in the projection — Postgres/DuckDB's hidden-
  * sort-key semantics (`SELECT DISTINCT ON (a) a, b FROM t ORDER BY
  * a, c DESC` is legal; r11, found by the rewriter fuzz).
  *
  * Documented limits, each failing loudly: an ORDER BY is REQUIRED
  * (without it DISTINCT ON keeps an arbitrary row per key —
  * irreproducible by design, so this extension refuses it); positional
  * ordinals are rejected (inside the injected OVER() an ordinal is a
  * constant — the per-key pick would be silently arbitrary).
  */
object DistinctOnSqlSyntax {

  private val StopWords = Set("LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT", "MINUS")

  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"DISTINCT ON: $msg"))

  def rewrite(sql0: String): String = {
    if (!sql0.toUpperCase.contains("DISTINCT")) return sql0 // fast path
    var sql = sql0
    var idx = 0
    var more = true
    while (more) {
      val evs = QualifySqlSyntax.events(sql)
      // DISTINCT followed by ON followed by '(' — word events are
      // adjacent in the stream except for the paren event itself
      val di = evs.indices.find { k =>
        val e = evs(k)
        e.kind == 0 && e.up == "DISTINCT" &&
          k + 2 < evs.length &&
          evs(k + 1).kind == 0 && evs(k + 1).up == "ON" &&
          evs(k + 2).kind == 1
      }
      di match {
        case None => more = false
        case Some(k) =>
          val d = evs(k)
          // owning SELECT must be the word right before DISTINCT
          if (k == 0 || evs(k - 1).kind != 0 || evs(k - 1).up != "SELECT" ||
              evs(k - 1).depth != d.depth)
            fail("DISTINCT ON must directly follow SELECT")
          // SET-OPERATION ARM (fuzz P7): an unparenthesized arm can
          // never own the trailing ORDER BY — it sorts the WHOLE
          // compound (DuckDB-probed; `ORDER BY x UNION` is a parse
          // error in both engines), so the arm's DISTINCT ON would keep
          // an arbitrary row per key, which this extension refuses by
          // policy. Before this check, a FIRST-arm DISTINCT ON silently
          // wrapped the entire compound inside its subquery (the
          // injected window then filtered the union of all arms — wrong
          // rows whenever the arms' arities happened to line up), and a
          // LAST-arm one consumed the compound ORDER BY into helper
          // columns the compound's output doesn't carry.
          if (QualifySqlSyntax.inSetOpCompound(evs, k, d.depth))
            fail("DISTINCT ON inside a set-operation arm needs its own " +
              "ORDER BY, and a trailing ORDER BY belongs to the whole " +
              "compound (the per-key pick would be arbitrary); " +
              "parenthesize the arm: (SELECT DISTINCT ON (...) ... " +
              "ORDER BY ...) UNION ...")
          val sel = evs(k - 1)
          // matching close paren of the key list
          val openDepth = evs(k + 2).depth
          var j = k + 3
          while (j < evs.length && !(evs(j).kind == 2 && evs(j).depth == openDepth)) j += 1
          if (j >= evs.length) fail("unclosed DISTINCT ON key list")
          val keys = sql.substring(evs(k + 2).end, evs(j).pos).trim
          if (keys.isEmpty) fail("empty DISTINCT ON key list")
          val slStart = evs(j).end
          val fi = evs.indexWhere(
            e => e.kind == 0 && e.depth == d.depth && e.up == "FROM", j + 1)
          if (fi < 0) fail("the DISTINCT ON block has no FROM clause")
          val frm = evs(fi)
          // the block's own ORDER BY at the same depth (required)
          val oi = evs.indexWhere(
            e => e.kind == 0 && e.depth == d.depth && e.up == "ORDER", fi + 1)
          if (oi < 0 || evs.lift(oi + 1).forall(e => e.kind != 0 || e.up != "BY"))
            fail("an ORDER BY is required (without one, DISTINCT ON keeps an " +
              "arbitrary row per key — not reproducible)")
          val ord0 = evs(oi)
          var ordEnd = sql.length
          var t = oi + 2
          var stopped = false
          while (t < evs.length && !stopped) {
            val e = evs(t)
            if (e.kind == 2 && e.depth < d.depth) { ordEnd = e.pos; stopped = true }
            else if (e.kind == 0 && e.depth == d.depth && StopWords.contains(e.up)) {
              ordEnd = e.pos; stopped = true
            }
            t += 1
          }
          val ord0txt = sql.substring(evs(oi + 1).end, ordEnd).trim
          if (ord0txt.isEmpty) fail("empty ORDER BY list")
          // ORDER BY ALL (DuckDB): one item whose code text is the bare
          // word ALL sorts by every select-list output column, left to
          // right, with the item's direction modifiers applied to each
          // (DuckDB's `ORDER BY ALL DESC` semantics). Expanded HERE,
          // because the list is re-emitted both inside the injected
          // OVER() — where Spark's native ALL does not reach — and as
          // the outer sort. Sorting is by each item's VALUE expression
          // (aliases stripped), which equals the output column on every
          // path. Star select items would need the bound schema to
          // expand — refused loudly (spell the columns out).
          // select items, for ORDER BY ALL and ordinal expansion
          lazy val selItems =
            PivotSqlSyntax.splitTop(sql.substring(slStart, frm.pos))
          // POSITIONAL references (DuckDB, fuzz P6): an ordinal names
          // the k-th select item's VALUE expression — expanded HERE
          // because this rewrite re-emits the reference both inside the
          // injected OVER() (where an ordinal is a CONSTANT — a key of
          // `1` would partition the whole table into ONE group and
          // silently keep a single global row) and as the outer sort.
          def ordinalExpr(n: Int, where: String): String = {
            if (n < 1 || n > selItems.size)
              fail(s"$where ordinal $n out of range — the select list has " +
                s"${selItems.size} item${if (selItems.size == 1) "" else "s"}")
            val it = selItems(n - 1)
            val code = QualifySqlSyntax.codeText(it)
            if (code.matches("(?s)\\s*\\*.*") ||
                code.matches("(?s)\\s*[A-Za-z_]\\w*\\s*\\.\\s*\\*.*"))
              fail(s"$where ordinal $n points at a star select item " +
                s"('${it.trim}') — expanding it needs the bound schema; " +
                "spell the column out")
            QualifySqlSyntax.stripSelectAlias(it)
          }
          // SELECT-LIST ALIASES (DuckDB, fuzz P6): a bare word in the
          // key list or a sort item resolves against the OUTPUT list
          // first — `DISTINCT ON (p) p, -k AS k ... ORDER BY p, k`
          // sorts by -k in DuckDB. Inside the injected OVER() the same
          // word resolves against the BASE tables (silently diverging
          // when a base column shadows the alias) or dies as an
          // unsupported lateral alias reference — so alias words are
          // substituted by their item's VALUE expression here, exactly
          // like ordinals.
          lazy val aliasItem: Map[String, String] = selItems.flatMap { it =>
            QualifySqlSyntax.selectListAliases(it).headOption
              .map(_ -> QualifySqlSyntax.stripSelectAlias(it))
          }.toMap
          def substitute(expr: String, where: String): Option[String] = {
            val code = QualifySqlSyntax.codeText(expr).trim
            if (code.matches("\\d+")) Some(ordinalExpr(code.toInt, where))
            else if (code.matches("[A-Za-z_]\\w*")) aliasItem.get(code.toUpperCase)
            else None
          }
          val keyItems = PivotSqlSyntax.splitTop(keys)
          val keysExpanded = keyItems.map { kk =>
            substitute(kk, "DISTINCT ON key").map(e => s"$e\n").getOrElse(kk.trim)
          }
          // byte-compat: emit the user's text verbatim unless something
          // actually expanded (report-stability — specs pin the bytes)
          val keysEmit =
            if (keyItems.map(_.trim) == keysExpanded) keys
            else keysExpanded.mkString("\n, ")
          val ord = {
            val items0 = PivotSqlSyntax.splitTop(ord0txt)
            val isAll = items0.size == 1 && {
              val (e0, _) = QualifySqlSyntax.splitOrderItem(items0.head, fail)
              QualifySqlSyntax.codeText(e0).trim.equalsIgnoreCase("ALL")
            }
            if (!isAll) ord0txt
            else {
              val mods = QualifySqlSyntax.splitOrderItem(items0.head, fail)._2
              if (selItems.isEmpty) fail("ORDER BY ALL with an empty select list")
              val exprs = selItems.map { it =>
                val code = QualifySqlSyntax.codeText(it)
                if (code.matches("(?s)\\s*\\*.*") ||
                    code.matches("(?s)\\s*[A-Za-z_]\\w*\\s*\\.\\s*\\*.*"))
                  fail("ORDER BY ALL cannot expand a star select item " +
                    s"('${it.trim}') — spell the columns out")
                QualifySqlSyntax.stripSelectAlias(it)
              }
              // newline joints everywhere (the emitters' shared rule):
              // a select item may END in a `--` line comment (which
              // .trim de-terminated), and the distributed modifiers may
              // too — a space or ", " joint would bury the modifiers or
              // the next sort key inside the previous comment
              exprs.map(e => if (mods.isEmpty) e else s"$e\n$mods").mkString("\n, ")
            }
          }
          val dcol = s"__graft_don_$idx"
          val alias = s"__graft_d_$idx"
          // HIDDEN SORT KEYS (Postgres/DuckDB parity): the outer ORDER
          // BY may reference columns the select list DROPPED, so each
          // non-positional ORDER BY item's expression is materialized
          // as a helper column in the inner select and the outer sort
          // references the helper with the item's original direction
          // modifiers (then * EXCEPT strips the helpers). A bare
          // ordinal stays positional — the outer list has the same
          // column order, and an ordinal inside OVER() would be a
          // constant, not a position.
          // expand positional and alias items to their select-item
          // value expressions (DuckDB semantics, judge-probed: `ORDER
          // BY 2 DESC` over `k*2 AS kk` sorts by k*2, and a bare alias
          // word sorts by its item's value even over a shadowing base
          // column) — BOTH emission sites below (inner OVER, helper
          // columns) need the expansion
          val rawItems = PivotSqlSyntax.splitTop(ord)
          val items = rawItems.map { item =>
            val (expr0, mods) = QualifySqlSyntax.splitOrderItem(item, fail)
            substitute(expr0, "ORDER BY") match {
              case Some(e2) =>
                // newline joint: the expanded expression may end in a
                // de-terminated `--` comment (the emitters' shared rule)
                if (mods.isEmpty) e2 else s"$e2\n$mods"
              case None => item
            }
          }
          // byte-compat: keep the user's ORDER BY text verbatim inside
          // the OVER() unless something expanded
          val innerOrd =
            if (rawItems == items) ord else items.mkString("\n, ")
          val parts = items.zipWithIndex.map { case (item, i) =>
            val (expr, mods) = QualifySqlSyntax.splitOrderItem(item, fail)
            val h = s"__graft_dord_${idx}_$i"
            (Some(s"($expr\n) AS $h"),
              if (mods.isEmpty) h else s"$h $mods")
          }
          val helperCols = parts.flatMap(_._1)
          val helperNameList = parts.collect {
            case (Some(_), outer) => outer.split("\\s+").head
          }
          // "\n, " joint (the PIVOT emitter's newline rule): an item
          // whose direction modifiers end in a `--` line comment lost
          // its terminating newline to .trim — a ", " joint would bury
          // every later sort key inside the comment (r11 advisor, high)
          val outerOrd = parts.map(_._2).mkString("\n, ")
          // newline before each continuation: see the QUALIFY rewrite —
          // a trailing `--` comment in user text must not swallow the
          // injected syntax
          sql = sql.substring(0, sel.pos) +
            s"SELECT * EXCEPT (${(dcol +: helperNameList).mkString(", ")}) FROM (SELECT " +
            sql.substring(slStart, frm.pos).trim +
            s"\n, row_number() OVER (PARTITION BY $keysEmit\nORDER BY $innerOrd\n) AS $dcol\n" +
            helperCols.map(h => s", $h\n").mkString +
            sql.substring(frm.pos, ord0.pos).trim + s"\n) $alias " +
            s"WHERE $dcol = 1 ORDER BY $outerOrd\n" + sql.substring(ordEnd)
          idx += 1
      }
    }
    sql
  }
}
