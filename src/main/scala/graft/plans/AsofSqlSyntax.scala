package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `ASOF JOIN` syntax for the native [[AsofJoin]] operator — the
  * parser-injection point on the extension ladder (beside the optimizer
  * rule, planner strategy, injected functions, and DSv2 connectors).
  * With [[graft.GraftExtensions]] installed, plain SQL can write the
  * DuckDB/Snowflake spelling directly:
  *
  * {{{
  * SELECT ... FROM trades t ASOF LEFT JOIN quotes q
  *   ON t.sym = q.sym AND t.us >= q.us
  * }}}
  *
  * and the plan contains [[AsofJoinExec]] — one SMJ-shaped merge pass —
  * not the union+window or bucket-explode encodings a stock session
  * would need.
  *
  * How it works (all public extension surfaces, no Spark internals
  * patched):
  *
  *   1. [[GraftSqlParser]] delegates everything to the session's default
  *      parser, but first rewrites `ASOF [LEFT] JOIN ... ON <cond>` to
  *      `JOIN ... ON graft_asof_marker('<left|inner>') AND <cond>` — a
  *      purely lexical, quote/comment/paren-aware token substitution,
  *      so the stock ANTLR grammar parses the result unmodified.
  *   2. `graft_asof_marker` resolves to [[AsofMarker]], a non-foldable
  *      boolean expression that exists only to carry the join mode
  *      through analysis (it never executes).
  *   3. [[AsofSyntaxRule]], an analyzer resolution rule, pattern-matches
  *      resolved joins whose condition carries the marker, splits the
  *      conjunction into equi-keys plus exactly ONE time inequality
  *      (`l.t >= r.t` ⇒ backward, `l.t <= r.t` ⇒ forward — the DuckDB
  *      direction convention), and replaces the Join with the native
  *      [[AsofJoin]] node. `ASOF JOIN` (inner) wraps the left-outer
  *      node in `Filter(IsNotNull(rightTime))`, which is exact because
  *      right rows with a null time never match by contract.
  *
  * Running in the ANALYZER (not the optimizer) is load-bearing: the
  * marker conjunct references neither side, so the optimizer's
  * predicate pushdown would otherwise hoist it out of the join
  * condition before a rewrite could see it; resolution rules run first.
  *
  * Documented limits (each fails loudly, never silently): the ON clause
  * must be a top-level conjunction (no OR/NOT around the join
  * predicates), time operands must already be epoch-µs longs (`>=`/`<=`
  * only — strict variants would change match semantics), and the
  * deferred-ON nesting form `a JOIN b ASOF JOIN c ON x ON y` is not
  * recognized. A marker that survives analysis anywhere else (e.g.
  * hand-written in a SELECT list) is rejected by the same rule.
  *
  * Reference anchor: the reference engine exposes as-of alignment only
  * through its Python API (`icecube/core/cube.py` temporal selection);
  * SQL-surface parity with DuckDB ASOF is capability beyond it, gated
  * by `j21_asof_sql_syntax` whose oracle IS DuckDB's native ASOF JOIN.
  */
object AsofSqlSyntax {
  def fail(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> s"ASOF JOIN: $msg"))
}

/** Boolean marker carrying the ASOF join mode ('left' | 'inner') from
  * the parser rewrite to [[AsofSyntaxRule]]. Non-foldable so constant
  * folding cannot erase it mid-analysis; it is always removed by the
  * rule and never reaches execution. */
case class AsofMarker(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_asof_marker"

  def mode: String = child match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => AsofSqlSyntax.fail(
      s"marker mode must be a string literal, got $other")
  }

  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, _ => "true")
  override protected def withNewChildInternal(newChild: Expression): AsofMarker =
    copy(child = newChild)
}

/** Delegating parser that rewrites `ASOF [LEFT] JOIN ... ON` into a
  * marker-carrying stock join before the default parser runs, then
  * applies the [[QualifySqlSyntax]] `QUALIFY` rewrite (both are
  * independent local transforms; order is immaterial). The ASOF
  * rewrite is lexical but quote-aware: string literals (with ''
  * escapes), double-quoted and backticked identifiers, `--` and
  * `/* */` comments pass through untouched, and paren depth is tracked
  * so an ON inside a joined subquery never consumes an outer ASOF. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def rewriteAll(sqlText: String): String =
    QualifySqlSyntax.rewrite(
      DistinctOnSqlSyntax.rewrite(GraftSqlParser.rewrite(
        StarSqlSyntax.rewrite(FromFirstSqlSyntax.rewrite(
          UnpivotSqlSyntax.rewrite(PivotSqlSyntax.rewrite(sqlText)))))))

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewriteAll(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteAll(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Rewrite `ASOF [LEFT] JOIN ... ON cond` →
    * `JOIN ... ON graft_asof_marker('mode') AND cond`. */
  private[plans] def rewrite(sql: String): String = {
    if (!sql.toUpperCase.contains("ASOF")) return sql // fast path
    // java.lang.StringBuilder: the (CharSequence, start, end) append —
    // scala's StringBuilder lacks that overload and would auto-tuple
    val out = new java.lang.StringBuilder(sql.length + 64)
    val n = sql.length
    var i = 0
    var depth = 0
    // per-paren-depth FIFO of pending ASOF modes awaiting their ON
    val pending = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Queue[String]]
    // whitespace AND comments: `ASOF /* c */ JOIN` must still read as an
    // ASOF join — with a raw whitespace skip the lookahead missed JOIN,
    // the word ASOF passed through as an IDENTIFIER, and Spark silently
    // parsed it as a table alias over a plain inner join (fuzz find
    // r11). Comments inside the consumed ASOF..JOIN span are dropped
    // with it.
    def skipWs(k0: Int): Int = {
      var k = k0
      var more = true
      while (more) {
        more = false
        while (k < n && sql.charAt(k).isWhitespace) k += 1
        if (k + 1 < n && sql.charAt(k) == '-' && sql.charAt(k + 1) == '-') {
          while (k < n && sql.charAt(k) != '\n') k += 1
          more = true
        } else if (k + 1 < n && sql.charAt(k) == '/' && sql.charAt(k + 1) == '*') {
          k += 2
          while (k + 1 < n && !(sql.charAt(k) == '*' && sql.charAt(k + 1) == '/')) k += 1
          k = math.min(n, k + 2)
          more = true
        }
      }
      k
    }
    def wordEnd(k0: Int): Int = {
      var k = k0; while (k < n && isWordChar(sql.charAt(k))) k += 1; k
    }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // string literal, '' escapes
        val start = i; i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out.append(sql, start, i)
      } else if (c == '"' || c == '`') { // quoted identifier
        val start = i; i += 1
        while (i < n && sql.charAt(i) != c) i += 1
        if (i < n) i += 1
        out.append(sql, start, i)
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val start = i
        while (i < n && sql.charAt(i) != '\n') i += 1
        out.append(sql, start, i)
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val start = i; i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out.append(sql, start, i)
      } else if (c == '(') {
        depth += 1; out.append(c); i += 1
      } else if (c == ')') {
        pending.remove(depth) // an ASOF opened inside these parens is dead
        depth -= 1; out.append(c); i += 1
      } else if (isWordChar(c)) {
        val end = wordEnd(i)
        val word = sql.substring(i, end)
        val up = word.toUpperCase
        if (up == "ASOF") {
          // lookahead for [LEFT] JOIN; otherwise ASOF is an identifier
          var mode = "inner"
          var k = skipWs(end)
          var e = wordEnd(k)
          var w2 = sql.substring(k, e).toUpperCase
          if (w2 == "LEFT") {
            mode = "left"; k = skipWs(e); e = wordEnd(k)
            w2 = sql.substring(k, e).toUpperCase
          }
          if (w2 == "JOIN") {
            out.append("JOIN") // mode travels in the marker, not the join type
            pending.getOrElseUpdate(depth,
              scala.collection.mutable.Queue.empty).enqueue(mode)
            i = e
          } else { out.append(word); i = end }
        } else if (up == "ON" && pending.get(depth).exists(_.nonEmpty)) {
          val mode = pending(depth).dequeue()
          out.append(s"ON graft_asof_marker('$mode') AND")
          i = end
        } else if (up == "USING" && pending.get(depth).exists(_.nonEmpty)) {
          // ASOF JOIN ... USING (k): the marker has no ON to ride, and
          // leaving it queued would inject into the NEXT unrelated ON at
          // this depth (silently converting the wrong join). Fail loudly
          // like the other documented limits.
          AsofSqlSyntax.fail("USING is not supported after ASOF JOIN — " +
            "spell the condition with ON (equi-keys plus one >=/<= time " +
            "inequality)")
        } else { out.append(word); i = end }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

/** Analyzer rule: resolved Join carrying [[AsofMarker]] → native
  * [[AsofJoin]] (+ IsNotNull filter for inner mode). Any marker the
  * rule cannot convert fails analysis loudly. */
object AsofSyntaxRule extends Rule[LogicalPlan] with PredicateHelper {

  private def containsMarker(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AsofMarker])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val converted = plan.transformUp {
      case j @ Join(l, r, _, Some(cond), _)
          if j.resolved && containsMarker(cond) => convert(l, r, cond)
    }
    // a marker anywhere else in a fully-resolved plan is user error
    if (converted.resolved) converted.foreach { node =>
      if (!node.isInstanceOf[Join] && node.expressions.exists(containsMarker))
        AsofSqlSyntax.fail(
          "graft_asof_marker is internal to ASOF JOIN rewriting and cannot " +
            s"be used elsewhere (found in ${node.nodeName})")
    }
    converted
  }

  private def convert(l: LogicalPlan, r: LogicalPlan,
      cond: Expression): LogicalPlan = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsofMarker])
    if (rest.exists(containsMarker) || markers.size != 1)
      AsofSqlSyntax.fail("the ON clause must be a top-level conjunction of " +
        "equi-predicates and one time inequality (no OR/NOT)")
    val mode = markers.head.asInstanceOf[AsofMarker].mode

    val leftOut = l.outputSet
    val rightOut = r.outputSet
    // 0 = left-only, 1 = right-only, -1 = mixed/neither
    def side(e: Expression): Int =
      if (e.references.isEmpty) -1
      else if (e.references.subsetOf(leftOut)) 0
      else if (e.references.subsetOf(rightOut)) 1
      else -1

    val eqL = Seq.newBuilder[Expression]
    val eqR = Seq.newBuilder[Expression]
    var time: Option[(Expression, Expression, String)] = None
    def setTime(lt: Expression, rt: Expression, strategy: String): Unit = {
      if (time.isDefined)
        AsofSqlSyntax.fail("exactly one time inequality is allowed")
      if (lt.dataType != LongType || rt.dataType != LongType)
        AsofSqlSyntax.fail("time operands must be LongType (epoch-µs) — " +
          s"got ${lt.dataType.simpleString} and ${rt.dataType.simpleString}; " +
          "cast timestamps with unix_micros(...)")
      time = Some((lt, rt, strategy))
    }
    rest.foreach {
      case EqualTo(a, b) if side(a) == 0 && side(b) == 1 => eqL += a; eqR += b
      case EqualTo(a, b) if side(a) == 1 && side(b) == 0 => eqL += b; eqR += a
      case GreaterThanOrEqual(a, b) if side(a) == 0 && side(b) == 1 =>
        setTime(a, b, "backward")
      case GreaterThanOrEqual(a, b) if side(a) == 1 && side(b) == 0 =>
        setTime(b, a, "forward") // r.t >= l.t ⟺ l.t <= r.t
      case LessThanOrEqual(a, b) if side(a) == 0 && side(b) == 1 =>
        setTime(a, b, "forward")
      case LessThanOrEqual(a, b) if side(a) == 1 && side(b) == 0 =>
        setTime(b, a, "backward")
      case other => AsofSqlSyntax.fail(
        s"unsupported predicate ${other.sql} — each conjunct must be an " +
          "equi-predicate or the single >=/<= time inequality between the sides")
    }
    val (lt, rt, strategy) = time.getOrElse(AsofSqlSyntax.fail(
      "the ON clause needs one time inequality (l.t >= r.t for backward, " +
        "l.t <= r.t for forward)"))
    val node = AsofJoin(l, r, eqL.result(), eqR.result(), lt, rt, strategy)
    // inner mode: matched ⟺ right time non-null (null right times never
    // match by AsofJoin contract). That filter is only exact when an
    // UNMATCHED row (all right attributes null) makes rt evaluate null —
    // i.e. rt null-propagates from some right attribute. A
    // non-null-preserving rt (e.g. coalesce(q.us, 0)) would evaluate
    // non-null on unmatched rows and silently turn inner into left, so
    // it is rejected loudly instead.
    if (mode == "inner") {
      def propagatesNull(e: Expression): Boolean = e match {
        case a: Attribute => rightOut.contains(a)
        case _ => e.nullIntolerant && e.children.exists(propagatesNull)
      }
      if (!propagatesNull(rt))
        AsofSqlSyntax.fail("inner ASOF needs a right time operand that is " +
          "null when the right side is unmatched (a bare column or " +
          "null-propagating arithmetic over one) — " +
          s"${rt.sql} is not; use ASOF LEFT JOIN or simplify the operand")
      Filter(IsNotNull(rt), node)
    } else node
  }
}
