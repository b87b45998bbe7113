package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Native as-of join: for every left row, the single right row with the
  * LARGEST right-time ≤ the left row's time, within the same key group —
  * the temporal lookup every event pipeline needs (price as of trade
  * time, last sensor reading as of query time, attribution) and the
  * operator Spark's join menu lacks (polars/pandas `merge_asof`, DuckDB
  * `ASOF JOIN`).
  *
  * This is the whole-operator point on the extension ladder: a custom
  * [[AsofJoin]] logical node, a planner [[AsofJoinStrategy]] injected
  * through `SparkSessionExtensions`, and an [[AsofJoinExec]] physical
  * operator. The exec declares `ClusteredDistribution` on the keys for
  * BOTH children and `(key, time)` ascending `requiredChildOrdering`, so
  * EnsureRequirements co-partitions and co-sorts the sides exactly as it
  * does for a sort-merge join — then one streaming merge pass per
  * partition produces the answer. Cost at 100 TB: identical exchange
  * shape to the equi-join on the key, ZERO extra passes — against the
  * relational encodings' union + whole-stream window (j5) or
  * bucket-explode join (j6/j11), which shuffle strictly more rows.
  *
  * Semantics are LEFT OUTER (unmatched left rows carry nulls), matching
  * DuckDB `ASOF LEFT JOIN` with `l.t >= r.t`, which is the oracle in
  * `j13_asof_join_native`. Strategies (polars `merge_asof` surface):
  *
  *   - `"backward"` (default): LARGEST right time ≤ left time;
  *   - `"forward"`: SMALLEST right time ≥ left time — DuckDB oracles it
  *     with `l.t <= r.t` (`j15_asof_join_forward`). The merge differs
  *     only in consumption: backward consumes candidates and keeps the
  *     last, forward peeks at the first qualifying row without
  *     consuming it;
  *   - `"nearest"`: whichever of the backward/forward candidates is
  *     closest in absolute time distance; an exact tie prefers the
  *     BACKWARD row (deterministic — polars leaves ties
  *     vendor-defined, so the choice is pinned here and in
  *     AsofJoinSpec, not oracled against DuckDB, which has no nearest).
  *
  * `tolerance` (match only within Δ, polars `tolerance=`) composes with
  * every strategy as one extra comparison on the candidate's distance:
  * backward requires `lt − rt ≤ Δ`, forward `rt − lt ≤ Δ`, nearest
  * `|rt − lt| ≤ Δ` — oracled in `j17_asof_tolerance` by a DuckDB ASOF
  * join with the out-of-tolerance matches nulled out.
  *
  * Right rows with null time never match; a null left time matches
  * nothing; a null join key matches nothing (SQL equality). Times must
  * be LongType (epoch-µs in this repo); keys may be any binary-stable
  * types.
  *
  * Determinism contract: callers must make the right side UNIQUE per
  * (key, time) — with duplicates, "the" latest row at a timestamp is
  * ill-defined and both this exec (sort-order-dependent) and DuckDB
  * (vendor-defined) would pick arbitrarily.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strategy: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {

  require(Seq("backward", "forward", "nearest").contains(strategy),
    s"unknown as-of strategy '$strategy'")
  require(tolerance.forall(_ >= 0L), "as-of tolerance must be ≥ 0")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]; injected by
  * [[graft.GraftExtensions]]. */
object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, strat, tol) =>
      AsofJoinExec(lk, rk, lt, rt, strat, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strategy: String,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of times must be LongType (epoch-µs)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Same contract as sort-merge join: cluster both sides on the key … */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** … and sort each partition by (key, time) so one merge pass works. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lT = leftTime
    val rT = rightTime
    // backward and nearest both CONSUME right rows with rt <= lt (the
    // nearest forward candidate is then the unconsumed peek); forward
    // only peeks
    val consuming = strategy != "forward"
    val wantFwd = strategy != "backward"
    val tol = tolerance.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTime = BindReferences.bindReference(lT, lOut)
      val rTime = BindReferences.bindReference(rT, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // current right row: valid until the next ri.next() call (sorter
        // iterators reuse row objects), which only happens after this
        // row was either copied into `matchRow` or skipped
        private var rRow: InternalRow = if (ri.hasNext) ri.next() else null
        private def advanceRight(): Unit =
          rRow = if (ri.hasNext) ri.next() else null

        // the backward as-of candidate for the CURRENT left key group
        private var matchRow: InternalRow = null
        private var matchKey: UnsafeRow = null
        private var matchTime: Long = 0L

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l)
          if (matchKey != null && matchKey != lk) { // left entered a new key group
            matchRow = null
            matchKey = null
          }
          // SQL-equality semantics: a null join key matches nothing
          // (DuckDB ASOF and SortMergeJoinExec both skip null keys) —
          // emit null-right without scanning, so a null left key can
          // never pair with a null right key via the natural ordering
          // (where NULL compares equal to NULL)
          val lkNull = lk.anyNull
          val ltv = lTime.eval(l)
          if (!lkNull && ltv != null && consuming) {
            // BACKWARD/NEAREST: consume rows with rt <= lt, keep last;
            // stop at the first rt > lt (which stays as the fwd peek)
            val lt = ltv.asInstanceOf[Long]
            var scan = true
            while (scan && rRow != null) {
              val rk = rKeyProj(rRow)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) advanceRight() // right key group already passed
              else if (cmp > 0) scan = false // right is ahead; stop
              else {
                val rtv = rTime.eval(rRow)
                if (rtv == null) advanceRight() // null time never matches
                else if (rtv.asInstanceOf[Long] <= lt) {
                  // a newer (still <= lt) candidate supersedes the old one
                  matchRow = rRow.copy()
                  matchKey = lk.copy()
                  matchTime = rtv.asInstanceOf[Long]
                  advanceRight()
                } else scan = false // right time beyond this left row
              }
            }
          } else if (!lkNull && ltv != null) {
            // FORWARD: smallest rt >= lt — advance PAST stale rows and
            // PEEK at the candidate without consuming it (later left
            // rows of the same key may need the same right row; for
            // ascending left times the needed row only moves forward)
            val lt = ltv.asInstanceOf[Long]
            var scan = true
            while (scan && rRow != null) {
              val rk = rKeyProj(rRow)
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) advanceRight()
              else if (cmp > 0) scan = false
              else {
                val rtv = rTime.eval(rRow)
                if (rtv == null) advanceRight() // nulls sort first; never match
                else if (rtv.asInstanceOf[Long] < lt) advanceRight()
                else scan = false // rRow IS the candidate
              }
            }
          }
          numOutputRows += 1
          // distances of the two candidates (Long.MaxValue = absent),
          // tolerance applied symmetrically; nearest ties prefer backward
          val lt = if (ltv == null) 0L else ltv.asInstanceOf[Long]
          val backDist: Long =
            if (!lkNull && ltv != null && consuming &&
                matchRow != null && matchKey == lk) {
              val d = lt - matchTime
              if (d <= tol) d else Long.MaxValue
            } else Long.MaxValue
          val fwdDist: Long =
            if (!lkNull && ltv != null && wantFwd && rRow != null &&
                keyOrd.compare(rKeyProj(rRow), lk) == 0) {
              val rtv = rTime.eval(rRow)
              if (rtv != null && rtv.asInstanceOf[Long] >= lt) {
                val d = rtv.asInstanceOf[Long] - lt
                if (d <= tol) d else Long.MaxValue
              } else Long.MaxValue
            } else Long.MaxValue
          if (backDist == Long.MaxValue && fwdDist == Long.MaxValue)
            joined(l, nullRight)
          else if (backDist <= fwdDist) joined(l, matchRow)
          else joined(l, rRow)
        }
      }
    }
  }
}

/** DataFrame-level entry point for [[AsofJoin]]. */
object Asof {

  /** Left as-of join `left` to `right` on equal `leftKeys`/`rightKeys`
    * picking the right row whose `rightTimeCol` is as-of
    * `leftTimeCol` under `strategy` ("backward" | "forward" |
    * "nearest"), optionally within `tolerance` time units. The two
    * sides must not share output attributes — alias the right side's
    * columns (fresh exprIds) when both derive from the same scan. */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      strategy: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"as-of join sides share attributes $shared — alias the right side first")
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${p.output.map(_.name).mkString(", ")}]"))
    GraftSqlBridge.ofRows(left.sparkSession, AsofJoin(
      lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTimeCol), attr(rp, rightTimeCol), strategy, tolerance))
  }
}
