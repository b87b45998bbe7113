package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: band joins without an equi key become bucketed
  * equi-joins automatically.
  *
  * The trap it removes: an inner join whose ONLY cross-side predicate is
  * a band `a BETWEEN b − C AND b` (both sides Long, C a positive
  * literal) has no equi key, so Spark can only plan a nested-loop /
  * cartesian join — quadratic, and the single most common way a
  * time-window query that worked at test scale dies at 100 TB. The
  * j6/j10 operators hand-write the standard fix; this rule applies the
  * SAME rewrite inside the optimizer, so the naive declarative form is
  * also the scalable one:
  *
  *   - the `a` side gains one bucket column  `a div C`;
  *   - the `b` side EXPLODES to the buckets its band touches —
  *     `sequence((b−C) div C, b div C)` — always ≤ 2 rows since the
  *     band width IS the bucket width;
  *   - the join becomes an equi-join on the bucket with the original
  *     band predicate left as a residual. Each qualifying pair meets in
  *     exactly one bucket (the `a` row has one), so no dedup is needed.
  *
  * Truncating division keeps coverage below zero too: `div` is
  * monotonic, so every a ∈ [b−C, b] lands between the endpoints'
  * buckets.
  *
  * The rule fires only when NO cross-side equality conjunct exists
  * (with one, the join is already hash-joinable — rewriting would only
  * add work), and the rewritten join carries a bucket equality, so the
  * rule cannot fire twice (it is fixed-point safe inside the operator
  * optimization batch). Injected by [[graft.GraftExtensions]].
  *
  * No size guard, deliberately: even when one side would fit a
  * broadcast, the BNLJ alternative compares every probe row against
  * EVERY broadcast row — at the 10 MB threshold that is ~10^5
  * comparisons per probe row, quadratic the moment the "small" side
  * grows — while the bucketed equi-join costs one extra exchange of the
  * small side and then hashes. Constant-size interval DIMS (a handful
  * of variable-width windows, e.g. `j14_campaign_windows`) don't match
  * this rule's fixed-width `b − C .. b` pattern and correctly stay on
  * the broadcast nested loop.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** A detected band between cross-side Long expressions: `a` lands in
    * `[b + loOff, b + hiOff]` with bucket width `w` (positive Long
    * literal). Trailing/forward windows use (−c, 0); symmetric
    * `abs(a − b) <= c` uses (−c, +c). */
  private case class Band(a: Expression, b: Expression, w: Long,
      loOff: Long, hiOff: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEquality(conjuncts, left, right)) j
      else findBand(conjuncts, left, right) match {
        case Some(band) => rewrite(j, band, hint)
        case None => j
      }
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    if (e.references.isEmpty || !e.deterministic) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Any `x = y` conjunct with x and y on opposite sides already gives
    * the planner a hash key; the band rewrite would be pure overhead. */
  private def hasCrossEquality(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(x, y) => crossSides(x, y, left, right)
      case EqualNullSafe(x, y) => crossSides(x, y, left, right)
      case _ => false
    }

  private def crossSides(x: Expression, y: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (sideOf(x, left, right), sideOf(y, left, right)) match {
      case (Some(sx), Some(sy)) => sx != sy
      case _ => false
    }

  /** Find a width-`c` band between cross-side Long expressions, in
    * either spelling:
    *   - trailing window: `a >= b − c` ∧ `a <= b`  → Band(a, b, c)
    *   - forward window:  `a >= b` ∧ `a <= b + c`  — equivalent to
    *     `b ∈ [a − c, a]`, i.e. Band(b, a, c) with the roles swapped.
    * Both reduce to the same rewrite; only the detection differs. */
  private def findBand(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    // normalize every inequality to (smaller, larger)
    val les = conjuncts.flatMap {
      case LessThanOrEqual(x, y) => Some((x, y))
      case GreaterThanOrEqual(x, y) => Some((y, x))
      case _ => None
    }
    def longs(a: Expression, b: Expression) =
      a.dataType == LongType && b.dataType == LongType
    val trailing = les.collect { // b − c <= a, pairs with a <= b
      case (Subtract(b, Literal(c: Long, LongType), _), a)
        if c > 0 && longs(a, b) => (a, b, c)
    }
    val forward = les.collect { // a <= b + c, pairs with b <= a: Band(b, a, c)
      case (a, Add(b, Literal(c: Long, LongType), _))
        if c > 0 && longs(a, b) => (b, a, c)
      case (a, Add(Literal(c: Long, LongType), b, _))
        if c > 0 && longs(a, b) => (b, a, c)
    }
    val windowed = (trailing ++ forward).collectFirst(Function.unlift {
      case (a: Expression, b: Expression, c: Long) =>
        val uppered = les.exists { case (x, y) => x.semanticEquals(a) && y.semanticEquals(b) }
        val sides = (sideOf(a, left, right), sideOf(b, left, right))
        sides match {
          case (Some(sa), Some(sb)) if sa != sb && uppered => Some(Band(a, b, c, -c, 0))
          case _ => None
        }
    })
    // symmetric spelling: abs(a − b) <= c is one self-contained conjunct
    lazy val symmetric = les.collectFirst(Function.unlift {
      case (Abs(Subtract(x, y, _), _), Literal(c: Long, LongType))
          if c > 0 && longs(x, y) =>
        (sideOf(x, left, right), sideOf(y, left, right)) match {
          case (Some(sx), Some(sy)) if sx != sy => Some(Band(x, y, c, -c, c))
          case _ => None
        }
      case _ => None
    })
    windowed.orElse(symmetric)
  }

  private def rewrite(j: Join, band: Band, hint: JoinHint): LogicalPlan = {
    val Band(a, b, c, loOff, hiOff) = band
    val w = Literal(c, LongType)
    val aOnLeft = a.references.subsetOf(j.left.outputSet)
    val (aChild, bChild) = if (aOnLeft) (j.left, j.right) else (j.right, j.left)

    val aBucket = Alias(IntegralDivide(a, w), "__band_bucket_a")()
    val aPlan = Project(aChild.output :+ aBucket, aChild)

    val bBucketAttr = AttributeReference("__band_bucket_b", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: it resolves only with an
    // explicit zone, even over Longs
    val seq = new Sequence(
      IntegralDivide(Add(b, Literal(loOff, LongType)), w),
      IntegralDivide(Add(b, Literal(hiOff, LongType)), w),
      Some(Literal(1L, LongType)),
      Some(conf.sessionLocalTimeZone))
    val bPlan = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bBucketAttr), child = bChild)

    val bucketEq = EqualTo(aBucket.toAttribute, bBucketAttr)
    val (newLeft, newRight) = if (aOnLeft) (aPlan, bPlan) else (bPlan, aPlan)
    val newJoin = Join(newLeft, newRight, Inner,
      Some(And(bucketEq, j.condition.get)), hint)
    Project(j.output, newJoin)
  }
}
