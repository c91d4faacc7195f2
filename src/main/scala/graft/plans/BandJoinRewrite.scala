package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite an equi-key-less band join
  * `A JOIN B ON abs(a - b) <= k` (integral a, b, k) into a covering-bucket
  * equi join, so the planner never falls back to a nested loop.
  *
  * Spark has no native band/interval join operator; without an equi key
  * the only physical choices are BroadcastNestedLoopJoin or
  * CartesianProduct — |A|×|B| comparisons, a scale-killer the moment
  * neither side is broadcast-small. The standard fix (bucketize the band)
  * is mechanical, so this rule applies it inside Catalyst rather than
  * asking every query author to hand-write it:
  *
  * {{{
  *   bucket(x)  = (x - pmod(x, 2k)) div 2k          // floor division
  *   A'         = A  lateral explode(sequence(bucket(a-k), bucket(a+k)))
  *   B'         = B  projecting bucket(b)
  *   result     = σ(abs(a-b) <= k)(A' ⋈_{bucket} B')
  * }}}
  *
  * With bucket width 2k the exploded side covers its band with at most
  * two buckets, so row expansion is ≤ 2× regardless of data, and every
  * true pair shares a bucket (|a-b| <= k ⇒ their buckets differ by at
  * most one and the probe emits both). The original predicate is
  * re-applied above the join, so the rewrite is correctness-neutral by
  * construction — the equi join merely over-approximates the band.
  *
  * Fires only on inner joins whose condition has NO equi predicate (if
  * one exists the planner already hashes on it and applies the band as a
  * cheap post-filter), and the rewritten join's bucket equality stops the
  * rule from re-firing on its own output.
  *
  * Registration: [[install]] (imperative, `experimental.extraOptimizations`)
  * or `spark.sql.extensions=graft.functions.GraftExtensions` (declarative,
  * [[graft.functions.GraftExtensions]] injects it) — the same two paths
  * as the native SQL functions.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotent, race-safe session registration (Verify dumps queries
    * from a thread pool).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, ByteType)   => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType)   => Some(v)
    case _                            => None
  }

  /** A detected band `a - b ∈ [-down, up]` (i.e. b - up <= a <= b + down
    * read from b's viewpoint; the interval the PROBE side must cover is
    * [a - up, a + down] around a). Symmetric `abs` bands have
    * down == up == k.
    */
  private case class Band(a: Expression, b: Expression, down: Long, up: Long)

  /** `abs(a - b) <= k`, k >= 1, integral on both sides. */
  private def matchAbsBand(p: Expression): Option[Band] =
    p match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), kLit)
          if integral(a) && integral(b) && p.deterministic =>
        litLong(kLit).filter(_ >= 1).map(k => Band(a, b, k, k))
      case GreaterThanOrEqual(kLit, Abs(Subtract(a, b, _), _))
          if integral(a) && integral(b) && p.deterministic =>
        litLong(kLit).filter(_ >= 1).map(k => Band(a, b, k, k))
      case _ => None
    }

  /** One half of a conjunct band: `a >= b - k` / `a <= b + k` and the
    * flipped spellings, normalized to bounds on (a - b). Returns
    * (a, b, lowerBound?, upperBound?) with exactly one bound set.
    */
  private def halfBand(p: Expression): Option[(Expression, Expression, Option[Long], Option[Long])] = {
    if (!p.deterministic) return None
    p match {
      // a >= b - k  ⇔  a - b >= -k
      case GreaterThanOrEqual(a, Subtract(b, kLit, _)) if integral(a) && integral(b) =>
        litLong(kLit).map(k => (a, b, Some(-k), None))
      // a <= b + k  ⇔  a - b <= k
      case LessThanOrEqual(a, Add(b, kLit, _)) if integral(a) && integral(b) =>
        litLong(kLit).map(k => (a, b, None, Some(k)))
      // b - k <= a (flipped spelling of the lower bound)
      case LessThanOrEqual(Subtract(b, kLit, _), a) if integral(a) && integral(b) =>
        litLong(kLit).map(k => (a, b, Some(-k), None))
      // b + k >= a (flipped spelling of the upper bound)
      case GreaterThanOrEqual(Add(b, kLit, _), a) if integral(a) && integral(b) =>
        litLong(kLit).map(k => (a, b, None, Some(k)))
      // a <= b - k / a >= b + k: a band shifted past b — still bounds,
      // but rare; skip rather than reason about negative widths.
      case _ => None
    }
  }

  /** Pair up two half-bands over the same (a, b) into a full band with
    * positive width. `BETWEEN`-style authoring `a >= b - k1 && a <= b +
    * k2` arrives as two conjuncts; match them semantically so column
    * order and canonicalization don't matter.
    */
  private def matchConjunctBand(preds: Seq[Expression]): Option[(Band, Seq[Expression])] = {
    val halves = preds.flatMap(p => halfBand(p).map(p -> _))
    val pairs = for {
      (p1, (a1, b1, Some(lo), None)) <- halves
      (p2, (a2, b2, None, Some(hi))) <- halves
      if a1.semanticEquals(a2) && b1.semanticEquals(b2)
      if hi - lo >= 1 // width >= 1 ⇒ a genuine band, not an equality
    } yield (Band(a1, b1, -lo, hi), Seq(p1, p2))
    pairs.headOption
  }

  private def matchBand(preds: Seq[Expression]): Option[Band] =
    preds.flatMap(matchAbsBand).headOption.orElse(
      matchConjunctBand(preds).map(_._1))

  /** Exact floor(x / w) for longs: pmod is non-negative, so the
    * subtraction is an exact multiple of w and integral division cannot
    * truncate toward the wrong side.
    */
  private def bucketOf(x: Expression, w: Long): Expression = {
    val xl = Cast(x, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, Literal(w))), Literal(w))
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val preds = splitConjunctivePredicates(cond)
      val hasEqui = preds.exists {
        case Equality(l, r) =>
          (canEvaluate(l, left) && canEvaluate(r, right)) ||
            (canEvaluate(l, right) && canEvaluate(r, left))
        case _ => false
      }
      val bandOpt = if (hasEqui) None else matchBand(preds)
      // Orient the band so `a` (the probe) evaluates against the left
      // child; flipping roles mirrors the interval, so down/up swap.
      val oriented = bandOpt.flatMap { bd =>
        if (canEvaluate(bd.a, left) && canEvaluate(bd.b, right)) Some(bd)
        else if (canEvaluate(bd.b, left) && canEvaluate(bd.a, right))
          Some(Band(bd.b, bd.a, bd.up, bd.down))
        else None
      }
      oriented match {
        case None => j
        case Some(Band(probe, build, down, up)) =>
          // A true pair has build ∈ [probe - up, probe + down]; with
          // bucket width = the interval width, that spans ≤ 2 buckets.
          val w = down + up
          val lo = bucketOf(Subtract(Cast(probe, LongType), Literal(up)), w)
          val hi = bucketOf(Add(Cast(probe, LongType), Literal(down)), w)
          // Sequence is TimeZoneAwareExpression: it only resolves with a
          // timezone bound, even for purely integral sequences.
          val gen = Explode(
            Sequence(lo, hi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
          val elem = gen.elementSchema.head
          val bucketL =
            AttributeReference("__graft_bucket", elem.dataType, elem.nullable)()
          val explodedLeft =
            Generate(gen, Nil, outer = false, None, Seq(bucketL), left)
          val bucketR = Alias(bucketOf(build, w), "__graft_bucket_r")()
          val projectedRight = Project(right.output :+ bucketR, right)
          val bucketJoin = Join(explodedLeft, projectedRight, Inner,
            Some(EqualTo(bucketL, bucketR.toAttribute)), hint)
          Project(j.output, Filter(cond, bucketJoin))
      }
  }
}
