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

  /** `abs(a - b) <= k`, k >= 1, integral on both sides. */
  private def matchBand(p: Expression): Option[(Expression, Expression, Long)] =
    p match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), kLit)
          if integral(a) && integral(b) && p.deterministic =>
        litLong(kLit).filter(_ >= 1).map((a, b, _))
      case GreaterThanOrEqual(kLit, Abs(Subtract(a, b, _), _))
          if integral(a) && integral(b) && p.deterministic =>
        litLong(kLit).filter(_ >= 1).map((a, b, _))
      case _ => None
    }

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
      val bandOpt = if (hasEqui) None else preds.flatMap(matchBand).headOption
      // Orient the band so `probe` evaluates against the left child.
      val oriented = bandOpt.flatMap { case (a, b, k) =>
        if (canEvaluate(a, left) && canEvaluate(b, right)) Some((a, b, k))
        else if (canEvaluate(b, left) && canEvaluate(a, right)) Some((b, a, k))
        else None
      }
      oriented match {
        case None => j
        case Some((probe, build, k)) =>
          val w = 2 * k
          val lo = bucketOf(Subtract(Cast(probe, LongType), Literal(k)), w)
          val hi = bucketOf(Add(Cast(probe, LongType), Literal(k)), w)
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
