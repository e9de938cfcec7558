package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a keyless numeric range join —
  * `points JOIN ranges ON p >= lo AND p <= hi` with no equi
  * predicate — into the bucketed equi-join of
  * [[graft.ops.RangeJoin]], automatically.
  *
  * Spark has no range-join optimization: with no equality conjunct
  * the join plans as a broadcast nested loop (or cartesian), which is
  * quadratic death when the ranges side is large (IP-geolocation,
  * genomic intervals, histogram band tables). This rule manufactures
  * the missing equi key at the LOGICAL level: the point side gains
  * `floor(p / w)`, the range side explodes to the touched buckets
  * `floor(lo/w) .. floor(hi/w)` via `Generate(Explode(Sequence))`,
  * the join becomes a shuffle equi-join on the bucket id, and the
  * ORIGINAL predicate stays as the residual — so semantics are
  * exactly the naive join's (each point owns one bucket: no
  * duplicate pairs). `floor(x/w)` is weakly monotone in x even in
  * double arithmetic, so a point inside `[lo, hi]` always lands in a
  * bucket the range exploded to — no missed pairs.
  *
  * OPT-IN, like the public range-join-hint designs: dormant unless
  * `spark.graft.rangeJoin.binSize` is set to a positive bucket width
  * (pick ≈ the typical range span). Registered through
  * [[graft.GraftExtensions]] (`injectOptimizerRule`); it fires once
  * per eligible join — the rewritten join has an equality conjunct,
  * which makes it ineligible on the next pass.
  */
class RangeJoinRule extends Rule[LogicalPlan] {

  import RangeJoinRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "")
    if (width.trim.isEmpty) return plan
    val w = width.trim.toDouble
    require(w > 0, s"$WidthKey must be positive, got $w")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if eligible(j, cond) =>
        val conjs = splitConjuncts(cond)
        findRange(conjs, left, right) match {
          case Some(RangeCond(p, lo, hi, pointOnLeft)) =>
            val bucketP = Alias(bucketOf(p, w), "__rj_bp")()
            val brAttr = AttributeReference("__rj_br", LongType,
              nullable = false)()
            def pointSide(side: LogicalPlan) =
              Project(side.output :+ bucketP, side)
            def rangeSide(side: LogicalPlan) =
              Generate(
                // TimeZoneAwareExpression: without an explicit zone id
                // the Sequence is UNRESOLVED and plan validation fails
                Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
                  Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(brAttr), child = side)
            val (nl, nr) =
              if (pointOnLeft) (pointSide(left), rangeSide(right))
              else (rangeSide(left), pointSide(right))
            val newCond = And(EqualTo(bucketP.toAttribute, brAttr), cond)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}

object RangeJoinRule {
  /** Bucket width conf; unset (default) = rule dormant. */
  val WidthKey = "spark.graft.rangeJoin.binSize"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** `floor(x / w)` as a long — the shared bucket arithmetic. */
  private def bucketOf(x: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w))), LongType)

  private case class RangeCond(point: Expression, lo: Expression,
                               hi: Expression, pointOnLeft: Boolean)

  /** Eligible = genuinely keyless (no equality conjunct spanning both
    * sides — those joins already hash/sort-merge) and not already
    * rewritten (the injected bucket attrs are absent). */
  private def eligible(j: Join, cond: Expression): Boolean = {
    val spansBoth = (e: Expression) =>
      e.references.intersect(j.left.outputSet).nonEmpty &&
        e.references.intersect(j.right.outputSet).nonEmpty
    !splitConjuncts(cond).exists {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) => spansBoth(e)
      case _ => false
    }
  }

  /** Find `lo <= p <= hi` with the point expression on one side and
    * both bounds on the other, all numeric. Strict comparisons also
    * qualify — bucket containment only needs the weak bounds, and
    * the original predicate rides along as the residual. */
  private def findRange(conjs: Seq[Expression], left: LogicalPlan,
                        right: LogicalPlan): Option[RangeCond] = {
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    def numeric(e: Expression) = e.dataType.isInstanceOf[NumericType]
    // (point, bound, boundIsLower, pointOnLeft)
    val bounds = conjs.flatMap {
      case cmp: BinaryComparison if numeric(cmp.left) && numeric(cmp.right) =>
        val (a, b) = (cmp.left, cmp.right)
        (side(a), side(b)) match {
          case (Some(sa), Some(sb)) if sa != sb =>
            cmp match {
              case GreaterThanOrEqual(_, _) | GreaterThan(_, _) =>
                // a >= b: b lower-bounds a, a upper-bounds b
                Seq((a, b, true, sa), (b, a, false, sb))
              case LessThanOrEqual(_, _) | LessThan(_, _) =>
                Seq((a, b, false, sa), (b, a, true, sb))
              case _ => Nil
            }
          case _ => Nil
        }
      case _ => Nil
    }
    val byPoint = bounds.groupBy { case (p, _, _, onLeft) =>
      (p.canonicalized, onLeft)
    }
    byPoint.collectFirst {
      case ((_, onLeft), bs)
          if bs.exists(_._3) && bs.exists(!_._3) =>
        val lo = bs.find(_._3).get
        val hi = bs.find(!_._3).get
        RangeCond(lo._1, lo._2, hi._2, onLeft)
    }
  }
}
