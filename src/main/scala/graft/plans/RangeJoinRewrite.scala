package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrite an inner join whose ONLY condition is a
  * range containment — `lo ≤ p AND p ≤ hi` with the point on one side
  * and both bounds on the other — into the chunked equi-join shape of
  * [[graft.operators.RangeJoin]], directly in the logical plan. Users
  * writing plain SQL (`FROM pts JOIN iv ON x BETWEEN lo AND hi`) get
  * the scalable plan without knowing the operator exists: without the
  * rewrite, Spark plans BroadcastNestedLoopJoin (small side) or a
  * cartesian product (big×big).
  *
  * Soundness: chunking only GENERATES candidates (floor is monotone —
  * a point inside [lo, hi] always shares a chunk with its interval);
  * the original predicate is re-applied as a Filter above the
  * equi-join, so the rewrite can never change the result, only the
  * join strategy beneath it.
  *
  * Off by default. Enable by setting [[RangeJoinRewrite.WidthKey]] to
  * the chunk width (≈ the typical interval width) and installing via
  * `GraftExtensions` (session build) or
  * `RangeJoinRewrite.install(spark)` (live session).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.chunkWidth"

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def width: Option[Double] =
    try {
      val w = SQLConf.get.getConfString(WidthKey, "0").toDouble
      if (w > 0) Some(w) else None
    } catch { case _: NumberFormatException => None }

  /** chunkOf relies on a meaningful Cast-to-Double: numerics and
    * timestamps (epoch seconds) qualify; strings cast to null (the
    * equi-join would silently return empty — WRONG results) and dates
    * produce an invalid post-analysis Cast. Anything else must be left
    * to Spark's own planner.
    */
  private def chunkable(t: DataType): Boolean = t match {
    case _: NumericType => true
    case TimestampType  => true
    case _              => false
  }

  /** All three columns must be chunkable AND of one family (all
    * numeric or all timestamp) so their chunk ids share a scale.
    */
  private def typesOk(p: Attribute, lo: Attribute, hi: Attribute): Boolean = {
    val ts = Seq(p, lo, hi).map(_.dataType)
    ts.forall(chunkable) &&
      (ts.forall(_.isInstanceOf[NumericType]) || ts.forall(_ == TimestampType))
  }

  /** (point, lo, hi) when `cond` is exactly the containment pair with
    * point attributes on one child and both bounds on the other.
    */
  private def containment(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Attribute, Attribute, Attribute)] = {
    def attr(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case _            => None
    }
    // normalize each comparison to (smaller, larger); strict bounds
    // are fine — an open interval is a subset of the closed one the
    // chunks cover, and the original predicate re-checks exactly
    val pairs = cond match {
      case And(c1, c2) =>
        Seq(c1, c2).map {
          case GreaterThanOrEqual(a, b) => (attr(b), attr(a))
          case GreaterThan(a, b)        => (attr(b), attr(a))
          case LessThanOrEqual(a, b)    => (attr(a), attr(b))
          case LessThan(a, b)           => (attr(a), attr(b))
          case _                        => (None, None)
        }
      case _ => Seq.empty
    }
    pairs match {
      case Seq((Some(s1), Some(l1)), (Some(s2), Some(l2))) =>
        val fromLeft  = left.outputSet
        val fromRight = right.outputSet
        def side(a: Attribute): Option[Boolean] =
          if (fromLeft.contains(a)) Some(true)
          else if (fromRight.contains(a)) Some(false) else None
        // the point is the LARGER of one comparison and the SMALLER of
        // the other: s1 <= p <= l2 (p = l1 = s2) or s2 <= p <= l1
        val cands = Seq((l1, s2, s1, l2), (l2, s1, s2, l1)).flatMap {
          case (p1, p2, lo, hi)
              if p1.semanticEquals(p2) && typesOk(p1, lo, hi) =>
            (side(p1), side(lo), side(hi)) match {
              case (Some(ps), Some(ls), Some(hs))
                  if ls == hs && ps != ls => Some((p1, lo, hi))
              case _ => None
            }
          case _ => None
        }
        cands.headOption
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if containment(cond, left, right).isDefined &&
              j.resolved =>
          val (p, lo, hi) = containment(cond, left, right).get
          val pointOnLeft = left.outputSet.contains(p)
          val (pSide, ivSide) = if (pointOnLeft) (left, right)
            else (right, left)
          def chunkOf(e: Expression): Expression =
            Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)
          val pChunk  = Alias(chunkOf(p), "__chunk_p")()
          val ivChunk = AttributeReference("__chunk_iv", LongType)()
          val pPlan = Project(pSide.output :+ pChunk, pSide)
          // Sequence is TimeZoneAware: the analyzer's ResolveTimeZone
          // already ran, so the rule must fill timeZoneId itself or
          // the plan validates as unresolved
          val ivPlan = Generate(
            Explode(Sequence(chunkOf(lo), chunkOf(hi), None,
              Some(SQLConf.get.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ivChunk), child = ivSide)
          val eq = EqualTo(pChunk.toAttribute, ivChunk)
          val (nl, nr) =
            if (pointOnLeft) (pPlan, ivPlan) else (ivPlan, pPlan)
          Project(j.output,
            Filter(cond, Join(nl, nr, Inner, Some(eq), hint)))
      }
  }
}
