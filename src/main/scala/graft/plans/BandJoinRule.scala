package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plans an equi-key-less temporal BAND join scalably.
  *
  * An inner join whose only cross-side predicate is a band
  *
  * {{{ build.x >= probe.y - W  AND  build.x < probe.y }}}
  *
  * (x, y LongType — e.g. `unix_micros` timestamps; `<=` accepted on either
  * bound) has no equi-join key, so Spark can only plan it as a broadcast
  * nested-loop / cartesian product — quadratic at scale. This rule rewrites
  * the logical join into the BINNED form (the manual technique of
  * `q46_band_join`, applied automatically):
  *
  *  - the build side maps each row to its W-wide bin `x div W`;
  *  - the probe side explodes to the ≤2 bins its window can touch
  *    (`(y-W) div W` and `y div W` — bin boundaries are ≥ W apart, so a
  *    window of length W crosses at most one);
  *  - the join becomes a shuffled EQUI-join on the bin key, with the exact
  *    band re-checked as the residual condition.
  *
  * Truncating division is used on BOTH sides, so the bin function is the
  * same monotone step function everywhere and the ≤2-bin cover holds for
  * negative values too (trunc merely widens the zero bin to (-W, W)).
  *
  * The rule only fires when NO cross-side equality conjunct exists (an
  * equi-key already gives Spark a hash join — binning would be pure
  * overhead), which also makes the rewrite self-terminating: the emitted
  * join carries a bin equality.
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private case class Band(build: AttributeReference, probe: AttributeReference,
      width: Long, lower: Expression, upper: Expression)

  /** The band pattern over a conjunct pair, if present. */
  private def findBand(conjuncts: Seq[Expression]): Option[Band] = {
    // lower bound: b >= p - W (either comparison direction)
    val lowers = conjuncts.collect {
      case e @ GreaterThanOrEqual(b: AttributeReference,
          Subtract(p: AttributeReference, Literal(w: Long, LongType), _))
          if b.dataType == LongType && p.dataType == LongType && w > 0 =>
        (b, p, w, e: Expression)
      case e @ LessThanOrEqual(Subtract(p: AttributeReference, Literal(w: Long, LongType), _),
          b: AttributeReference)
          if b.dataType == LongType && p.dataType == LongType && w > 0 =>
        (b, p, w, e: Expression)
    }
    // upper bound on the SAME pair: b < p or b <= p
    lowers.flatMap { case (b, p, w, lowerExpr) =>
      conjuncts.collectFirst {
        case e @ LessThan(b2: AttributeReference, p2: AttributeReference)
            if b2.semanticEquals(b) && p2.semanticEquals(p) => e: Expression
        case e @ LessThanOrEqual(b2: AttributeReference, p2: AttributeReference)
            if b2.semanticEquals(b) && p2.semanticEquals(p) => e: Expression
        case e @ GreaterThan(p2: AttributeReference, b2: AttributeReference)
            if b2.semanticEquals(b) && p2.semanticEquals(p) => e: Expression
        case e @ GreaterThanOrEqual(p2: AttributeReference, b2: AttributeReference)
            if b2.semanticEquals(b) && p2.semanticEquals(p) => e: Expression
      }.map(upper => Band(b, p, w, lowerExpr, upper))
    }.headOption
  }

  /** True when a conjunct is an equality linking the two sides (the join
    * already has a hash key — binning would only add overhead).
    */
  private def hasCrossEquality(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        val (ra, rb) = (a.references, b.references)
        ra.nonEmpty && rb.nonEmpty &&
          ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
            (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
      case _ => false
    }

  private def binOf(x: Expression, w: Long): Expression =
    new IntegralDivide(x, Literal(w, LongType))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = for {
        band <- findBand(conjuncts)
        if !hasCrossEquality(conjuncts, left, right)
        // locate the sides: probe owns y, build owns x (either orientation)
        (probePlan, buildPlan) <-
          if (left.outputSet.contains(band.probe) && right.outputSet.contains(band.build))
            Some((left, right))
          else if (right.outputSet.contains(band.probe) && left.outputSet.contains(band.build))
            Some((right, left))
          else None
      } yield {
        val w = band.width
        // probe side: explode the ≤2 candidate bins
        val binAttr = AttributeReference("__band_bin", LongType, nullable = false)()
        val bins = ArrayDistinct(CreateArray(Seq(
          binOf(Subtract(band.probe, Literal(w, LongType)), w),
          binOf(band.probe, w))))
        val probeGen = Generate(Explode(bins), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binAttr),
          child = probePlan)
        // build side: one bin per row
        val bin2Alias = Alias(binOf(band.build, w), "__band_bin2")()
        val buildProj = Project(buildPlan.output :+ bin2Alias, buildPlan)
        // equi-join on the bin, original band as residual; original output
        val newCond = (EqualTo(binAttr, bin2Alias.toAttribute) +: conjuncts)
          .reduce(And.apply)
        Project(j.output, Join(probeGen, buildProj, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
