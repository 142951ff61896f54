package streamline.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Range-bin join rewrite — the one operator family where composing
  * built-in operators is NOT enough (SURVEY.md §7.2 decision table,
  * row "custom Rule"): an inner join whose ONLY cross-side predicates
  * are time-range bounds (`|t_l − t_r| ≤ band`, no equi key) has no
  * equi conjunct for ExtractEquiJoinKeys, so Spark plans a broadcast
  * nested loop — O(|L|·|R|) comparisons, the plan that dies first at
  * 100 TB.
  *
  * The rewrite is the classic published range-join binning (the same
  * design as Databricks' public `RANGE_JOIN(t, 60)` hint, which also
  * takes the bin width from the user): bin the left timestamp once,
  * explode the right timestamp into its bin and both neighbours, join
  * on bin EQUALITY (hash/merge-joinable, shuffles by bin), and keep the
  * ORIGINAL condition as a residual filter. Each qualifying pair
  * matches exactly one exploded copy (|t_l − t_r| ≤ band ≤ bin width ⇒
  * the bins differ by at most 1), so no dedup is needed and the
  * rewrite is semantics-preserving by construction — the original
  * predicate is still applied verbatim.
  *
  * The bin width comes from `graft.rangeJoin.binSeconds` (0 = rule
  * off). It must be ≥ the band for completeness — exactly the contract
  * of the public hint this mirrors; the width is a USER assertion
  * about the band, not something the rule re-derives from interval
  * arithmetic (which may be arbitrarily nested expressions).
  *
  * Registered through `spark.experimental.extraOptimizations` (the
  * runtime face of `SparkSessionExtensions.injectOptimizerRule` for an
  * already-built session). Idempotent: the rewritten join HAS an equi
  * conjunct, so the rule never re-fires on its own output.
  */
object RangeBinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "graft.rangeJoin.binSeconds"

  /** Inject into a live session (once) and set the bin width. */
  def install(spark: SparkSession, binSeconds: Long = 60L): Unit = {
    spark.conf.set(BinConf, binSeconds.toString)
    if (!spark.experimental.extraOptimizations.contains(RangeBinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeBinRule
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSec =
      try conf.getConfString(BinConf, "0").toLong catch {
        case _: NumberFormatException => 0L
      }
    if (binSec <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        bandAttrs(left, right, cond) match {
          case Some((tsL, tsR)) =>
            val bin: Expression => Expression =
              ts => Floor(Divide(Cast(ts, org.apache.spark.sql.types
                .DoubleType), Literal(binSec.toDouble)))
            val binL = Alias(bin(tsL), "graft_bin_l")()
            val leftP = Project(left.output :+ binL, left)
            val b = bin(tsR)
            val binR = AttributeReference("graft_bin_r", LongType,
              nullable = true)()
            val rightG = Generate(
              Explode(CreateArray(Seq(
                Subtract(b, Literal(1L)), b, Add(b, Literal(1L))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binR), child = right)
            val newCond = And(EqualTo(binL.toAttribute, binR), cond)
            Project(j.output,
              Join(leftP, rightG, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  /** The (left-ts, right-ts) attribute pair IF the join is a pure band
    * join: no cross-side equi conjunct, and at least one cross-side
    * range conjunct bounding a TimestampType attribute of one side by
    * an expression of the other. */
  private def bandAttrs(left: LogicalPlan, right: LogicalPlan,
                        cond: Expression): Option[(Attribute, Attribute)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.intersect(left.outputSet).nonEmpty &&
        e.references.intersect(right.outputSet).nonEmpty
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None
    def tsAttr(e: Expression, side: AttributeSet): Option[Attribute] =
      e match {
        case a: AttributeReference
            if a.dataType == TimestampType && side.contains(a) => Some(a)
        case _ => e.references.toSeq.filter(side.contains) match {
          case Seq(a) if a.dataType == TimestampType => Some(a)
          case _ => None
        }
      }
    val pairs = conjuncts.collect {
      case cmp: BinaryComparison if !cmp.isInstanceOf[EqualTo]
          && crossSide(cmp) =>
        val (a, b) = (cmp.left, cmp.right)
        val la = if (a.references.subsetOf(left.outputSet)) a
                 else if (b.references.subsetOf(left.outputSet)) b
                 else return None
        val ra = if (a eq la) b else a
        (tsAttr(la, left.outputSet), tsAttr(ra, right.outputSet))
    }
    pairs.collectFirst { case (Some(l), Some(r)) => (l, r) }
  }
}
