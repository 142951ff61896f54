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
  * design as Databricks' public `RANGE_JOIN(t, 60)` hint): bin the left
  * timestamp once, explode the right timestamp into its bin and both
  * neighbours, join on bin EQUALITY (hash/merge-joinable, shuffles by
  * bin), and keep the ORIGINAL condition as a residual filter. Each
  * qualifying pair matches exactly one exploded copy (|t_l − t_r| ≤
  * band ≤ bin width ⇒ the bins differ by at most 1), so no dedup is
  * needed and the rewrite is semantics-preserving by construction — the
  * original predicate is still applied verbatim.
  *
  * Completeness is VERIFIED, not assumed: the rule only fires when the
  * condition carries BOTH a lower and an upper cross-side bound on the
  * same timestamp attribute pair, each bound is unit-slope affine in
  * its timestamp (checked by evaluating the bound expression at two
  * substituted instants — `ts ± INTERVAL` passes, anything nonlinear
  * bails), and the extracted band |t_l − t_r| ≤ band fits inside
  * `graft.rangeJoin.binSeconds` (0 = rule off; it is a GATE and upper
  * limit, no longer a trusted user assertion). One-sided inequalities
  * (unbounded band) and bands wider than the conf are left to stock
  * planning rather than silently dropping pairs more than one bin
  * apart. The actual bin width is derived from the verified band, so
  * bins are as tight as the predicate allows.
  *
  * Registered through `spark.experimental.extraOptimizations` (the
  * runtime face of `SparkSessionExtensions.injectOptimizerRule` for an
  * already-built session). Idempotent: the rewritten join HAS an equi
  * conjunct, so the rule never re-fires on its own output. The
  * band-verification above is also what makes a session-wide install
  * safe: a join the rewrite could break is a join the rule refuses.
  */
object RangeBinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "graft.rangeJoin.binSeconds"

  /** Inject into a live session (once) and set the max bin width. */
  def install(spark: SparkSession, binSeconds: Long = 60L): Unit = {
    spark.conf.set(BinConf, binSeconds.toString)
    if (!spark.experimental.extraOptimizations.contains(RangeBinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeBinRule
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxBinSec =
      try conf.getConfString(BinConf, "0").toLong catch {
        case _: NumberFormatException => 0L
      }
    if (maxBinSec <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        bandAttrs(left, right, cond, maxBinSec) match {
          case Some((tsL, tsR, binSec)) =>
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

  private val probeUs = 1000000000000L // 1e12 µs slope-check step

  /** If `e` (references ⊆ {ts}, timestamp-typed) is unit-slope affine
    * in `ts` — i.e. `ts` plus a constant offset, the only shape whose
    * comparison is a pure band bound — return that offset in µs.
    * Verified by substituting two instants and evaluating: anything the
    * interpreter can't fold, or with slope ≠ 1, bails. */
  private def affineOffsetUs(e: Expression, ts: Attribute): Option[Long] = {
    if (e.dataType != TimestampType) return None
    if (!e.references.subsetOf(AttributeSet(ts))) return None
    def at(us: Long): Option[Long] = {
      val sub = e.transform {
        case a: AttributeReference if a.exprId == ts.exprId =>
          Literal(us, TimestampType)
      }
      try sub.eval(null) match {
        case l: java.lang.Long => Some(l.longValue)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    for (a <- at(0L); b <- at(probeUs) if b - a == probeUs) yield a
  }

  /** The (left-ts, right-ts, binSeconds) triple IF the join is a pure
    * VERIFIED band join: no cross-side equi conjunct (`=` or `<=>` —
    * either would already hash-join), and the conjuncts bound
    * δ = t_l − t_r on BOTH sides with |δ| ≤ maxBinSec. */
  private def bandAttrs(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, maxBinSec: Long): Option[(Attribute, Attribute, Long)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sided(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => sided(a, b)
      case EqualNullSafe(a, b) => sided(a, b)
      case _ => false
    }
    if (hasEqui) return None
    def soleTs(e: Expression, side: AttributeSet): Option[Attribute] =
      e.references.toSeq.filter(side.contains) match {
        case Seq(a) if a.dataType == TimestampType => Some(a)
        case _ => None
      }
    // Per (tsL, tsR) pair: running (min upper, max lower) bound on δ µs.
    val bounds = scala.collection.mutable.Map
      .empty[(Attribute, Attribute), (Option[Long], Option[Long])]
    conjuncts.foreach {
      case cmp: BinaryComparison
          if !cmp.isInstanceOf[EqualTo] && !cmp.isInstanceOf[EqualNullSafe] =>
        // Normalize to (lhs from left plan) cmpOp (rhs from right plan);
        // flipping sides mirrors the comparison direction.
        val (lExpr, rExpr, lhsIsUpper) =
          if (cmp.left.references.subsetOf(left.outputSet) &&
              cmp.right.references.subsetOf(right.outputSet))
            (cmp.left, cmp.right,
              cmp.isInstanceOf[LessThan] || cmp.isInstanceOf[LessThanOrEqual])
          else if (cmp.left.references.subsetOf(right.outputSet) &&
                   cmp.right.references.subsetOf(left.outputSet))
            (cmp.right, cmp.left,
              cmp.isInstanceOf[GreaterThan] || cmp.isInstanceOf[GreaterThanOrEqual])
          else return None // a conjunct mixing sides non-separably: bail
        for {
          tl <- soleTs(lExpr, left.outputSet)
          tr <- soleTs(rExpr, right.outputSet)
          x0 <- affineOffsetUs(lExpr, tl)
          y0 <- affineOffsetUs(rExpr, tr)
        } {
          // tl + x0 {≤,≥} tr + y0  ⇔  δ {≤,≥} y0 − x0
          val bound = y0 - x0
          val (up, lo) = bounds.getOrElse((tl, tr), (None, None))
          bounds((tl, tr)) =
            if (lhsIsUpper) (Some(up.fold(bound)(math.min(_, bound))), lo)
            else (up, Some(lo.fold(bound)(math.max(_, bound))))
        }
      case _ => ()
    }
    bounds.collectFirst {
      case ((tl, tr), (Some(up), Some(lo)))
          if lo <= up && {
            val bandUs = math.max(math.abs(up), math.abs(lo))
            (bandUs + 999999L) / 1000000L <= maxBinSec
          } =>
        val bandUs = math.max(math.abs(up), math.abs(lo))
        (tl, tr, math.max((bandUs + 999999L) / 1000000L, 1L))
    }
  }
}
