package streamline.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches}
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Set algebra over SERIALIZED theta sketches (agg/ThetaSketch.scala's
  * `theta_sketch` output) — the capability that distinguishes theta
  * from HLL: intersection and difference estimates without touching
  * the raw data. The warehouse pattern at 100 TB: sketch each (day,
  * segment) cell once at ingest, then answer audience-overlap /
  * retention questions by combining kilobyte summaries — these
  * expressions run on sketch-count-sized inputs (a handful of rows),
  * so interpreted eval (CodegenFallback) is deliberate; the heavy,
  * row-count-sized side is the codegen'd aggregation that BUILT the
  * sketches. */
case class ThetaSetEstimate(left: Expression, right: Expression,
                            op: String)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_theta_$op"

  // Fail at analysis time, not with an opaque Memory.wrap / cast error
  // at execution: both children must be serialized sketches (binary)
  // and op must be one of the three set operations.
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BINARY serialized theta sketches, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!Set("intersect", "union", "anotb").contains(op))
      TypeCheckResult.TypeCheckFailure(
        s"unknown theta set operation '$op' (expected intersect|union|anotb)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val est = op match {
      case "intersect" =>
        SetOperation.builder().buildIntersection()
          .intersect(sa, sb).getEstimate
      case "union" =>
        SetOperation.builder().buildUnion().union(sa, sb).getEstimate
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
      case other =>
        throw new IllegalArgumentException(s"theta op: $other")
    }
    Math.round(est)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaOps {
  private def est(a: Column, b: Column, op: String): Column =
    GraftShim.column(ThetaSetEstimate(GraftShim.expression(a),
      GraftShim.expression(b), op))

  /** |A ∩ B| estimate from two serialized sketches. */
  def thetaIntersect(a: Column, b: Column): Column = est(a, b, "intersect")
  /** |A ∪ B| estimate. */
  def thetaUnion(a: Column, b: Column): Column = est(a, b, "union")
  /** |A \ B| estimate. */
  def thetaANotB(a: Column, b: Column): Column = est(a, b, "anotb")
}
