package streamline.agg

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct count as a NATIVE Catalyst aggregate
  * (`TypedImperativeAggregate`) — the mergeable-sketch aggregation
  * pattern that makes distinct counting feasible at 100 TB, and the
  * engine-level counterpart of the Flink lineage's `AggregateFunction`
  * surface (which its Table API runtime also compiles to partial/final
  * aggregate calls).
  *
  * Why TypedImperativeAggregate and not an `Aggregator` UDAF: the
  * buffer is the LIVE DataSketches `Union` object held in the
  * partial-aggregation hash map — updated in place per row with zero
  * per-row (de)serialization; it is serialized ONLY at shuffle
  * boundaries (exactly once per map-side partial), where it compacts
  * to ≤ k longs. An `Aggregator` with a binary buffer would pay a
  * deserialize+union per ROW in reduce(). This is the same execution
  * shape as Spark's own built-in `hll_sketch_agg` — implemented here
  * over the theta family, which additionally supports set INTERSECTION
  * / A-NOT-B over the serialized sketches (audience-overlap analytics
  * that HLL cannot express).
  *
  * Scale posture: map-side partials bound the shuffle to
  * (#groups × sketch bytes) per task regardless of row count; sketches
  * of k=4096 are exact below 4096 distincts and ±3% (2σ) beyond —
  * ThetaSketchSpec pins both properties plus merge-order independence.
  */
case class ThetaSketchDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_distinct"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType  => buf.update(v.asInstanceOf[UTF8String].getBytes)
      case t => throw new IllegalArgumentException(
        s"theta_distinct: unsupported input type $t")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any =
    Math.round(buf.getResult.getEstimate)

  // Shuffle form: the compact ordered sketch (≤ k hashes + preamble).
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchDistinct =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchDistinct =
    copy(inputAggBufferOffset = n)
}

object ThetaSketchDistinct {
  /** Column-API entry: `theta_distinct($"user_id")`. */
  def theta_distinct(c: Column): Column =
    GraftShim.column(
      ThetaSketchDistinct(GraftShim.expression(c)).toAggregateExpression())

  /** Column-API entry: `theta_sketch($"user_id")` — the serialized
    * sketch itself, for set algebra downstream. */
  def theta_sketch(c: Column): Column =
    GraftShim.column(
      ThetaSketchBinary(GraftShim.expression(c)).toAggregateExpression())
}

/** Same aggregation as [[ThetaSketchDistinct]] but the OUTPUT is the
  * serialized compact sketch — the mergeable summary a warehouse stores
  * per (day, segment, …) cell so distinct-set ALGEBRA (union /
  * intersection / A-NOT-B, see [[ThetaOps]]) can run later over
  * kilobyte summaries instead of re-scanning the corpus. */
case class ThetaSketchBinary(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType  => buf.update(v.asInstanceOf[UTF8String].getBytes)
      case t => throw new IllegalArgumentException(
        s"theta_sketch: unsupported input type $t")
    }
    buf
  }
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchBinary =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchBinary =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchBinary =
    copy(inputAggBufferOffset = n)
}
