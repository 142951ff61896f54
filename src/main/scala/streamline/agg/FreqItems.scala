package streamline.agg

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) aggregation as a NATIVE Catalyst
  * `TypedImperativeAggregate` over the DataSketches frequencies sketch
  * — the Misra–Gries / SpaceSaving family: a bounded map of at most
  * `maxMapSize` counters that answers "which items exceed an n/k
  * frequency floor" over any stream, with deterministic guarantees
  * (every item of true count > n/maxMapSize IS reported —
  * NO_FALSE_NEGATIVES — and every estimate sits within
  * [lowerBound, upperBound] with upper − lower ≤ the sketch's
  * maximum error) even though the exact estimates depend on merge
  * order. The top-k-by-count twin of [[ThetaSketchDistinct]]'s
  * distinct counting: same execution shape — live sketch in the
  * partial-aggregation map, serialized once per map-side partial at
  * the shuffle boundary, merged associatively on the reduce side — so
  * the shuffle carries (#groups × sketch bytes) regardless of row
  * count. The exact q_topk window is the small-data twin; this is the
  * 100 TB path when the group's item domain no longer fits a hash
  * aggregate.
  *
  * Output: array of (item, est, lb, ub) structs, NO_FALSE_NEGATIVES,
  * ordered (est DESC, item ASC). FreqItemsSpec pins exactness below
  * capacity, the planted-heavy-hitter guarantee, bound validity under
  * different partitionings, and the n/k error ceiling.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  // Declared so misuse (non-string child) is rejected at ANALYSIS time
  // instead of a mid-job ClassCastException in update()'s UTF8String
  // cast. (AbstractDataType is private[sql] in Spark 4, so the
  // equivalent check is spelled via checkInputDataTypes.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING column, " +
        s"got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("lb", LongType),
    StructField("ub", LongType))))

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
    new GenericArrayData(rows.map(r => InternalRow(
      UTF8String.fromString(r.getItem),
      r.getEstimate, r.getLowerBound, r.getUpperBound)))
  }

  // not Serializable upstream — recreate per executor, never ship it
  @transient private lazy val serde = new ArrayOfStringsSerDe()

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
}

object FreqItemsAgg {
  /** Column-API entry: `freq_items($"word", 256)`. */
  def freq_items(c: Column, maxMapSize: Int): Column =
    GraftShim.column(
      FreqItemsAgg(GraftShim.expression(c), maxMapSize)
        .toAggregateExpression())
}
