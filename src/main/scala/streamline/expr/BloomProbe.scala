package streamline.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(g)` over a driver-built, broadcast Bloom filter, as a
  * codegen'd Catalyst expression. The probe sits on the CORPUS-sized
  * side of the q_llm_bloom decontamination plan — the row count the
  * whole design exists to keep cheap — so a Scala UDF there (boxing,
  * interpreted call, codegen fence) taxes exactly the wrong place.
  * This expression fuses into whole-stage codegen: one virtual call
  * into the broadcast filter per row, no boxing, and the surrounding
  * filter/project pipeline stays compiled (pinned by BloomPruneSpec).
  */
case class BloomMightContain(child: Expression,
                             filter: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName probes xxhash64 shingles and requires BIGINT, " +
        s"got ${child.dataType.simpleString}")

  override protected def nullSafeEval(g: Any): Any =
    filter.value.mightContainLong(g.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // The broadcast handle is a plan-level reference object; each
    // generated task resolves .value() once per partition via the
    // lazily cached broadcast, then probes per row.
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, g =>
      s"""${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bf.value()).mightContainLong($g);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomProbe {
  def mightContain(g: Column, filter: Broadcast[BloomFilter]): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(g), filter))
}
