package streamline

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Processing-time window semantics (SURVEY.md §2.9 / q_stream_proctime):
  * wall-clock window assignment is nondeterministic, but every row is
  * assigned to EXACTLY one window — so counts normalized across
  * windows equal the input counts, whatever the batch timing. */
class ProcTimeSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("rows are window-assigned exactly once across spaced batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val name = s"proctime_spec_${System.identityHashCode(input)}"
    val agg = input.toDF().toDF("v")
      .withColumn("p_ts", current_timestamp())
      .groupBy(window($"p_ts", "1 second"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    input.addData(1L to 5L: _*)
    q.processAllAvailable()
    // Push the second batch past at least one window boundary so the
    // scenario (usually) spans two windows; the invariant below must
    // hold regardless of how the clock actually fell.
    Thread.sleep(1200)
    input.addData(6L to 8L: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .groupBy($"window").agg(max($"n").as("n"))
    val total = rows.agg(sum($"n")).as[Long].head()
    assert(total == 8L)
    // every emitted window is the requested 1-second width
    val widths = rows
      .select((unix_millis($"window.end") - unix_millis($"window.start"))
        .as("w"))
      .distinct().as[Long].collect().toSet
    assert(widths == Set(1000L))
  }
}
