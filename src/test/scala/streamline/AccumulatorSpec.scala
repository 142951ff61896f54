package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Accumulator semantics for q_acc_metrics (batch/Enrich.scala): the
  * malformed counter counts exactly the rows the parse step rejects,
  * and rejected rows never reach the output. */
class AccumulatorSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("malformed rows are counted and excluded, clean rows pass") {
    val acc = spark.sparkContext.longAccumulator("test_malformed")
    val rows = Seq(
      (1L, "a", """{"k": 1}"""),
      (2L, "a", """{"nope": 2}"""), // missing key → malformed
      (3L, "b", "not json at all"), // unparseable → malformed
      (4L, "b", """{"k": 9}"""))
    val out = rows.toDF("event_id", "event_type", "props")
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").as("k"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, et, k) =>
        if (k == null) { acc.add(1L); None } else Some((id, et, k))
      })
      .collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a", "1"), (4L, "b", "9")))
    assert(acc.value == 2L)
  }
}
