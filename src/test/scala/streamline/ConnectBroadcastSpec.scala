package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import streamline.stream.Connect

/** Pins q_stream_connect_broadcast, the UNKEYED broadcast-state
  * witness: global rules reach every data row through a per-batch
  * broadcast of the reloaded rule dim — no shared key, no keyed state.
  * Pinned here: (1) the rule side of [[Connect.applyRules]] is
  * physically BROADCAST (the distribution guarantee; a shuffled rule
  * side would be the keyed form in disguise), and (2) the batch rule
  * application equals an independently-computed as-of join. The
  * end-to-end refresh (rules appearing between drains) is covered by
  * the DuckDB oracle on the full witness. */
class ConnectBroadcastSpec extends SparkSuite {

  private def fixtures = {
    val sp = spark
    import sp.implicits._
    val events = Tables.events(sp, sfDir)
    val rules = events.where($"event_type" === "error")
      .select($"event_id".as("rule_id"), unix_micros($"ts").as("r_ts_us"),
        $"value".as("threshold"))
    val views = events.where($"event_type" === "view")
      .select($"event_id", $"ts", $"user_id", $"value")
    (views, rules)
  }

  test("rule application is shuffle-free (broadcast lookup, no join)") {
    val (views, rules) = fixtures
    val df = Connect.applyRules(views, rules)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The rules reach every row via a broadcast variable + per-row
    // binary search: the data-side plan must carry NO exchange and NO
    // join node at all — the distribution cost of broadcast state is
    // zero on the data path.
    assert("(?i)exchange".r.findFirstIn(plan).isEmpty, plan.take(2000))
    assert("(?i)(sortmerge|broadcasthash|nestedloop)join".r
      .findFirstIn(plan).isEmpty, plan.take(2000))
  }

  test("rule application equals an independent as-of join") {
    val sp = spark
    import sp.implicits._
    val (views, rules) = fixtures
    val got = Connect.applyRules(views, rules)
      .orderBy($"user_id", $"event_id").collect()
    val asOf = views.as("d").join(rules.as("r"),
        $"r.r_ts_us" <= unix_micros($"d.ts"))
      .withColumn("rn", row_number().over(Window
        .partitionBy($"d.event_id")
        .orderBy($"r.r_ts_us".desc, $"r.rule_id".desc)))
      .where($"rn" === 1 &&
        $"d.value".cast("decimal(18,4)") >
          $"r.threshold".cast("decimal(18,4)"))
      .select($"d.user_id", $"d.event_id",
        date_trunc("second", $"d.ts").cast("timestamp_ntz").as("ts"),
        $"d.value", $"r.rule_id", $"r.threshold")
      .orderBy($"user_id", $"event_id").collect()
    assert(got.map(_.toSeq).toSeq == asOf.map(_.toSeq).toSeq)
    assert(got.nonEmpty)
  }

  test("end-to-end witness is non-vacuous and globally keyed") {
    val sp = spark
    import sp.implicits._
    val out = SparkEntry.queries("q_stream_connect_broadcast")(sp, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // Global rules: the applied rule's PUBLISHER must differ from the
    // alerted user on some row — a rule crossing keys is exactly what
    // per-key (keyed-state) routing cannot do.
    val publisher = Tables.events(sp, sfDir)
      .where($"event_type" === "error")
      .select($"event_id", $"user_id").as[(Long, Long)].collect().toMap
    assert(rows.exists(r =>
      publisher(r.getAs[Long]("rule_id")) != r.getAs[Long]("user_id")),
      "some alert must apply a rule published by a DIFFERENT user")
  }
}
