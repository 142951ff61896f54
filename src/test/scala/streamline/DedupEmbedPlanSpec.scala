package streamline

import graft.{SparkEntry, SparkSuite}

/** Plan-shape witnesses for the round-2 scale fixes: the exact
  * embedding near-dup query must run as a keyed block join (no
  * cartesian node), and the as-of join must run as the union +
  * last-value window composition (no join node at all, hence no
  * per-key pair materialization).
  */
class DedupEmbedPlanSpec extends SparkSuite {

  test("q_llm_dedup_embed plans a keyed join, not a cartesian") {
    val df = SparkEntry.queries("q_llm_dedup_embed")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("q_join_asof plans a window pass, not a range join") {
    val df = SparkEntry.queries("q_join_asof")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("q_llm_dedup_embed block join equals the brute-force result") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import streamline.expr.Exprs
    val got = SparkEntry.queries("q_llm_dedup_embed")(spark, sfDir).collect()
    val a = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id_a"), $"embedding".as("emb_a"))
    val b = Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id_b"), $"embedding".as("emb_b"))
    val brute = a.crossJoin(b).where($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        round(Exprs.cosine($"emb_a", $"emb_b"), 6).as("cos"))
      .where($"cos" >= 0.35)
      .orderBy($"id_a", $"id_b").collect()
    assert(got.toSeq == brute.toSeq)
  }
}
