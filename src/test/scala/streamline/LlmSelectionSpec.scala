package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 selection operators: q_llm_semdedup
  * (SemDeDup — within-cluster semantic prune) and q_llm_dsir (DSIR —
  * importance-ratio data selection). Both carry full DuckDB oracles;
  * these tests pin the RULES (keep-lowest-id, target-slice enrichment,
  * exact quarter cut) independently of the oracle hash. */
class LlmSelectionSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("semdedup prunes exactly the vectors with a lower-id close neighbor") {
    val embs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = embs.groupBy(_._2)
    val expectKeep = embs.map { case (id, lab, emb) =>
      id -> !byLabel(lab).exists { case (id2, _, emb2) =>
        id2 < id && BigDecimal(cos(emb2, emb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.3")
      }
    }.toMap
    val got = graft.SparkEntry.queries("q_llm_semdedup")(spark, sfDir)
      .as[(Long, Int, Boolean)].collect()
    assert(got.length == embs.length)
    got.foreach { case (id, _, keep) =>
      assert(keep == expectKeep(id), s"vec $id")
    }
    // the rule actually fires on the fixture
    assert(got.count(!_._3) > 0)
  }

  test("temperature mixing hits the budget exactly and up-samples small langs") {
    val got = graft.SparkEntry.queries("q_llm_mix_temperature")(spark, sfDir)
      .as[(Long, String, Long)].collect()
    assert(got.length == 200, s"budget missed: ${got.length}")
    val quota = got.groupBy(_._2).map { case (l, rs) => l -> rs.length }
    assert(quota.values.sum == 200)
    // α = 0.5 flattens the distribution: every minority language's
    // quota share must EXCEED its raw corpus share, the majority's
    // must shrink — the point of temperature sampling
    val raw = Tables.documents(spark, sfDir).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val nTot = raw.values.sum.toDouble
    quota.foreach { case (l, q) =>
      val (qs, rs) = (q / 200.0, raw(l) / nTot)
      if (l == "en") assert(qs < rs, s"majority $l not down-sampled")
      else assert(qs > rs, s"minority $l not up-sampled ($qs <= $rs)")
    }
  }

  test("temperature-mix selection is identical across partition counts") {
    def run(): Set[(Long, String, Long)] =
      graft.SparkEntry.queries("q_llm_mix_temperature")(spark, sfDir)
        .as[(Long, String, Long)].collect().toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val at4 = run()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == at4, "selection moved with the partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dsir scores are bit-identical across partition counts") {
    // the rounded-decimal ratio sum is the order-independence claim:
    // a raw double sum would drift with partitioning, this must not
    def run(): Seq[(Long, Double, Boolean)] =
      graft.SparkEntry.queries("q_llm_dsir")(spark, sfDir)
        .as[(Long, Double, Boolean)].collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val at4 = run()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == at4, "scores moved with the partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dsir releases every internal cache before returning (no session leak)") {
    // r11 verdict item 4: `scores` used to stay cached for the session.
    // The operator may persist internally, but nothing it registered
    // may outlive the RESULT's lifetime: explicit persists must be
    // gone once the result is materialized, and the scores
    // localCheckpoint blocks (r21: the leak-free replacement for the
    // old persist + recompute-on-return shape) must be released by the
    // ContextCleaner once the returned frame is unreachable — poll
    // under GC pressure rather than asserting an instant, because the
    // cleaner works off a reference queue.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.SparkEntry.queries("q_llm_dsir")(spark, sfDir).collect(): Unit
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.currentTimeMillis() + 30000
    while (leaked.nonEmpty && System.currentTimeMillis() < deadline) {
      System.gc()
      Thread.sleep(250)
    }
    assert(leaked.isEmpty, s"dsir left persisted RDDs pinned: $leaked")
  }

  test("dsir hashed-feature space is bounded at 4096 on an open vocabulary") {
    // the paper's boundedness mechanism (r11 verdict item 7): the
    // ratio table is keyed by the feature, so the feature image IS the
    // broadcast size. 20k distinct synthetic words — far beyond any
    // fixture vocabulary — must land in <= 4096 buckets, and spread
    // across most of them (a degenerate hash would collapse the model).
    val buckets = spark.range(20000)
      .select(streamline.llm.Pipeline
        .dsirHashBucket(concat(lit("w"), $"id".cast("string"))).as("b"))
    val distinct = buckets.distinct().count()
    assert(distinct <= 4096, s"feature space leaked: $distinct buckets")
    assert(distinct > 3900, s"hash not spreading: $distinct buckets")
    assert(buckets.agg(min($"b"), max($"b")).as[(Long, Long)].head()._1 >= 0)
  }

  test("dsir_hashed is quota-exact and partition-count invariant") {
    def run(): Seq[(Long, Double, Boolean)] =
      graft.SparkEntry.queries("q_llm_dsir_hashed")(spark, sfDir)
        .as[(Long, Double, Boolean)].collect().toSeq
    val at4 = run()
    assert(at4.count(_._3) == at4.size / 4)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == at4, "hashed scores moved with the partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("dsir selects exactly a quarter, enriched in the target slice") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val got = graft.SparkEntry.queries("q_llm_dsir")(spark, sfDir)
      .as[(Long, Double, Boolean)].collect()
    assert(got.length == docs.size)
    assert(got.count(_._3) == docs.size / 4)
    assert(got.forall(r => !r._2.isNaN && !r._2.isInfinite))
    // importance sampling toward lang='en' must over-represent it:
    // the selected quarter's en-fraction exceeds the corpus's
    val enAll = docs.valuesIterator.count(_ == "en").toDouble / docs.size
    val sel = got.filter(_._3)
    val enSel = sel.count(r => docs(r._1) == "en").toDouble / sel.length
    assert(enSel > enAll, f"selected en-frac $enSel%.2f vs corpus $enAll%.2f")
    // rank cut is honest: every selected score >= every unselected one
    val minSel = sel.map(_._2).min
    val maxUnsel = got.filter(!_._3).map(_._2).max
    assert(minSel >= maxUnsel, s"$minSel < $maxUnsel")
  }
}
