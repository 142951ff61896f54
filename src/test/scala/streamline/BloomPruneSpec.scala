package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q_llm_bloom pins (SURVEY.md §2.11): the bloom-pruned decontamination
  * must (1) return EXACTLY the exact-join contamination result — bloom
  * false positives are verified away, and bloom has no false negatives
  * — and (2) actually prune: the broadcast filter must reject most of
  * the corpus shingle stream map-side, because that rejection is the
  * whole 100 TB point (the clean bulk of the corpus never reaches the
  * verify join's shuffle/broadcast probe). */
class BloomPruneSpec extends SparkSuite {

  private val dir01 = "/root/testdata/sf0.01"

  test("bloom-pruned result equals the exact contamination result") {
    val exact = SparkEntry.queries("q_llm_contamination")(spark, dir01)
      .collect().map(_.toSeq).toSet
    val bloom = SparkEntry.queries("q_llm_bloom")(spark, dir01)
      .collect().map(_.toSeq).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
  }

  test("the filter rejects the bulk of the corpus shingles at fpp=1%") {
    val sp = spark; import sp.implicits._
    // Rebuild the same filter the query builds and measure its pass rate
    // on corpus shingles: true matches + ~1% false positives of the
    // non-matching remainder. Anything near 100% would mean the prune
    // is a no-op and the plan degenerates to the exact join.
    val gq = Tables.documents(spark, dir01)
      .select($"doc_id", explode(array_distinct(
        transform(streamline.llm.Dedup.shingles3($"text"),
          s => xxhash64(s)))).as("g"))
    val bench = gq.where($"doc_id" % 50 === 0)
    val bf = bench.stat.bloomFilter("g", math.max(bench.count(), 1L), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mc = udf((g: Long) => bfB.value.mightContainLong(g))
    val corpus = gq.where($"doc_id" % 50 =!= 0)
    val total = corpus.count()
    val passed = corpus.where(mc($"g")).count()
    assert(passed < total / 2,
      s"prune must reject most corpus shingles: passed=$passed total=$total")
    // and it must pass every shingle that actually matches (no false
    // negatives) — the property exactness above depends on
    val matching = corpus.join(bench.select($"g"), Seq("g"), "left_semi")
    assert(matching.where(!mc($"g")).count() == 0L)
  }
}
