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
    def mc(c: org.apache.spark.sql.Column) =
      streamline.expr.BloomProbe.mightContain(c, bfB)
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

  test("the bloom probe is a codegen'd expression, not a UDF fence") {
    val sp = spark; import sp.implicits._
    // The prune runs on the corpus-row-count-sized side, so it must
    // fuse into whole-stage codegen (expr/BloomProbe.scala), where the
    // previous Scala-UDF probe forced interpreted eval (ADVICE r5).
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(1L, 2L, 42L).foreach(bf.putLong)
    val bfB = spark.sparkContext.broadcast(bf)
    val df = spark.range(0, 1000)
      .where(streamline.expr.BloomProbe.mightContain($"id", bfB))
    val got = df.toDF("id").collect().map(_.getLong(0)).toSet
    // no false negatives on the planted members; ~1% fpp elsewhere
    assert(Set(1L, 2L, 42L).subsetOf(got))
    assert(got.size < 100, s"fpp blew up: ${got.size}/1000 passed")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"))
    // the Filter node carries the codegen star — inside a
    // WholeStageCodegen span, not a fallback
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("graft_bloom_might_contain")
        && l.contains("*(")),
      s"bloom probe filter not codegen'd:\n$plan")
  }
}
