package streamline

import graft.SparkSuite
import streamline.batch.Relational

/** q_source_corrupt pins: malformed lines must be QUARANTINED (whole
  * line captured in the corrupt-record column), not silently dropped
  * and not fatal — and exactly the injected lines land there. */
class CorruptSourceSpec extends SparkSuite {

  test("the three injected malformed lines land in quarantine, nothing else") {
    val sp = spark; import sp.implicits._
    // cache first: Spark disallows queries over the raw file whose
    // referenced columns reduce to only the corrupt-record column
    val raw = Relational.corruptSourceRaw(spark, sfDir).cache()
    val quarantined = raw.where($"_quarantine".isNotNull)
      .select($"_quarantine", $"s_suppkey")
      .collect()
    assert(quarantined.length == 3, quarantined.mkString("; "))
    // the whole raw line is preserved for triage
    val lines = quarantined.map(_.getString(0)).sorted
    assert(lines.contains("not json at all"))
    assert(lines.exists(_.startsWith("""{"s_suppkey": 900001""")))
    // valid rows parse with null quarantine and full fidelity
    val valid = raw.where($"_quarantine".isNull).count()
    val expected = Tables.supplier(spark, sfDir).count()
    raw.unpersist() // shared session — don't hold the cache
    assert(valid == expected)
  }

  test("gzip jsonl source reads with file-level parallelism") {
    // q_source_jsonl_gz's scale claim: gzip is unsplittable, so the
    // write shards BEFORE compressing and the read side must see one
    // task per shard — a single fused .gz would scan on one core.
    val sp = spark; import sp.implicits._
    graft.SparkEntry.queries("q_source_jsonl_gz")(spark, sfDir).count()
    val tmp = streamline.util.Scratch.dir("jsonl_gz", sfDir)
    val gzFiles = new java.io.File(tmp).listFiles()
      .count(_.getName.endsWith(".json.gz"))
    assert(gzFiles >= 2, s"expected sharded .gz output, got $gzFiles file(s)")
    val parts = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(tmp).rdd.getNumPartitions
    assert(parts >= gzFiles,
      s"gz read planned $parts partition(s) for $gzFiles shards")
  }
}
