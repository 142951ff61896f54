package streamline

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Layout witnesses for the two write-side maintenance operators:
  * q_sink_compact's 64→4 file collapse with disjoint per-file key
  * ranges, and q_sink_zorder's claim that the z-curve bounds per-file
  * footer min/max in BOTH dimensions where a 1-D sort can only bound
  * its leading key. Both measured on real written files, not assumed. */
class LayoutSpec extends SparkSuite {

  private def perFileRanges(path: String, cols: Seq[String]): DataFrame = {
    val sp = spark
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    sp.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(aggs.head, aggs.tail: _*)
  }

  test("compaction collapses 64 files to 4 with disjoint key ranges") {
    val sp = spark
    import sp.implicits._
    // Run the declared query (it stages small/ and compacted/ itself).
    graft.SparkEntry.queries("q_sink_compact")(sp, sfDir).count()
    val root = streamline.util.Scratch.dir("compact", sfDir)
    val nSmall = sp.read.parquet(s"$root/small")
      .select(input_file_name()).distinct().count()
    assert(nSmall == 64, s"staged fragmentation: $nSmall files")
    val ranges = perFileRanges(s"$root/compacted", Seq("l_orderkey"))
      .orderBy($"min_l_orderkey")
      .collect()
    assert(ranges.length == 4, s"compacted to ${ranges.length} files")
    // Range-partitioned compaction ⇒ per-file orderkey intervals are
    // disjoint, so footer min/max pruning works on the result.
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_l_orderkey") <=
        b.getAs[Long]("min_l_orderkey"),
        "per-file key ranges must not interleave")
    }
  }

  test("z-order bounds per-file min/max in both dimensions; 1-D sort does not") {
    val sp = spark
    import sp.implicits._
    graft.SparkEntry.queries("q_sink_zorder")(sp, sfDir).count()
    val zRoot = streamline.util.Scratch.dir("zorder", sfDir)

    // Contrast layout: same rows, classic 1-D sort on the leading key.
    val oneDim = s"${streamline.util.Scratch.dir("zorder1d", sfDir)}"
    Tables.lineitem(sp, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity")
      .repartitionByRange(8, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(oneDim)

    def avgSpan(path: String, c: String): Double = {
      val r = perFileRanges(path, Seq("l_partkey", "l_suppkey"))
        .agg(avg(col(s"max_$c") - col(s"min_$c"))).head.getDouble(0)
      r
    }
    val full = Tables.lineitem(sp, sfDir)
      .agg(max($"l_suppkey") - min($"l_suppkey")).head.getLong(0).toDouble

    // 1-D layout: leading key tightly bounded, trailing key spans
    // ~the full domain in every file.
    assert(avgSpan(oneDim, "l_suppkey") > 0.8 * full,
      "1-D sort should leave the trailing dimension unbounded per file")
    // Z-order: BOTH dimensions bounded well below the full span.
    assert(avgSpan(zRoot, "l_suppkey") < 0.6 * full,
      "z-order should bound the second dimension per file")
    val fullP = Tables.lineitem(sp, sfDir)
      .agg(max($"l_partkey") - min($"l_partkey")).head.getLong(0).toDouble
    assert(avgSpan(zRoot, "l_partkey") < 0.65 * fullP,
      "z-order should bound the first dimension per file")
  }
}
