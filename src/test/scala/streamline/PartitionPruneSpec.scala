package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_sink_partitioned's scale claim: the lang predicate on the
  * partitioned read-back is resolved against directory names at
  * planning (PartitionFilters on the scan), not row-by-row — so a
  * selective read opens only the matching partition's files. */
class PartitionPruneSpec extends SparkSuite {

  test("partitioned read-back plans a PartitionFilter on lang") {
    val df = SparkEntry.queries("q_sink_partitioned")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters"),
      "expected a FileSourceScan with partition filters")
    // the lang predicate must appear among the PARTITION filters (not
    // as a post-scan data filter)
    val pf = scan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"lang not in partition filters: $pf")
  }
}
