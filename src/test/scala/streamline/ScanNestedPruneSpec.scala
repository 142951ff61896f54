package streamline

import graft.SparkSuite
import streamline.batch.Relational

/** Plan pin for q_scan_nested_prune: the parquet ReadSchema must carry
  * ONLY the projected sub-field of the staged `meta` struct — sibling
  * sub-fields appearing in the scan would mean nested schema pruning
  * regressed and a 100 TB envelope scan reads bytes it never uses. */
class ScanNestedPruneSpec extends SparkSuite {

  test("the parquet scan reads only meta.etype, not its siblings") {
    val plan = Relational.scanNestedPruneDf(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scan = plan.split('\n').find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema line in:\n$plan"))
    assert(scan.contains("etype"), scan)
    assert(!scan.contains("user") && !scan.contains("v:double"),
      s"sibling sub-fields survived pruning: $scan")
  }
}
