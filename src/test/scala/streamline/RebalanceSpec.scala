package streamline

import graft.SparkSuite
import org.apache.spark.sql.Row
import streamline.stream.OffsetReplay

/** Pins the consumer-group rebalance seam (r12 verdict item 4 — the
  * second half of the broker-free Kafka contract): partition-granular
  * commit ISOLATION (a consumer's commits never move partitions it does
  * not own), the handoff window (a partition rebalanced away from a
  * consumer that sunk-but-never-committed a batch re-delivers under its
  * new owner, and the (part, off) dedup collapses it), and topology
  * invariance (an interleaved two-consumer drain produces the identical
  * exactly-once table as the declared crash-and-rebalance lifecycle). */
class RebalanceSpec extends SparkSuite {

  private def root = streamline.util.Scratch.dir("rebalance", sfDir)

  private def finalRows(): Seq[Row] =
    graft.SparkEntry.queries("q_source_rebalance")(spark, sfDir)
      .collect().toSeq

  test("rebalance with a crashed handoff is invisible; commits are partition-isolated") {
    // fresh lifecycle: stage → epoch 0 (A+B, B crashes uncommitted) →
    // rebalance → epoch 1 (A alone) → drain
    stream.Streams.deleteRec(new java.io.File(root))
    val r0 = finalRows()
    val staged = r0.size
    assert(staged > 0)
    val end = OffsetReplay.endOffsets(spark, root)
    assert(OffsetReplay.committedGroup(root) == end, "log not fully committed")
    // B's handoff-window batch really was re-delivered under A
    val rawAfterHandoff = OffsetReplay.sinkRawCount(spark, root)
    assert(rawAfterHandoff > staged,
      s"no duplicate delivery through the handoff ($rawAfterHandoff <= $staged)")

    // commit isolation, replayed from a clean log on the same stage:
    // A commits one batch on {0,1}; partitions 2,3 must still read 0
    (0 until 4).foreach(p => OffsetReplay.commitPart(root, p, 0L))
    val step = OffsetReplay.stepFor(end)
    OffsetReplay.runConsumer(spark, root, Set(0, 1), step, maxBatches = 1)
    val afterA = OffsetReplay.committedGroup(root)
    assert(afterA(0) > 0L && afterA(1) > 0L, "A made no committed progress")
    assert(afterA(2) == 0L && afterA(3) == 0L,
      s"A's commit touched B's partitions: $afterA")

    // topology invariance: A and B alternate single batches to the end
    // (a live two-consumer group, no crash) — same exactly-once table
    var guard = 0
    while (OffsetReplay.committedGroup(root) != end && guard < 64) {
      OffsetReplay.runConsumer(spark, root, Set(0, 1), step, maxBatches = 1)
      OffsetReplay.runConsumer(spark, root, Set(2, 3), step, maxBatches = 1)
      guard += 1
    }
    assert(OffsetReplay.committedGroup(root) == end, "interleaved drain stalled")
    assert(finalRows() == r0, "two-consumer drain changed the final table")

    // the JOIN direction of a rebalance (the declared query covers
    // LEAVE): A starts as the sole consumer of all partitions; C joins
    // mid-drain and partitions {2,3} move to it — including one A had
    // sunk-but-not-committed (the same handoff window, opposite
    // topology change). Union must still be exactly-once.
    (0 until 4).foreach(p => OffsetReplay.commitPart(root, p, 0L))
    OffsetReplay.runConsumer(spark, root, Set(0, 1, 2, 3), step,
      maxBatches = 1, failBeforeCommit = 0)   // A: sunk, nothing committed
    // C joins: epoch 1 splits the group; both drain from committed = 0,
    // re-delivering A's uncommitted batch on every partition
    var g2 = 0
    while (OffsetReplay.committedGroup(root) != end && g2 < 64) {
      OffsetReplay.runConsumer(spark, root, Set(0, 1), step, maxBatches = 1)
      OffsetReplay.runConsumer(spark, root, Set(2, 3), step, maxBatches = 1)
      g2 += 1
    }
    assert(OffsetReplay.committedGroup(root) == end, "post-join drain stalled")
    assert(finalRows() == r0, "consumer-join rebalance changed the final table")
  }
}
