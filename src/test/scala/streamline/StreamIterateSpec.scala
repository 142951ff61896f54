package streamline

import java.nio.file.Files

import graft.SparkSuite
import streamline.batch.Iterate

/** Batching-invariance property for the streaming-iteration feedback
  * loop (q_stream_iterate): the final labels must be IDENTICAL for any
  * split of the edge stream into micro-batches — 1 file (degenerate:
  * plain batch CC), many tiny files, and seeded random batchings —
  * because each batch re-converges against the previous labels' star
  * edges. The declared query's oracle checks one fixed batching; this
  * pins the invariance the composition claims. */
class StreamIterateSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  // two components bridged later by a straggler edge + an isolated pair:
  // the bridge edge landing in a LATE batch is the interesting case
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),        // comp A
    (10L, 11L), (11L, 12L),              // comp B
    (4L, 10L),                           // bridge: A and B merge
    (20L, 21L)) ++                       // isolated pair
    (30L until 40L).map(v => (v, v + 1L)) // a chain

  private def runSplit(parts: Seq[Seq[(Long, Long)]]): Map[Long, Long] = {
    val stage = Files.createTempDirectory("graft_itsplit").toString + "/in"
    parts.zipWithIndex.foreach { case (p, i) =>
      p.toDF("src", "dst").coalesce(1)
        .write.mode("append").parquet(stage)
    }
    Iterate.feedbackCc(spark, stage).as[(Long, Long)].collect().toMap
  }

  test("final labels are identical under any micro-batch split") {
    val whole = runSplit(Seq(edges))
    // ground truth sanity: the bridge merged A and B to min id 1
    assert(whole(12L) == 1L && whole(21L) == 20L && whole(40L) == 30L)
    val rnd = new scala.util.Random(11L)
    val splits = Seq(
      // the bridge edge alone in the FINAL batch: late merge of A and B
      Seq(edges.filterNot(_ == (4L, 10L)), Seq((4L, 10L)))) ++
      (1 to 2).map { _ =>                      // seeded random batchings
        val shuffled = rnd.shuffle(edges)
        shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      }
    splits.zipWithIndex.foreach { case (sp, i) =>
      assert(runSplit(sp) == whole, s"split #$i diverged")
    }
  }
}
