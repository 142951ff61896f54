package streamline

import graft.{SparkEntry, SparkSuite}

/** q_sink_foreach: the ForeachWriter contract. The (partitionId,
  * epochId)-named temp+rename publish must make re-delivery idempotent:
  * running the whole drain twice republishes the same files instead of
  * appending duplicates. */
class ForeachSinkSpec extends SparkSuite {

  test("re-running the foreach sink republishes, never duplicates") {
    val q = SparkEntry.queries("q_sink_foreach")
    val first = q(spark, sfDir).count()
    val second = q(spark, sfDir).count()
    assert(first > 0)
    assert(first == second,
      s"duplicate rows after re-delivery: $first -> $second")
  }

  test("no unpublished temp files survive a clean drain") {
    SparkEntry.queries("q_sink_foreach")(spark, sfDir).count(): Unit
    val dir = new java.io.File(
      streamline.util.Scratch.dir("feach", sfDir))
    val leftovers = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
  }
}
