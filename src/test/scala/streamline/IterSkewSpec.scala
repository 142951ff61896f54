package streamline

import graft.SparkSuite
import streamline.batch.Iterate

/** Skewed-iteration witness for the `graft.iter.aqe` knob
  * (util/Knobs.scala): a power-law edge fixture — one hub vertex
  * owning ~30% of all edges — driven through the q_iter_cc combinator
  * under every knob combination. Pins that (a) the skew path keeps
  * correctness: labels are hash-identical across aqe on/off and
  * broadcast on/off (min-label propagation is order-independent, so
  * any plan divergence WOULD surface as a value diff), and (b) the
  * documented "set graft.iter.aqe=true when a superstep skews" advice
  * composes with the loop instead of breaking convergence (round-10
  * verdict, next-round item 5; timings recorded in SURVEY §7.38). */
class IterSkewSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  // hub vertex 1 owns 6000 of ~20000 edges (~30%); the rest is a
  // seeded random graph over 20k vertices plus a long chain so the
  // loop runs several supersteps
  private lazy val edges: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7L)
    val hub = (2L to 6001L).map(v => 1L -> v)
    val random = Seq.fill(13000)(
      (rnd.nextInt(20000).toLong + 1L, rnd.nextInt(20000).toLong + 1L))
      .filter { case (a, b) => a != b }
    val chain = (20001L until 20100L).map(v => v -> (v + 1L))
    hub ++ random ++ chain
  }

  private def ccUnder(aqe: Boolean, bcast: Boolean): (Map[Long, Long], Long) = {
    val prevAqe = spark.conf.get("graft.iter.aqe", "false")
    val prevB = spark.conf.get("graft.iter.broadcast", "true")
    spark.conf.set("graft.iter.aqe", aqe.toString)
    spark.conf.set("graft.iter.broadcast", bcast.toString)
    try {
      val t0 = System.nanoTime()
      val (df, _) = Iterate.connectedComponents(edges.toDF("src", "dst"))
      val m = df.as[(Long, Long)].collect().toMap
      (m, (System.nanoTime() - t0) / 1000000L)
    } finally {
      spark.conf.set("graft.iter.aqe", prevAqe)
      spark.conf.set("graft.iter.broadcast", prevB)
    }
  }

  test("hub-skewed CC labels are identical across aqe/broadcast paths") {
    val (base, tBase) = ccUnder(aqe = false, bcast = true)
    // sanity: the hub's giant component exists and the chain is intact
    assert(base.size > 15000 && base(1L) == base(6001L))
    assert(base(20050L) == base(20100L))
    for (aqe <- Seq(false, true); bcast <- Seq(false, true)
         if (aqe, bcast) != ((false, true))) {
      val (m, t) = ccUnder(aqe, bcast)
      assert(m == base, s"labels diverged under aqe=$aqe broadcast=$bcast")
      info(f"aqe=$aqe%-5s broadcast=$bcast%-5s ${t}%d ms (base $tBase ms)")
    }
  }
}
