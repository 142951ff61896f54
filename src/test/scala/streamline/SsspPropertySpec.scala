package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import streamline.batch.Iterate

/** Property test for the vertex-centric SSSP: the distributed
  * message/combine/update loop must agree with a driver-side
  * Bellman-Ford on random weighted graphs — including unreachable
  * vertices (absent from the result) and the ≤maxHops bound semantics.
  * Fixed seeds, same convention as PropertySpec. */
class SsspPropertySpec extends SparkSuite {

  private def graphGen: Gen[List[(Long, Long, Long)]] = for {
    nV <- Gen.choose(5, 9)
    nE <- Gen.choose(4, 14)
    edges <- Gen.listOfN(nE, for {
      a <- Gen.choose(1L, nV.toLong)
      b <- Gen.choose(1L, nV.toLong)
      w <- Gen.choose(1L, 9L)
    } yield (a, b, w))
  } yield edges.filter(e => e._1 != e._2)

  /** Driver-side reference: Bellman-Ford over the undirected edge set,
    * exactly maxHops relaxation rounds from the min vertex. */
  private def ref(edges: Seq[(Long, Long, Long)],
                  maxHops: Int): Map[Long, Long] = {
    val und = edges ++ edges.map(e => (e._2, e._1, e._3))
    if (und.isEmpty) return Map.empty
    val source = und.map(_._1).min
    var dist = Map(source -> 0L)
    (1 to maxHops).foreach { _ =>
      val next = collection.mutable.Map(dist.toSeq: _*)
      und.foreach { case (a, b, w) =>
        dist.get(a).foreach { da =>
          if (next.get(b).forall(_ > da + w)) next(b) = da + w
        }
      }
      dist = next.toMap
    }
    dist
  }

  test("vertexCentric SSSP equals driver-side Bellman-Ford on random graphs") {
    val sp = spark; import sp.implicits._
    val maxHops = 8
    (1L to 6L).foreach { seed =>
      val edges = graphGen(Gen.Parameters.default, Seed(seed)).get
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst", "w")
        val und = df.union(df.select($"dst".as("src"), $"src".as("dst"),
          $"w")).persist()
        val source = und.agg(min($"src")).as[Long].head()
        val init = Seq((source, 0L)).toDF("v", "dist")
        val (fixed, _) = Iterate.vertexCentric(init, "v", maxHops) { ws =>
          und.join(broadcast(ws), und("src") === ws("v"))
            .select(und("dst").as("v"), (ws("dist") + und("w")).as("msg"))
        } { msgs => msgs.groupBy($"v").agg(min($"msg").as("msg"))
        } { (solution, combined) =>
          combined.join(broadcast(solution), Seq("v"), "left_outer")
            .where($"dist".isNull || $"msg" < $"dist")
            .select($"v", $"msg".as("dist"))
        }
        val got = fixed.as[(Long, Long)].collect().toMap
        und.unpersist()
        assert(got == ref(edges, maxHops), s"seed $seed edges $edges")
      }
    }
  }
}
