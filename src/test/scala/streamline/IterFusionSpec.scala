package streamline

import graft.SparkSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import streamline.batch.Iterate

/** Pins the observe-fused iteration internals (r21 optimization): the
  * convergence metric rides the superstep's own localCheckpoint job via
  * CollectMetrics instead of a second aggregation action, so the fused
  * loop must (a) rely on Observation completing under an eager
  * localCheckpoint — the Spark behavior the whole fusion stands on —
  * and (b) agree with the unfused closure-metric combinator step for
  * step. */
class IterFusionSpec extends SparkSuite {
  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("Observation completes under an eager localCheckpoint (no separate action)") {
    val obs = Observation()
    val df = Seq(1L, 2L, 3L).toDF("x")
      .observe(obs, coalesce(sum($"x"), lit(0L)).as("m"))
      .localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // obs.get blocks until the metric arrives; a bounded wait turns a
    // regression (metric never fires on checkpoint) into a test failure
    // instead of a hang.
    val got = Await.result(Future(obs.get), 60.seconds)
    assert(got.get("m").contains(6L), s"metrics=$got")
    assert(df.count() == 3)
  }

  test("fixpointObserved matches fixpoint: same superstep count, same fixed point") {
    // Min-label propagation on a chain — the CC step shape.
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val und = edges.union(edges.select($"dst", $"src")).toDF("src", "dst")
    val init = und.select($"src".as("v"), $"src".as("comp"))
      .union(und.select($"src".as("v"), $"dst".as("comp")))
      .groupBy($"v").agg(min($"comp").as("comp"))
    def step(comp: org.apache.spark.sql.DataFrame) = {
      val fromN = und.join(comp, und("src") === comp("v"))
        .select(und("dst").as("v"), comp("comp"))
      comp.union(fromN).groupBy($"v").agg(min($"comp").as("comp"))
    }
    val (a, itA) = Iterate.fixpoint(init, 50)(step)(
      _.agg(coalesce(sum($"comp"), lit(0L))).as[Long].head())
    val (b, itB) = Iterate.fixpointObserved(init, 50)(step)(
      coalesce(sum($"comp"), lit(0L)))
    assert(itA == itB)
    assert(a.as[(Long, Long)].collect().toMap ==
      b.as[(Long, Long)].collect().toMap)
  }

  test("fixpointObserved converges on an empty frame (null-sum guard)") {
    val init = Seq.empty[(Long, Long)].toDF("v", "comp")
    val (out, iters) = Iterate.fixpointObserved(init, 10)(identity)(
      coalesce(sum($"comp"), lit(0L)))
    assert(out.isEmpty && iters == 1)
  }

  test("fixpointObserved respects the cap and requireConverged") {
    val init = Seq((1L, 100L)).toDF("v", "comp")
    val (_, iters) = Iterate.fixpointObserved(init, 5) { df =>
      df.select($"v", ($"comp" - 1L).as("comp"))
    }(coalesce(sum($"comp"), lit(0L)))
    assert(iters == 5)
    val e = intercept[IllegalStateException] {
      Iterate.fixpointObserved(init, 3, requireConverged = true) { df =>
        df.select($"v", ($"comp" - 1L).as("comp"))
      }(coalesce(sum($"comp"), lit(0L)))
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }
}
