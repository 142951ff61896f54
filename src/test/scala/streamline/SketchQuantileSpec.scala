package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q_agg_approx_quantile is oracle-omitted (sketch output is
  * engine-specific), so its correctness witness lives here: with
  * accuracy 10000 >> group sizes at sf0.001 the GK sketch's rank error
  * is below one element, so the returned value must satisfy the exact
  * rank property of its percentile within each group — and must agree
  * with the exact interpolated percentiles of q_agg_percentile to
  * within one inter-element gap.
  */
class SketchQuantileSpec extends SparkSuite {

  test("approx_percentile satisfies the exact median rank property") {
    val s = spark
    import s.implicits._
    val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, sfDir)
      .select($"c_mktsegment", $"med_bal", $"p90_bal")
    val base = Tables.customer(spark, sfDir)
      .join(approx, "c_mktsegment")
    val ranks = base.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when($"c_acctbal" <= $"med_bal", 1L).otherwise(0L)).as("le_med"),
        sum(when($"c_acctbal" >= $"med_bal", 1L).otherwise(0L)).as("ge_med"),
        sum(when($"c_acctbal" <= $"p90_bal", 1L).otherwise(0L)).as("le_p90"))
      .collect()
    assert(ranks.nonEmpty)
    ranks.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(r.getAs[Long]("le_med") >= n / 2 - 1,
        s"median rank too low in ${r.get(0)}")
      assert(r.getAs[Long]("ge_med") >= n / 2 - 1,
        s"median rank too high in ${r.get(0)}")
      assert(r.getAs[Long]("le_p90") >= 0.9 * n - 1,
        s"p90 rank too low in ${r.get(0)}")
    }
  }

  test("sketch quantiles track the exact interpolated percentiles") {
    val s = spark
    import s.implicits._
    val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, sfDir)
      .select($"c_mktsegment", $"med_bal".as("a_med"), $"p90_bal".as("a_p90"))
    val exact = SparkEntry.queries("q_agg_percentile")(spark, sfDir)
      .select($"c_mktsegment", $"med_bal".as("e_med"), $"p90_bal".as("e_p90"))
    val joined = approx.join(exact, "c_mktsegment").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // acctbal spans ~[-1000, 10000]; sketch-vs-interpolation can
      // differ by at most one inter-element gap per group.
      assert(math.abs(r.getAs[Double]("a_med") - r.getAs[Double]("e_med"))
        < 200.0, r.toString)
      assert(math.abs(r.getAs[Double]("a_p90") - r.getAs[Double]("e_p90"))
        < 200.0, r.toString)
    }
  }
}
