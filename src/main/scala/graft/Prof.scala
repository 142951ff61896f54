package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import streamline.Tables
import streamline.batch.Iterate

/** Scratch profiling main (not part of the declared surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("PROF_CODEGEN", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()
    val month = Tables.orders(spark, dir)
      .where($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-02-01").cast("timestamp"))
    val edges = month
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("src"), ($"l_suppkey" + lit(1000000L)).as("dst"))
      .distinct()
    println(s"[prof] edges=${edges.count()} t=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val (comp, iters) = Iterate.connectedComponents(edges)
    val n = comp.count()
    println(s"[prof] vertices=$n iters=$iters cc_time=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}
