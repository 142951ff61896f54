package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object Prof {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stage = sys.env.getOrElse("PROF_STAGE", "full")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup-count")(docs.count())
    val toks = docs.select($"doc_id",
      explode(split(lower($"text"), "[^a-z]+")).as("term")).where($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfc = tf.withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
    val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"term".asc)
    val ndocs = docs.agg(count(lit(1)).as("n_docs"))
    val joined = dfc.crossJoin(broadcast(ndocs))
    val full = joined
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tf", $"df",
        round($"tf" * log($"n_docs".cast("double") / $"df".cast("double")), 4).as("score"))
    val sel: DataFrame = stage match {
      case "toks"   => toks
      case "tf"     => tf
      case "dfc"    => dfc
      case "joined" => joined
      case "full"   => full
    }
    time(s"cold-$stage")(sel.count())
    time(s"warm-$stage")(sel.count())
    spark.stop()
  }
}
