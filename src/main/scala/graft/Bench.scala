package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/parquet-footer startup costs belong to
    // the session, not to whichever query happens to run first.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // A misspelled query name must fail loudly, not silently time an
    // empty selection and emit a valid-looking {"value":0} line.
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      sys.error(s"unknown queries: ${unknown.mkString(", ")}; " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2f s${if (ok) "" else "  (FAILED)"}")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Also persist to a file: the round-1 driver failed to parse the JSON
    // out of interleaved sbt stdout (BENCH_r01 "parsed": null), so give it
    // a clean secondary channel before the final stdout line.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json)
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    spark.stop()
    Console.out.flush(); System.err.flush()
    println(json)
    Console.out.flush()
  }
}
