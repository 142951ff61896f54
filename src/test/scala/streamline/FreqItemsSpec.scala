package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import streamline.agg.FreqItemsAgg.freq_items

/** The Misra–Gries frequent-items aggregate (q_agg_freq_items):
  * deterministic guarantees that hold REGARDLESS of partial-merge
  * order, which is what licenses the no-oracle declaration. */
class FreqItemsSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  private def sketch(words: Seq[String], k: Int, parts: Int)
      : Map[String, (Long, Long, Long)] =
    words.toDF("w").repartition(parts)
      .agg(freq_items($"w", k).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.est", $"h.lb", $"h.ub")
      .as[(String, Long, Long, Long)].collect()
      .map { case (i, e, l, u) => i -> (e, l, u) }.toMap

  test("below capacity the sketch is exact for every item") {
    val words = (1 to 40).flatMap(i => Seq.fill(i)(s"w$i"))
    val got = sketch(words, 256, 5)
    (1 to 40).foreach { i =>
      val (e, l, u) = got(s"w$i")
      assert(e == i && l == i && u == i, s"w$i -> ($e,$l,$u)")
    }
  }

  test("planted heavy hitter is always reported with valid bounds") {
    // 1000 copies of "hot" in a sea of 4000 singletons, tiny sketch:
    // true count 1000 > n/k = 5000/64, so NO_FALSE_NEGATIVES must
    // report it under any partitioning, and truth must sit in [lb,ub].
    val words = Seq.fill(1000)("hot") ++ (1 to 4000).map(i => s"cold$i")
    for (parts <- Seq(1, 7)) {
      val got = sketch(words, 64, parts)
      assert(got.contains("hot"), s"parts=$parts: ${got.keys.take(5)}")
      val (e, l, u) = got("hot")
      assert(l <= 1000 && 1000 <= u, s"parts=$parts bounds ($l,$u)")
      assert(l <= e && e <= u)
      // error ceiling: the DataSketches frequencies a-priori bound is
      // ~3.5n/maxMapSize (purges trigger at 75% load, not at k)
      assert(u - l <= 3.5 * words.size / 64, s"err ${u - l}")
    }
  }

  test("the declared query returns ranked heavy hitters per language") {
    val df = graft.SparkEntry.queries("q_agg_freq_items")(spark, sfDir)
    val rows = df.as[(String, Int, String, Long)].collect()
    assert(rows.nonEmpty)
    // per language: positions strictly ranked, estimates non-increasing
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byPos = rs.sortBy(_._2)
      assert(byPos.map(_._2).toSeq == byPos.indices.toSeq, lang)
      assert(byPos.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, lang)
    }
  }

  test("non-string input is rejected at analysis time, not mid-job") {
    val df = Seq(1L, 2L, 2L).toDF("n")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(freq_items($"n", 16)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }
}
