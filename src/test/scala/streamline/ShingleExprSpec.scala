package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins [[streamline.expr.Exprs.hashedShingles3]] bitwise against the
  * higher-order spelling it replaced —
  * `transform(shingles3(text), s => xxhash64(s))` — on the corpus AND
  * on the split-semantics edge cases (consecutive spaces create empty
  * words under split(text, " ") limit −1; fewer than 3 words yield an
  * empty array; leading/trailing spaces). Every shingle-pipeline
  * query's candidate generation rides these hash values, so the
  * contract is exact equality, not hash-quality. */
class ShingleExprSpec extends SparkSuite {

  // the HOF reference spelling, inlined (Dedup.shingles3 is the word
  // 3-shingle builder the native expression replaces)
  private def hofHashes(text: org.apache.spark.sql.Column) =
    transform(llm.Dedup.shingles3(text), s => xxhash64(s))

  test("native hashed shingles equal the HOF spelling on the corpus") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val diff = docs.select(
        hofHashes($"text").as("a"),
        streamline.expr.Exprs.hashedShingles3($"text").as("b"))
      .where(not($"a" <=> $"b"))
    assert(diff.count() == 0L)
  }

  test("split-semantics edge cases agree") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val cases = Seq(
      "",                       // no words -> no shingles
      "one",                    // < 3 words
      "one two",                // < 3 words
      "a b c",                  // exactly one shingle
      "a  b c d",               // consecutive spaces = empty word kept
      " a b c",                 // leading space = leading empty word
      "a b c ",                 // trailing space = trailing empty word
      "x y z x y z x y z")
      .toDF("text")
    val rows = cases.select(
        hofHashes($"text").as("a"),
        streamline.expr.Exprs.hashedShingles3($"text").as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }
}
