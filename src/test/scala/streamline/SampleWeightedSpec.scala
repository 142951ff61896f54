package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_sample_weighted's pure-BIGINT weighted cut against an
  * in-JVM recomputation (java MessageDigest md5 — independent of both
  * Spark's and DuckDB's md5/conv paths) and its statistical contract:
  * the realized sample rate must sit near E[rate] = Σw/(4·max_w·N).
  */
class SampleWeightedSpec extends SparkSuite {

  private def hash32(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("kept set equals the in-JVM recomputed cut, exactly") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val maxW = docs.map(_._3).max
    val expected = docs.collect {
      case (id, text, w) if hash32(text) * maxW * 4L < w * 4294967296L => id
    }.toSet
    val got = SparkEntry.queries("q_llm_sample_weighted")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // weight-proportional by construction: every kept doc passes the
    // inequality, and the realized rate is near the analytic expectation
    val expRate = docs.map(_._3).sum.toDouble / (4.0 * maxW * docs.length)
    val rate = got.size.toDouble / docs.length
    assert(math.abs(rate - expRate) < 0.06,
      s"rate $rate vs expected $expRate")
  }
}
