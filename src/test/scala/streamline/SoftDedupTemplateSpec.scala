package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_dedup_weight and q_llm_template_prefix against literal
  * in-JVM shingle/prefix walks over the collected sf0.001 documents —
  * independent of both the Spark explode pipeline and the DuckDB
  * list-slice oracle. */
class SoftDedupTemplateSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def docs() = Tables.documents(spark, sfDir)
    .select("doc_id", "text", "source").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("soft-dedup weights match a literal shingle-df walk") {
    val ds = docs()
    val shingles = ds.flatMap { case (id, text, _) =>
      val ws = text.split(" ")
      if (ws.length < 5) Seq.empty
      else ws.sliding(5).map(w => (id, w.mkString(" "))).toSeq
    }
    val df = shingles.groupBy(_._2).map { case (s, xs) => s -> xs.length }
    val expected = shingles.groupBy(_._1).toSeq.map { case (id, xs) =>
      val nUniq = xs.count(x => df(x._2) == 1).toLong
      (id, xs.length.toLong, nUniq, r6(BigInt(nUniq), BigInt(xs.length)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_dedup_weight")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // the weighting is real: some doc is fully unique, some is not
    assert(got.exists(_._4 == 1.0) && got.exists(_._4 < 1.0))
  }

  test("template prefixes match a literal opening-3-gram count") {
    val ds = docs()
    val pre = ds.map { case (_, text, src) =>
      (text.split(" ").take(3).mkString(" "), src)
    }
    val expected = pre.groupBy(_._1).toSeq
      .map { case (p, xs) =>
        (p, xs.length.toLong, xs.map(_._2).distinct.length.toLong)
      }
      .filter(_._2 >= 2)
      .sortBy(x => (-x._2, x._1))
    val got = SparkEntry.queries("q_llm_template_prefix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === expected)
    // some template spans more than one source (crawler boilerplate)
    assert(got.exists(_._3 > 1L))
  }
}
