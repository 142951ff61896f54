package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._
import streamline.llm.Spans

/** In-JVM independent oracles for the §2.11 span-statistics operators:
  * each query is recomputed from the collected fixture with plain Scala
  * collections (a different algorithm and execution substrate than the
  * DataFrame plans) and compared exactly. The fixture is 500 docs, so
  * the collected recomputation is test-only by construction.
  */
class SpansSpec extends SparkSuite {

  private val K = 8

  private def docs: Seq[(Long, Array[String])] = {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq
      .map { case (id, t) => (id, t.split(' ')) }
  }

  test("kgrams column matches Scala sliding windows") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val got = Tables.documents(spark, sfDir)
      .select($"doc_id", Spans.kgrams($"text", K).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, w) =>
      val want =
        if (w.length < K) Seq.empty
        else w.sliding(K).map(_.mkString(" ")).toSeq
      assert(got(id) == want, s"doc $id")
    }
  }

  test("q_llm_dedup_span matches an in-JVM recomputation") {
    val byDoc = docs.toMap
    val grams = docs.flatMap { case (id, w) =>
      if (w.length < K) Seq.empty
      else w.sliding(K).zipWithIndex.map { case (g, i) =>
        (id, i, g.mkString(" "))
      }
    }
    val dupGrams = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val dupPos = grams.filter(g => dupGrams(g._3))
    val spans = dupPos.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cov = dupPos
      .flatMap { case (id, p, _) => (p until p + K).map(id -> _) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = graft.SparkEntry.queries("q_llm_dedup_span")(spark, sfDir)
      .collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val nTok = byDoc(id).length.toLong
      assert(r.getLong(1) == nTok, s"n_tok doc $id")
      assert(r.getLong(2) == spans.getOrElse(id, 0L), s"dup_spans doc $id")
      assert(r.getLong(3) == cov.getOrElse(id, 0L), s"dup_tokens doc $id")
      val frac = cov.getOrElse(id, 0L).toDouble / nTok
      assert(math.abs(r.getDouble(4) - frac) < 1e-6, s"dup_frac doc $id")
    }
    // Non-vacuity: the fixture contains genuinely duplicated spans.
    assert(got.exists(_.getLong(2) > 0))
  }

  test("q_llm_pmi matches an in-JVM recomputation") {
    val toks = docs.flatMap(_._2)
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nuni = toks.size.toLong
    val bigrams = docs.flatMap { case (_, w) => w.sliding(2).filter(_.length == 2) }
      .map(p => (p(0), p(1)))
    val nbi = bigrams.size.toLong
    val cab = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    val want = cab.toSeq.map { case ((a, b), c) =>
      val pmi = math.log(c.toDouble * nuni * nuni /
        (nbi.toDouble * uni(a) * uni(b))) / math.log(2.0)
      (a, b, c, pmi)
    }.sortBy { case (a, b, _, pmi) =>
      (-math.rint(pmi * 1e6), a, b)
    }.take(100)
    val got = graft.SparkEntry.queries("q_llm_pmi")(spark, sfDir).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, (a, b, c, pmi)) =>
      assert(r.getString(0) == a && r.getString(1) == b,
        s"pair order: got (${r.getString(0)},${r.getString(1)}) want ($a,$b)")
      assert(r.getLong(2) == c)
      assert(r.getLong(3) == uni(a) && r.getLong(4) == uni(b))
      assert(math.abs(r.getDouble(5) - pmi) < 1e-5)
    }
  }

  test("q_llm_tfidf_pairs matches an in-JVM recomputation") {
    val sig = docs.map { case (id, w) =>
      val shingles = w.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      val top = shingles.toSeq.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .sortBy { case (tok, tf) => (-tf, tok) }.take(10)
      id -> top.toMap
    }.toMap
    val norms = sig.view.mapValues(_.values.map(v => v * v).sum).toMap
    val ids = sig.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      shared = sig(i).keySet & sig(j).keySet
      if shared.nonEmpty
      dot = shared.toSeq.map(t => sig(i)(t) * sig(j)(t)).sum
      cos = dot.toDouble / math.sqrt(norms(i).toDouble * norms(j))
      if math.rint(cos * 1e6) / 1e6 >= 0.6
    } yield (i, j, dot, cos)).sortBy(p => (p._1, p._2))
    val got = graft.SparkEntry.queries("q_llm_tfidf_pairs")(spark, sfDir)
      .collect()
    assert(got.length == want.length,
      s"pair count: got ${got.length} want ${want.length}")
    assert(got.nonEmpty) // fixture plants near-duplicate docs
    got.zip(want).foreach { case (r, (a, b, dot, cos)) =>
      assert(r.getLong(0) == a && r.getLong(1) == b)
      assert(r.getLong(2) == dot)
      assert(math.abs(r.getDouble(3) - cos) < 1e-6)
    }
  }
}
