package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_knn_acc / q_llm_rnn_pairs against an INDEPENDENT in-JVM
  * all-pairs 1-NN walk over the collected sf0.001 embeddings: the
  * cosine is re-derived with the same left-to-right double
  * accumulation as the codegen'd CosineSim and the same HALF_UP
  * 6-dp rounding as Spark's round(), so a slipped argmax tiebreak, a
  * self-pair leak, or a one-way (non-mutual) RNN pair cannot cancel
  * against the DuckDB oracle (which shares the window-SQL shape with
  * the queries). */
class EmbedNnSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = a(i).toDouble; val yi = b(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def nn() = {
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    embs.map { case (ida, ea, la) =>
      val best = embs.filter(_._1 != ida)
        .map { case (idb, eb, lb) => (idb, lb, round6(cos(ea, eb))) }
        .reduceLeft { (x, y) =>
          if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
        }
      (ida, la, best._1, best._2, best._3)
    }
  }

  test("1-NN label accuracy matches a literal all-pairs walk") {
    val table = nn()
    val expected = table.groupBy(_._2).toSeq.map { case (l, xs) =>
      val correct = xs.count(x => x._4 == x._2).toLong
      (l.toLong, xs.length.toLong, correct,
        r6(BigInt(correct), BigInt(xs.length)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_knn_acc")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // 10 labels, every vector assigned exactly once
    assert(got.size == 10 && got.map(_._2).sum == table.length)
  }

  test("reciprocal-NN pairs match the literal mutual filter") {
    val table = nn()
    val m = table.map(x => x._1 -> (x._3, x._5)).toMap
    val expected = table.collect {
      case (ida, _, idb, _, s)
        if ida < idb && m(idb)._1 == ida =>
          (ida, idb, s, m(idb)._2)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_rnn_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // mutuality genuinely filters: strictly fewer pairs than vectors
    assert(got.nonEmpty && got.size < table.length / 2)
  }
}
