package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r18 multimodal FEATURE ops against INDEPENDENT in-JVM
  * brute forces over the sf0.001 doc ids:
  *  - q_llm_mm_phash: the 9×8 gray grid re-derived from the SYNTHESIS
  *    closed form (never from bytes — the mm_audio independence
  *    pattern, so an encoder/decoder bug cannot cancel out), dHash
  *    bands, then ALL-PAIRS hamming — which simultaneously witnesses
  *    the pigeonhole recall-1 claim: if the query's 4-band candidate
  *    join missed any hamming ≤ 3 pair, the brute force has it and
  *    the compare fails.
  *  - q_llm_mm_spectral: a literal windowed sample walk.
  */
class MmPhashSpectralSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def docIds() = Tables.documents(spark, sfDir)
    .select("doc_id").collect().map(_.getLong(0)).sorted

  private def bands(id: Long): Array[Int] = {
    val g = id / 4; val m = (id % 4).toInt
    def cell(cx: Int, cy: Int): Int = {
      val y = (g * 31 + cx * 17 + cy * 57) % 8191
      (((y * y) % 8191) % 200).toInt +
        (if (cx == 2 * m + 1 && cy < m) 40 else 0)
    }
    (0 until 4).map { t =>
      var hv = 0
      for (r <- 0 until 2; cx <- 0 until 8)
        if (cell(cx + 1, 2 * t + r) > cell(cx, 2 * t + r))
          hv |= 1 << (r * 8 + cx)
      hv
    }.toArray
  }

  test("phash near-dup pairs match an all-pairs hamming walk (recall 1)") {
    val ids = docIds()
    val h = ids.map(id => id -> bands(id)).toMap
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      ham = (0 until 4).map(t =>
        Integer.bitCount(h(ids(i))(t) ^ h(ids(j))(t))).sum
      if ham <= 3
    } yield (ids(i), ids(j), ham.toLong)).toSeq.sorted
    val got = SparkEntry.queries("q_llm_mm_phash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === expected)
    // planted families are real: some same-group pair is a near-dup,
    // and some pair of documents is NOT (the threshold excludes)
    assert(got.exists { case (a, b, _) => a / 4 == b / 4 })
    assert(got.size < ids.length.toLong * (ids.length - 1) / 2)
    // graded distances: both exact dups (0) and near misses (>0) occur
    assert(got.exists(_._3 == 0L) && got.exists(_._3 > 0L))
  }

  test("phash families match a literal union-find over the pair graph") {
    val ids = docIds()
    val h = ids.map(id => id -> bands(id)).toMap
    val pairs = for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      if (0 until 4).map(t =>
        Integer.bitCount(h(ids(i))(t) ^ h(ids(j))(t))).sum <= 3
    } yield (ids(i), ids(j))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = ids.map(i => i -> find(i)).toMap
    val size = comp.values.groupBy(identity).map { case (c, xs) =>
      c -> xs.size.toLong
    }
    val expected = ids.toSeq.map { i =>
      (i, comp(i), if (comp(i) == i) 1 else 0, size(comp(i)))
    }
    val got = SparkEntry.queries("q_llm_mm_phash_cluster")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    // transitivity is real on this corpus: some family exceeds a pair
    assert(got.exists(_._4 > 2L))
    // and kept = exactly one per family plus singletons
    assert(got.count(_._3 == 1) == comp.values.toSet.size)
  }

  test("streaming phash ingest matches the literal probe, invariant to sharding") {
    import org.apache.spark.sql.functions.col
    val ids = docIds()
    val h = ids.map(id => id -> bands(id)).toMap
    val (delta, base) = ids.partition(_ % 20 <= 4)
    val expected = delta.toSeq.map { d =>
      val matches = base.flatMap { b =>
        val ham = (0 until 4).map(t =>
          Integer.bitCount(h(d)(t) ^ h(b)(t))).sum
        if (ham <= 3) Some((ham.toLong, b)) else None
      }
      if (matches.isEmpty) (d, "kept", -1L, -1L)
      else {
        val (ham, bid) = matches.min
        (d, "dropped", bid, ham)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_stream_dedup_phash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    // both verdicts live on this corpus
    assert(got.exists(_._2 == "dropped") && got.exists(_._2 == "kept"))
    // a DIFFERENT sharding of the same delta must not change verdicts
    val tmp = java.nio.file.Files.createTempDirectory("dedupph_spec")
    try {
      val root = s"$tmp/in"
      Tables.documents(spark, sfDir).where(col("doc_id") % 20 <= 4)
        .select(col("doc_id")).repartition(3).write.parquet(root)
      val baseIdx = llm.Similarity.phashBands(spark,
        Tables.documents(spark, sfDir).where(col("doc_id") % 20 > 4)
          .select(col("doc_id"))).localCheckpoint(true)
      val stream3 = llm.Similarity.streamPhashDrain(spark, root, baseIdx)
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(stream3 === expected, "3-shard drain != literal probe")
    } finally stream.Streams.deleteRec(tmp.toFile)
  }

  test("spectral windows match a literal sample walk") {
    val expected = docIds().toSeq.flatMap { id =>
      val n = 160 + (id % 41).toInt
      val s = Array.tabulate(n)(i =>
        (((id * 31 + i * 4933) % 65536) - 32768))
      (0 until n).groupBy(_ / 40).toSeq.sortBy(_._1).map { case (w, is) =>
        val energy = is.foldLeft(BigInt(0))((a, i) =>
          a + BigInt(s(i)) * s(i))
        val zc = is.count(i => i % 40 != 0 && s(i).toLong * s(i - 1) < 0)
        (id, w.toLong, is.length.toLong, energy.toLong, zc.toLong,
          r6(energy, BigInt(is.length)))
      }
    }
    val got = SparkEntry.queries("q_llm_mm_spectral")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // real signal: zero crossings occur, and window counts vary with
    // the per-doc sample count (full 40s plus one partial tail)
    assert(got.exists(_._5 > 0))
    assert(got.map(_._3).toSet.size > 1)
  }
}
