package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the multimodal decode seam (llm.MediaDecoder): the default
  * identity codec must leave the oracle-checked witnesses byte-exact
  * (and their plans expression-only — no mapPartitions decode stage),
  * while a registered toy codec must actually flow through every mm_*
  * query — proving a deployment can swap a real JPEG/PCM decoder in by
  * conf alone. */
class MediaDecoderSpec extends SparkSuite {

  test("identity default elides the decode stage from the plan") {
    Seq("q_llm_mm_features", "q_llm_mm_resize", "q_llm_mm_sample")
      .foreach { q =>
        // mm_features/mm_resize digest via typed mapPartitions by
        // design; mm_sample must stay pure expressions. What identity
        // must NOT add is a SECOND map stage: count the
        // SerializeFromObject funnels (one per typed stage).
        val plan = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val stages = "SerializeFromObject".r.findAllIn(plan).size
        val expected = if (q == "q_llm_mm_sample") 0 else 1
        assert(stages == expected,
          s"$q: $stages typed stages (expected $expected) — identity " +
            "decode failed to elide")
      }
  }

  test("a conf-registered codec flows through all three mm_* queries") {
    val prev = spark.conf.getOption("graft.mm.decoder")
    spark.conf.set("graft.mm.decoder",
      classOf[ReverseDecoder].getName)
    try {
      // features: payload digest must be of the REVERSED bytes, and
      // first_byte becomes the LAST byte of the text
      val f = SparkEntry.queries("q_llm_mm_features")(spark, sfDir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getString(2), r.getInt(3))).toMap
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val md = java.security.MessageDigest.getInstance("SHA-256")
      docs.foreach { case (id, text) =>
        val rev = text.getBytes("UTF-8").reverse
        md.reset()
        val sha = md.digest(rev).map("%02x".format(_)).mkString
        assert(f(id) === ((rev.length.toLong, sha,
          rev.headOption.fold(-1)(_ & 0xFF))),
          s"doc $id did not decode through ReverseDecoder")
      }
      // resize + sample: must differ from the identity run (the seam
      // reaches them) while keeping row structure
      Seq("q_llm_mm_resize", "q_llm_mm_sample").foreach { q =>
        val withCodec = SparkEntry.queries(q)(spark, sfDir).collect()
        spark.conf.unset("graft.mm.decoder")
        val identity = SparkEntry.queries(q)(spark, sfDir).collect()
        spark.conf.set("graft.mm.decoder",
          classOf[ReverseDecoder].getName)
        assert(withCodec.length === identity.length, s"$q row count moved")
        assert(withCodec.toSeq !== identity.toSeq,
          s"$q ignored the registered codec")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("graft.mm.decoder", v)
      case None    => spark.conf.unset("graft.mm.decoder")
    }
  }

  // ---- PpmDecoder: the first REAL (non-stub) codec on the seam ----

  /** 2×2 test image (R, G, B, gray) as raw 8-bit RGB. */
  private val pix8: Array[Byte] = Array(
    255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128).map(_.toByte)

  private def p6(maxval: Int, samples: Array[Int]): Array[Byte] = {
    val header = s"P6\n# staged fixture\n2 2\n$maxval\n".getBytes("US-ASCII")
    val raster =
      if (maxval < 256) samples.map(_.toByte)
      else samples.flatMap(v => Array((v >> 8).toByte, v.toByte))
    header ++ raster
  }

  test("PpmDecoder: P6 and P3 encodings of one image decode bit-identically") {
    val d = new llm.PpmDecoder
    val fromP6 = d.decode(p6(255, pix8.map(_ & 0xff)))
    val p3 = ("P3 # ascii twin\n2 2 255\n" +
      pix8.map(_ & 0xff).mkString(" ")).getBytes("US-ASCII")
    val fromP3 = d.decode(p3)
    assert(fromP6.toSeq == pix8.toSeq, "P6 raster must pass through exactly")
    assert(fromP3.toSeq == pix8.toSeq, "P3 must parse to the same buffer")
  }

  test("PpmDecoder: 16-bit samples rescale by exact integer HALF_UP") {
    val d = new llm.PpmDecoder
    // maxval 65535, big-endian 2-byte samples; expected = HALF_UP of
    // v·255/65535, computed independently via BigDecimal
    val samples = Array(0, 1, 32768, 65535, 257, 65278, 12345,
      54321, 100, 60000, 7, 40000)
    val got = d.decode(p6(65535, samples))
    val want = samples.map { v =>
      (BigDecimal(v) * 255 / 65535)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt.toByte
    }
    assert(got.toSeq == want.toSeq)
  }

  test("PpmDecoder: flows through the mapPartitions seam over a staged frame") {
    val s = spark
    import s.implicits._
    val prev = spark.conf.getOption("graft.mm.decoder")
    spark.conf.set("graft.mm.decoder", classOf[llm.PpmDecoder].getName)
    try {
      val staged = Seq((1L, p6(255, pix8.map(_ & 0xff))),
        (2L, p6(65535, pix8.map(v => (v & 0xff) * 257))))
        .toDF("doc_id", "payload")
      val out = llm.MediaDecoder.decoded(spark, staged)
        .as[(Long, Array[Byte])].collect().toMap
      // maxval-65535 with v·257 samples scales back to the same 8-bit
      // image: HALF_UP(v·257·255/65535) = v exactly
      assert(out(1L).toSeq == pix8.toSeq && out(2L).toSeq == pix8.toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("graft.mm.decoder", v)
      case None    => spark.conf.unset("graft.mm.decoder")
    }
  }

  test("PpmDecoder: malformed payloads are rejected, not passed through") {
    val d = new llm.PpmDecoder
    Seq(
      "not an image".getBytes("US-ASCII"),
      "P5 2 2 255 ".getBytes("US-ASCII"), // PGM: wrong form
      "P6 2 2 999999\n".getBytes("US-ASCII"), // maxval out of range
      p6(255, pix8.map(_ & 0xff)).dropRight(1) // truncated raster
    ).foreach { bad =>
      intercept[IllegalArgumentException](d.decode(bad))
    }
  }
}

/** Toy codec for the spec: reverses the payload — cheap, bijective,
  * and guaranteed to change every digest downstream. */
class ReverseDecoder extends llm.MediaDecoder {
  def decode(payload: Array[Byte]): Array[Byte] = payload.reverse
}
