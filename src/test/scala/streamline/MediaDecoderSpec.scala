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
}

/** Toy codec for the spec: reverses the payload — cheap, bijective,
  * and guaranteed to change every digest downstream. */
class ReverseDecoder extends llm.MediaDecoder {
  def decode(payload: Array[Byte]): Array[Byte] = payload.reverse
}
