package streamline

import graft.SparkSuite
import streamline.batch.ProtoWire
import streamline.batch.ProtoWire.GraftEvent

/** Pins the hand-rolled protobuf wire codec (q_source_proto): varint /
  * zigzag edge cases against the published encoding spec, framing
  * round-trips, unknown-field forward compatibility, and truncation
  * detection. The declared query's row-level content is covered by the
  * DuckDB oracle; these pins cover the byte layer the oracle can't
  * see. */
class ProtoWireSpec extends SparkSuite {

  private def enc(es: GraftEvent*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    es.foreach(ProtoWire.encodeDelimited(out, _))
    out.toByteArray
  }

  test("zigzag matches the published mapping") {
    // spec table: 0→0, -1→1, 1→2, -2→3, Long extremes survive
    assert(ProtoWire.zigzag(0L) == 0L)
    assert(ProtoWire.zigzag(-1L) == 1L)
    assert(ProtoWire.zigzag(1L) == 2L)
    assert(ProtoWire.zigzag(-2L) == 3L)
    for (v <- Seq(0L, 1L, -1L, 42L, -42L, Long.MaxValue, Long.MinValue))
      assert(ProtoWire.unzigzag(ProtoWire.zigzag(v)) == v, v)
  }

  test("varint layout: 1 byte through 127, msb continuation, -1 is 10 bytes") {
    def bytes(v: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, v)
      out.toByteArray
    }
    assert(bytes(0L).toSeq == Seq(0x00.toByte))
    assert(bytes(127L).toSeq == Seq(0x7F.toByte))
    assert(bytes(128L).toSeq == Seq(0x80.toByte, 0x01.toByte)) // spec example
    assert(bytes(300L).toSeq == Seq(0xAC.toByte, 0x02.toByte)) // spec example
    assert(bytes(-1L).length == 10) // two's complement, full width
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 1L << 35, -1L, Long.MinValue)) {
      val r = new ProtoWire.Reader(bytes(v))
      assert(r.readVarint() == v, v)
    }
  }

  test("delimited messages round-trip including double bits and UTF-8") {
    val es = Seq(
      GraftEvent(0L, 0L, "", 0.0, 0L),
      GraftEvent(Long.MaxValue, -7L, "café ≠ cafe", -185.22, 1704067200L),
      GraftEvent(1L, Long.MinValue, "a" * 300, Double.MinPositiveValue, 1L),
      GraftEvent(2L, 13L, "error", java.lang.Double.longBitsToDouble(
        0x7FF8000000000001L), 2L)) // non-canonical NaN bits survive fixed64
    val got = ProtoWire.decodeAll(enc(es: _*)).toSeq
    assert(got.size == es.size)
    es.zip(got).foreach { case (a, b) =>
      assert(a.eventId == b.eventId && a.userId == b.userId &&
        a.eventType == b.eventType && a.tsS == b.tsS)
      assert(java.lang.Double.doubleToRawLongBits(a.value) ==
        java.lang.Double.doubleToRawLongBits(b.value))
    }
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    // the encoder plants #6 (length-delimited) and #7 (fixed32); the
    // decoder knows neither, yet decodes the known fields around them —
    // this IS protobuf's schema-evolution contract.
    val got = ProtoWire.decodeAll(enc(GraftEvent(9L, -3L, "x", 1.5, 7L))).toSeq
    assert(got == Seq(GraftEvent(9L, -3L, "x", 1.5, 7L)))
  }

  test("truncated payloads and wrong wire types fail loudly") {
    val full = enc(GraftEvent(9L, -3L, "abcdef", 1.5, 7L))
    intercept[java.io.IOException] {
      ProtoWire.decodeAll(full.dropRight(3)).toSeq
    }
    // corrupt the first tag to claim field 1 is length-delimited
    val bad = full.clone()
    bad(1) = ((1 << 3) | 2).toByte
    intercept[java.io.IOException] {
      ProtoWire.decodeAll(bad).toSeq
    }
  }

  test("nested message + packed repeated field round-trip") {
    import streamline.batch.ProtoWire.GraftEventN
    val es = Seq(
      GraftEventN(1L, "purchase", 87L, Seq(13L, 1L, 42L)),
      GraftEventN(2L, "", -5L, Seq.empty), // empty packed field
      GraftEventN(3L, "é", 0L, (1L to 200L)), // multi-byte varint length
      GraftEventN(Long.MaxValue, "x", Long.MaxValue, Seq(Long.MaxValue)))
    val out = new java.io.ByteArrayOutputStream()
    es.foreach(ProtoWire.encodeNestedDelimited(out, _))
    assert(ProtoWire.decodeNestedAll(out.toByteArray).toSeq == es)
  }

  test("the declared query round-trips events row-for-row") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val df = graft.SparkEntry.queries("q_source_proto")(spark, sfDir)
    val viaProto = df.select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    val direct = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    assert(viaProto.toSeq == direct.toSeq)
  }
}
