package streamline

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import streamline.batch.{ProtoDescriptor => PD, ProtoWire => PW}

/** Pins the descriptor-driven protobuf path (r13 — the last
  * consciously-excluded slice of the §2.1 protobuf row): descriptor
  * set round-trip through the wire codec, the SQL-type mapping, and
  * the generic decoder's agreement with the hand-rolled one on the
  * identical bytes — plus the two spec obligations the hand decoder
  * can't witness generically: unknown-field skip driven by a
  * descriptor, and unpacked repeated scalars. */
class ProtoDescriptorSpec extends SparkSuite {

  private val reg = PD.registry(Seq(PD.nestedFile))
  private val msg = reg("GraftEventN")

  test("descriptor set round-trips through the wire codec") {
    val bytes = PD.encodeDescriptorSet(PD.nestedFile)
    val parsed = PD.parseDescriptorSet(bytes)
    assert(parsed == Seq(PD.nestedFile))
  }

  test("SQL-type mapping: int64 -> LONG, message -> STRUCT, repeated -> ARRAY") {
    val schema = PD.sparkSchema(msg, reg)
    assert(schema == StructType(Seq(
      StructField("event_id", LongType),
      StructField("props", StructType(Seq(
        StructField("k", StringType),
        StructField("v", LongType)))),
      StructField("vals", ArrayType(LongType)))))
  }

  test("generic decoder agrees with the hand-rolled one on identical bytes") {
    val events = Seq(
      PW.GraftEventN(1L, "click", 7L, Seq(10L, 1L, 42L)),
      PW.GraftEventN(2L, "view", -3L, Seq(20L, 2L, 42L)))
    val out = new java.io.ByteArrayOutputStream()
    events.foreach(PW.encodeNestedDelimited(out, _))
    val payload = out.toByteArray
    val hand = PW.decodeNestedAll(payload).toSeq
    val generic = PD.decodeFrames(payload, msg, reg).toSeq
    assert(generic == hand.map(e => Row(e.eventId,
      Row(e.propK, e.propV), e.vals.toList)))
  }

  test("unknown fields are skipped by wire type under descriptor drive") {
    // the FLAT GraftEvent payload plants unknown fields 6 (len-delim)
    // and 7 (fixed32); describe only fields 1-5 and decode generically
    val flatFile = PD.FileDesc("flat.proto", "graft", Seq(
      PD.MessageDesc("GraftEvent", Seq(
        PD.FieldDesc("event_id", 1, 1, PD.TInt64, ""),
        PD.FieldDesc("user_id", 2, 1, PD.TSint64, ""),
        PD.FieldDesc("event_type", 3, 1, PD.TString, ""),
        PD.FieldDesc("value", 4, 1, PD.TDouble, ""),
        PD.FieldDesc("ts_s", 5, 1, PD.TInt64, "")), Nil)))
    val flatReg = PD.registry(Seq(flatFile))
    val flatMsg = flatReg("GraftEvent")
    val out = new java.io.ByteArrayOutputStream()
    val ev = PW.GraftEvent(9L, -5L, "purchase", 1.5, 1234567L)
    PW.encodeDelimited(out, ev)
    val rows = PD.decodeFrames(out.toByteArray, flatMsg, flatReg).toSeq
    assert(rows == Seq(Row(9L, -5L, "purchase", 1.5, 1234567L)))
  }

  test("repeated scalars decode from BOTH packed and unpacked spellings") {
    // hand-encode one message with vals = [4, 5] spelled UNPACKED
    // (tag repeated per element, wire type 0) — the staged topic uses
    // the packed spelling, so this pins the other half of the contract
    val body = new java.io.ByteArrayOutputStream()
    PW.writeVarint(body, (1L << 3) | 0); PW.writeVarint(body, 11L)
    val props = new java.io.ByteArrayOutputStream()
    PW.writeVarint(props, (1L << 3) | 2); PW.writeVarint(props, 1L)
    props.write('x')
    PW.writeVarint(props, (2L << 3) | 0); PW.writeVarint(props, 6L)
    PW.writeVarint(body, (2L << 3) | 2)
    PW.writeVarint(body, props.size().toLong); props.writeTo(body)
    PW.writeVarint(body, (3L << 3) | 0); PW.writeVarint(body, 4L)
    PW.writeVarint(body, (3L << 3) | 0); PW.writeVarint(body, 5L)
    val framed = new java.io.ByteArrayOutputStream()
    PW.writeVarint(framed, body.size().toLong); body.writeTo(framed)
    val rows = PD.decodeFrames(framed.toByteArray, msg, reg).toSeq
    assert(rows == Seq(Row(11L, Row("x", 6L), List(4L, 5L))))
  }

  test("the declared query equals the hand-rolled nested path row for row") {
    val viaDescriptor = graft.SparkEntry
      .queries("q_source_proto_descriptor")(spark, sfDir).collect().toSeq
    val viaHand = graft.SparkEntry
      .queries("q_source_proto_nested")(spark, sfDir).collect().toSeq
    assert(viaDescriptor.nonEmpty)
    assert(viaDescriptor == viaHand)
  }

  test("micro-batch descriptor decode equals the one-shot batch scan") {
    // file-batching invariance: one staged file per trigger, appended
    // union must reproduce the batch witness exactly
    val streamed = graft.SparkEntry
      .queries("q_stream_proto_descriptor")(spark, sfDir).collect().toSeq
    val batch = graft.SparkEntry
      .queries("q_source_proto_descriptor")(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
