package streamline

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import streamline.batch.{ProtoDescriptor => PD, ProtoWire => PW}

/** Property tests for the descriptor-driven generic decoder: RANDOM
  * descriptors (random field numbers incl. multi-byte tags, scalar /
  * string / embedded-message / repeated fields) and random rows are
  * encoded by a test-local encoder that is ALSO driven purely by the
  * descriptor — choosing packed vs unpacked per repeated scalar at
  * random, dropping optional scalars at random, and injecting unknown
  * fields at random positions — and must round-trip bit-exactly
  * through [[PD.decodeFrames]]. Fixed seeds keep CI deterministic
  * (same convention as CepPropertySpec). */
class ProtoDescriptorPropertySpec extends SparkSuite {

  // ---- random descriptor + row generation ----

  private val scalarTypes = Seq(PD.TInt64, PD.TSint64, PD.TDouble, PD.TString)

  private def valueGen(tpe: Int): Gen[Any] = tpe match {
    case PD.TInt64 | PD.TSint64 => Gen.oneOf(
      Gen.choose(-5L, 5L), Gen.choose(Long.MinValue, Long.MaxValue))
    case PD.TDouble => Gen.oneOf(
      Gen.const(0.0), Gen.const(-1.5), Gen.const(1.0e18),
      Gen.choose(-1.0e9, 1.0e9))
    case PD.TString => Gen.listOf(
      Gen.oneOf('a', 'Z', '0', ' ', 'β', '字')).map(_.mkString)
  }

  /** A leaf (scalar-only) message plus a top-level message whose
    * fields may reference it — distinct random field numbers, some
    * multi-byte tags, ~1/4 repeated. */
  private def descGen: Gen[(PD.MessageDesc, PD.FileDesc)] = for {
    leafN <- Gen.choose(1, 3)
    leafTs <- Gen.listOfN(leafN, Gen.oneOf(scalarTypes))
    nFields <- Gen.choose(1, 6)
    kinds <- Gen.listOfN(nFields, Gen.frequency(
      6 -> Gen.oneOf(scalarTypes), 2 -> Gen.const(PD.TMessage)))
    labels <- Gen.listOfN(nFields, Gen.frequency(
      3 -> Gen.const(1), 1 -> Gen.const(3)))
    nums <- Gen.pick(nFields, (1 to 40) ++ Seq(300, 5000, 70000))
  } yield {
    val leaf = PD.MessageDesc("Leaf",
      leafTs.zipWithIndex.map { case (t, i) =>
        PD.FieldDesc(s"lf$i", i + 1, 1, t, "")
      }, Nil)
    val top = PD.MessageDesc("Top",
      kinds.zip(labels).zip(nums.toSeq).zipWithIndex.map {
        case (((t, lab), num), i) =>
          PD.FieldDesc(s"f$i", num, lab, t,
            if (t == PD.TMessage) ".graft.Leaf" else "")
      }, Nil)
    (top, PD.FileDesc("rand.proto", "graft", Seq(top, leaf)))
  }

  private def rowGen(m: PD.MessageDesc,
      reg: Map[String, PD.MessageDesc]): Gen[Row] =
    m.fields.toList.map { f =>
      def one: Gen[Any] =
        if (f.tpe == PD.TMessage) rowGen(reg(f.typeName.split('.').last), reg)
        else valueGen(f.tpe)
      if (f.repeated)
        Gen.choose(0, 4).flatMap(Gen.listOfN(_, one)): Gen[Any]
      else Gen.frequency(9 -> one,
        1 -> Gen.const(null: Any)) // absent optional scalar → null cell
    }.foldRight(Gen.const(List.empty[Any])) { (g, acc) =>
      for { v <- g; rest <- acc } yield v :: rest
    }.map(Row.fromSeq)

  // ---- descriptor-driven test encoder (independent of the decoder) ----

  private def writeFixed64LE(out: java.io.ByteArrayOutputStream,
                             bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def writeScalar(out: java.io.ByteArrayOutputStream,
      f: PD.FieldDesc, v: Any, reg: Map[String, PD.MessageDesc],
      rnd: scala.util.Random): Unit = f.tpe match {
    case PD.TInt64 =>
      PW.writeVarint(out, (f.number.toLong << 3) | 0)
      PW.writeVarint(out, v.asInstanceOf[Long])
    case PD.TSint64 =>
      PW.writeVarint(out, (f.number.toLong << 3) | 0)
      PW.writeVarint(out, PW.zigzag(v.asInstanceOf[Long]))
    case PD.TDouble =>
      PW.writeVarint(out, (f.number.toLong << 3) | 1)
      writeFixed64LE(out,
        java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]))
    case PD.TString =>
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      PW.writeVarint(out, (f.number.toLong << 3) | 2)
      PW.writeVarint(out, b.length.toLong)
      out.write(b, 0, b.length)
    case PD.TMessage =>
      val body = new java.io.ByteArrayOutputStream()
      encodeRow(body, reg(f.typeName.split('.').last), v.asInstanceOf[Row],
        reg, rnd)
      PW.writeVarint(out, (f.number.toLong << 3) | 2)
      PW.writeVarint(out, body.size().toLong)
      body.writeTo(out)
  }

  private def encodeRow(out: java.io.ByteArrayOutputStream,
      m: PD.MessageDesc, row: Row, reg: Map[String, PD.MessageDesc],
      rnd: scala.util.Random): Unit = {
    def unknownField(): Unit = {
      // a field number the descriptor does not know, in a wire type
      // chosen at random — the decoder must skip it
      val num = 100000 + rnd.nextInt(100)
      if (rnd.nextBoolean()) {
        PW.writeVarint(out, (num.toLong << 3) | 0)
        PW.writeVarint(out, rnd.nextLong())
      } else {
        val junk = Array.fill(rnd.nextInt(6))(rnd.nextInt().toByte)
        PW.writeVarint(out, (num.toLong << 3) | 2)
        PW.writeVarint(out, junk.length.toLong)
        out.write(junk, 0, junk.length)
      }
    }
    m.fields.zipWithIndex.foreach { case (f, i) =>
      if (rnd.nextInt(4) == 0) unknownField()
      val cell = row.get(i)
      if (f.repeated) {
        val vs = cell.asInstanceOf[List[Any]]
        val packable = f.tpe == PD.TInt64 || f.tpe == PD.TSint64 ||
          f.tpe == PD.TDouble
        if (packable && vs.nonEmpty && rnd.nextBoolean()) {
          // packed spelling: one length-delimited run
          val p = new java.io.ByteArrayOutputStream()
          vs.foreach {
            case l: java.lang.Long if f.tpe == PD.TInt64 =>
              PW.writeVarint(p, l)
            case l: java.lang.Long =>
              PW.writeVarint(p, PW.zigzag(l))
            case d: java.lang.Double =>
              writeFixed64LE(p, java.lang.Double.doubleToRawLongBits(d))
          }
          PW.writeVarint(out, (f.number.toLong << 3) | 2)
          PW.writeVarint(out, p.size().toLong)
          p.writeTo(out)
        } else vs.foreach(writeScalar(out, f, _, reg, rnd))
      } else if (cell != null) writeScalar(out, f, cell, reg, rnd)
    }
    if (rnd.nextInt(3) == 0) unknownField()
  }

  // ---- the property ----

  test("random descriptors and rows round-trip through the generic decoder") {
    for (seed <- 1L to 40L) {
      val (top, file) = descGen(Gen.Parameters.default, Seed(seed)).get
      val reg = PD.registry(Seq(file))
      // the descriptor itself must survive its own wire round-trip
      assert(PD.parseDescriptorSet(PD.encodeDescriptorSet(file)) == Seq(file))
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 5).map(i =>
        rowGen(top, reg)(Gen.Parameters.default, Seed(seed * 100 + i)).get)
      val out = new java.io.ByteArrayOutputStream()
      rows.foreach { r =>
        val body = new java.io.ByteArrayOutputStream()
        encodeRow(body, top, r, reg, rnd)
        PW.writeVarint(out, body.size().toLong)
        body.writeTo(out)
      }
      val decoded = PD.decodeFrames(out.toByteArray, top, reg).toSeq
      assert(decoded == rows, s"seed $seed diverged")
    }
  }
}
