package streamline.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pluggable DECODE seam for the multimodal pipelines
  * (q_llm_mm_features / q_llm_mm_resize / q_llm_mm_sample): everything
  * downstream — feature digests, stride resize, frame sampling — is
  * generic byte plumbing, but turning an opaque media payload (JPEG,
  * WAV, MP4, …) into the byte representation those stages consume
  * needs a real codec, and real codecs are deployment property, not
  * library property (none ship in this container — SURVEY §2.11).
  *
  * A deployment registers one by FQCN:
  * {{{
  *   class JpegDecoder extends MediaDecoder {
  *     def decode(payload: Array[Byte]): Array[Byte] = ... // pixel buffer
  *   }
  *   spark.conf.set("graft.mm.decoder", "com.example.JpegDecoder")
  * }}}
  * and every mm_* query decodes through it, as a typed mapPartitions
  * stage over the binary column (one instance per partition — the
  * natural place for codec-context reuse; at 100 TB this stage is
  * map-only, shuffle-free, between storage and feature extraction).
  *
  * The DEFAULT is the identity codec, and identity ELIDES the decode
  * stage entirely: the witnesses keep their whole-stage-codegen
  * expression plans and their engine-independent DuckDB oracles
  * (sha256/length over the raw payload). MediaDecoderSpec swaps in a
  * toy codec to pin that the seam is live — same plumbing, different
  * bytes out.
  */
trait MediaDecoder extends Serializable {
  /** Opaque payload → decoded byte representation (pixel buffer, PCM
    * samples, concatenated frames — codec-defined). Must be
    * deterministic: the dedup/fingerprint stages downstream assume
    * decode(p) is a pure function. */
  def decode(payload: Array[Byte]): Array[Byte]
}

/** A REAL public-format image decoder for the seam: Netpbm PPM
  * ("portable pixmap" — the format is fully specified publicly and
  * decodable with zero native deps, which is why it's the first
  * non-stub codec here). Handles both the binary `P6` and ASCII `P3`
  * forms, `#` comments in the header, and the full 1..65535 maxval
  * range (16-bit samples are big-endian per the spec). Output is the
  * CANONICAL 8-bit interleaved RGB buffer — 3·w·h bytes, row-major,
  * top-to-bottom — so P3 and P6 encodings of one image decode
  * bit-identically, and non-255 maxvals rescale each sample by the
  * exact integer HALF_UP of v·255/maxval (real per-pixel math, not a
  * pass-through). Malformed payloads throw — a corrupt image must
  * surface, not silently fingerprint as its own garbage bytes.
  * Register with `spark.conf.set("graft.mm.decoder",
  * "streamline.llm.PpmDecoder")`; the identity stub stays the session
  * default. Pinned bit-exact (P3≡P6, 16-bit scaling, staged-frame
  * plumbing, malformed rejection) in MediaDecoderSpec. */
class PpmDecoder extends MediaDecoder {
  def decode(payload: Array[Byte]): Array[Byte] = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM: $msg at byte $pos")
    def isWs(b: Byte): Boolean = b == ' ' || b == '\t' || b == '\r' ||
      b == '\n' || b == 0x0b || b == 0x0c
    if (payload.length < 2 || payload(0) != 'P') fail("not a PPM payload")
    val form = payload(1).toChar
    if (form != '6' && form != '3') fail(s"unsupported form P$form")
    pos = 2
    def skipWs(): Unit = {
      var more = true
      while (more && pos < payload.length) {
        if (payload(pos) == '#')
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        else if (isWs(payload(pos))) pos += 1
        else more = false
      }
    }
    def int(): Int = {
      skipWs()
      if (pos >= payload.length || payload(pos) < '0' || payload(pos) > '9')
        fail("expected integer")
      var v = 0
      while (pos < payload.length &&
        payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        if (v > 0xffffff) fail("integer out of range")
        pos += 1
      }
      v
    }
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535)
      fail(s"bad header ${w}x$h maxval $maxval")
    if (w.toLong * h > 0x7fffffffL / 3) fail("image too large")
    val n = 3 * w * h
    val out = new Array[Byte](n)
    // exact integer HALF_UP of v·255/maxval (no float: 2·65535·255
    // fits an Int, and both engines of this repo never see it anyway —
    // the decode runs in one JVM; the discipline is determinism)
    def scaled(v: Int): Byte = {
      if (v > maxval) fail(s"sample $v > maxval $maxval")
      ((2 * v * 255 + maxval) / (2 * maxval)).toByte
    }
    if (form == '3') {
      var i = 0
      while (i < n) { out(i) = scaled(int()); i += 1 }
    } else {
      // P6: exactly ONE whitespace byte separates maxval from raster
      if (pos >= payload.length || !isWs(payload(pos)))
        fail("missing raster separator")
      pos += 1
      val bytesPer = if (maxval < 256) 1 else 2
      if (payload.length - pos < n.toLong * bytesPer) fail("truncated raster")
      var i = 0
      while (i < n) {
        val v =
          if (bytesPer == 1) payload(pos) & 0xff
          else ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff)
        pos += bytesPer
        out(i) = if (maxval == 255) v.toByte else scaled(v)
        i += 1
      }
    }
    out
  }
}

/** A REAL public-format audio decoder for the seam: RIFF/WAVE PCM
  * (the container is fully specified publicly — Microsoft/IBM 1991 —
  * and decodable with zero native deps, the audio twin of
  * [[PpmDecoder]]). Walks the chunk list properly (unknown chunks are
  * SKIPPED by their declared size, as the spec requires — a `LIST` or
  * `fact` chunk between `fmt ` and `data` must not break the parse),
  * validates the fmt contract (PCM format tag 1, 16-bit samples,
  * 1..2 channels, declared block align / byte rate consistent), and
  * returns the CANONICAL little-endian int16 sample stream (the data
  * chunk, length-checked against its declared size). Malformed
  * payloads throw — a corrupt recording must surface, not silently
  * fingerprint as garbage (the PpmDecoder contract).
  * [[WavDecoder.parse]] additionally exposes the header fields
  * (sample rate, channels, sample count) for audio-aware operators
  * (q_llm_mm_audio). Pinned in WavDecoderSpec (round-trip vs a
  * literal byte walk, chunk skipping, malformed rejection). */
class WavDecoder extends MediaDecoder {
  def decode(payload: Array[Byte]): Array[Byte] =
    WavDecoder.parse(payload).data
}

object WavDecoder {
  final case class Wav(sampleRate: Int, channels: Int,
                       data: Array[Byte]) {
    def nFrames: Int = data.length / (2 * channels)
    /** Sample i of channel c as a signed 16-bit value. */
    def sample(i: Int, c: Int = 0): Int = {
      val off = (i * channels + c) * 2
      ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toInt
    }
  }

  def parse(payload: Array[Byte]): Wav = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV: $msg")
    def le16(p: Int): Int =
      ((payload(p + 1) & 0xff) << 8) | (payload(p) & 0xff)
    def le32(p: Int): Long =
      ((payload(p + 3) & 0xffL) << 24) | ((payload(p + 2) & 0xffL) << 16) |
        ((payload(p + 1) & 0xffL) << 8) | (payload(p) & 0xffL)
    def tag(p: Int): String =
      new String(payload, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (payload.length < 44) fail("payload shorter than a WAV header")
    if (tag(0) != "RIFF") fail("missing RIFF magic")
    if (le32(4) != payload.length - 8)
      fail(s"RIFF size ${le32(4)} != payload ${payload.length - 8}")
    if (tag(8) != "WAVE") fail("missing WAVE form type")
    var pos = 12
    var rate = -1; var channels = -1; var fmtSeen = false
    var data: Array[Byte] = null
    while (pos + 8 <= payload.length && data == null) {
      val id = tag(pos); val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length)
        fail(s"chunk $id size $size overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small ($size)")
          val fmtTag = le16(pos + 8)
          if (fmtTag != 1) fail(s"not PCM (format tag $fmtTag)")
          channels = le16(pos + 10)
          if (channels < 1 || channels > 2)
            fail(s"unsupported channel count $channels")
          rate = le32(pos + 12).toInt
          if (rate <= 0) fail(s"bad sample rate $rate")
          val bits = le16(pos + 22)
          if (bits != 16) fail(s"unsupported bits/sample $bits")
          if (le16(pos + 20) != 2 * channels)
            fail(s"block align ${le16(pos + 20)} != ${2 * channels}")
          if (le32(pos + 16) != rate.toLong * 2 * channels)
            fail(s"byte rate ${le32(pos + 16)} inconsistent")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt")
          if (size % (2 * channels) != 0)
            fail(s"data size $size not frame-aligned")
          data = java.util.Arrays.copyOfRange(payload, pos + 8,
            pos + 8 + size.toInt)
        case _ => // unknown chunk (LIST, fact, …): skip by declared size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtSeen) fail("no fmt chunk")
    if (data == null) fail("no data chunk")
    Wav(rate, channels, data)
  }

  /** Assemble a minimal PCM WAV (the inverse of [[parse]] for the
    * synthesis side of q_llm_mm_audio and the spec's round-trips). */
  def assemble(rate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * 2 * channels).putShort((2 * channels).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}

/** A REAL mainstream-format image decoder for the seam: JPEG / PNG /
  * GIF / BMP through the JDK's own `javax.imageio` (ships in every
  * JRE — zero new jars, and headless-safe: `ImageIO.read` needs no
  * display). Output is the SAME canonical 8-bit interleaved RGB
  * buffer as [[PpmDecoder]] (3·w·h bytes, row-major, alpha dropped
  * via the sRGB int-pixel view), so a PNG and a PPM encoding of one
  * image decode BIT-IDENTICALLY — the property that makes downstream
  * fingerprints format-independent, pinned in ImageIoDecoderSpec
  * (PNG≡PPM equality, JPEG determinism). Unrecognized or corrupt
  * payloads throw (`ImageIO.read` returns null for unknown formats —
  * surfaced, never silently fingerprinted; the PpmDecoder contract).
  * Register with `spark.conf.set("graft.mm.decoder",
  * "streamline.llm.ImageIoDecoder")`. */
class ImageIoDecoder extends MediaDecoder {
  def decode(payload: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException(
        "ImageIO: unrecognized or corrupt image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    if (w.toLong * h > 0x7fffffffL / 3)
      throw new IllegalArgumentException(s"ImageIO: image too large ${w}x$h")
    val out = new Array[Byte](3 * w * h)
    var i = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // sRGB-converted int pixel
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }
}

object MediaDecoder {

  /** The default: payloads pass through untouched (the honest stub
    * while no real codec is on the classpath). */
  object Identity extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** Resolve the session's decoder: `graft.mm.decoder` names a
    * zero-arg-constructible [[MediaDecoder]] implementation; unset (or
    * empty) means [[Identity]]. Resolution is plan-time and per-call —
    * a conf change takes effect on the next query build, the
    * swap-a-codec contract MediaDecoderSpec pins. */
  def forSession(spark: SparkSession): MediaDecoder =
    spark.conf.get("graft.mm.decoder", "") match {
      case "" => Identity
      case cls => Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[MediaDecoder]
    }

  /** Insert the decode stage over a `(doc_id LONG, payload BINARY)`
    * frame. Identity elides the stage — the caller's downstream
    * expressions stay in one whole-stage-codegen span over the scan;
    * any other codec runs as typed mapPartitions (one codec instance
    * per partition). */
  def decoded(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    forSession(spark) match {
      case Identity => df
      case codec =>
        df.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            (id, codec.decode(bytes))
          })
          .toDF(df.columns.toIndexedSeq: _*)
    }
  }
}
