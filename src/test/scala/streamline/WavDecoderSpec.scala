package streamline

import org.scalatest.funsuite.AnyFunSuite
import streamline.llm.WavDecoder

/** Pins the RIFF/WAVE PCM codec: assemble→parse round-trips
  * bit-exactly, unknown chunks are skipped by declared size (the spec
  * behavior a naive fixed-offset parser gets wrong), stereo frames
  * index correctly, and malformed payloads are REJECTED, never
  * silently fingerprinted (the PpmDecoder contract). */
class WavDecoderSpec extends AnyFunSuite {

  private val mono = Array.tabulate(50)(i =>
    (((i * 7919) % 65536) - 32768).toShort)

  test("assemble/parse round-trips bit-exactly") {
    val wav = WavDecoder.parse(WavDecoder.assemble(16000, 1, mono))
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.nFrames == 50)
    assert((0 until 50).forall(i => wav.sample(i) == mono(i).toInt))
  }

  test("stereo frames interleave and index per channel") {
    val stereo = Array.tabulate(20)(i => (i * 100 - 1000).toShort)
    val wav = WavDecoder.parse(WavDecoder.assemble(8000, 2, stereo))
    assert(wav.channels == 2 && wav.nFrames == 10)
    assert(wav.sample(3, 0) == stereo(6).toInt)
    assert(wav.sample(3, 1) == stereo(7).toInt)
  }

  test("unknown chunks between fmt and data are skipped by size") {
    val base = WavDecoder.assemble(12000, 1, mono)
    // splice a 6-byte LIST chunk (odd size exercises the pad byte)
    // between the fmt and data chunks: offsets 12..36 hold fmt
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.slice(0, 36) ++ junk ++ base.drop(36)
    // patch the RIFF size for the added bytes (little-endian at 4)
    val riffLen = spliced.length - 8
    for (b <- 0 until 4)
      spliced(4 + b) = ((riffLen >> (8 * b)) & 0xff).toByte
    val wav = WavDecoder.parse(spliced)
    assert(wav.sampleRate == 12000 && wav.nFrames == 50)
    assert((0 until 50).forall(i => wav.sample(i) == mono(i).toInt))
  }

  test("malformed payloads are rejected, not fingerprinted") {
    val good = WavDecoder.assemble(16000, 1, mono)
    def bad(mutate: Array[Byte] => Array[Byte]): Unit =
      assertThrows[IllegalArgumentException] {
        WavDecoder.parse(mutate(good.clone()))
      }
    bad(b => { b(0) = 'X'; b })                       // not RIFF
    bad(b => b.dropRight(10))                         // truncated data
    bad(b => { b(20) = 3; b })                        // non-PCM format
    bad(b => { b(34) = 8; b })                        // 8-bit samples
    bad(b => { b(22) = 5; b })                        // 5 channels
    bad(_ => Array[Byte](1, 2, 3))                    // far too short
    // declared data size overruns the payload
    bad(b => { b(43) = 0x7f.toByte; b })
  }

  test("the MediaDecoder seam yields the raw sample stream") {
    val payload = WavDecoder.assemble(16000, 1, mono)
    val decoded = new streamline.llm.WavDecoder().decode(payload)
    assert(decoded.length == 100)
    assert(java.util.Arrays.equals(decoded, payload.drop(44)))
  }
}
