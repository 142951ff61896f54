package streamline

import org.scalatest.funsuite.AnyFunSuite
import streamline.llm.{ImageIoDecoder, PpmDecoder}

/** Pins the javax.imageio codec: a PNG and a hand-built P6 PPM of the
  * SAME pixels decode to bit-identical canonical RGB buffers (the
  * format-independence property downstream fingerprints rely on),
  * JPEG decoding is deterministic, and garbage payloads are rejected,
  * never silently fingerprinted. */
class ImageIoDecoderSpec extends AnyFunSuite {

  private val (w, h) = (7, 5)
  private def px(x: Int, y: Int): (Int, Int, Int) =
    ((x * 37 + y * 11) % 256, (x * 91 + y * 53) % 256,
      (x * 13 + y * 197) % 256)

  private def bufferedImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bufferedImage(), fmt, bos))
    bos.toByteArray
  }

  private def p6(): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = (for (y <- 0 until h; x <- 0 until w;
                       v <- { val (r, g, b) = px(x, y); Seq(r, g, b) })
      yield v.toByte).toArray
    header ++ raster
  }

  test("PNG and PPM encodings of one image decode bit-identically") {
    val viaPng = new ImageIoDecoder().decode(encode("png"))
    val viaPpm = new PpmDecoder().decode(p6())
    assert(viaPng.length == 3 * w * h)
    assert(java.util.Arrays.equals(viaPng, viaPpm))
  }

  test("JPEG decodes deterministically with correct geometry") {
    // a SMOOTH gradient (the per-pixel noise of px() would legally
    // smear under DCT quantization): lossy error stays small here
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((x * 12) << 16) | ((y * 12) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val payload = bos.toByteArray
    val a = new ImageIoDecoder().decode(payload)
    val b = new ImageIoDecoder().decode(payload)
    assert(a.length == 3 * 16 * 16)
    assert(java.util.Arrays.equals(a, b))
    // lossy but bounded on smooth content
    val maxErr = (for (y <- 0 until 16; x <- 0 until 16) yield {
      val i = 3 * (y * 16 + x)
      math.max(math.abs((a(i) & 0xff) - x * 12),
        math.max(math.abs((a(i + 1) & 0xff) - y * 12),
          math.abs((a(i + 2) & 0xff) - 128)))
    }).max
    assert(maxErr < 48, s"JPEG drifted implausibly far: $maxErr")
  }

  test("garbage payloads are rejected, not fingerprinted") {
    assertThrows[IllegalArgumentException] {
      new ImageIoDecoder().decode(Array.tabulate(64)(_.toByte))
    }
    assertThrows[IllegalArgumentException] {
      new ImageIoDecoder().decode("not an image at all".getBytes)
    }
  }
}
