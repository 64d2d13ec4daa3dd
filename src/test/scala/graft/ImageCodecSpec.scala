package graft

import graft.functions.ImageCodec
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM image codec against REAL bytes, cross-checked with the
  * JDK's independent ImageIO reader/writer (javax.imageio ships in every
  * JDK — it is an INDEPENDENT implementation, used here test-side only):
  *  - our PNG encoder's output must decode to identical pixels under
  *    ImageIO (proves the files are real PNGs, filters and all);
  *  - ImageIO-written PNGs must decode to identical pixels under our
  *    decoder (proves the decoder handles files we didn't write);
  *  - BMP roundtrips through both readers;
  *  - corrupted streams are rejected, not mis-decoded.
  */
class ImageCodecSpec extends AnyFunSuite {

  /** Deterministic pseudo-random pixel fill (no RNG — xorshift on the
    * index) covering the full byte range. */
  private def fill(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n) { i =>
      var x = i * 2654435761L + seed
      x ^= x >>> 13; x ^= x << 7
      (x & 0xFF).toByte
    }

  private def imageIoRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  test("PNG gray roundtrip: our encoder (all 5 filters) -> our decoder") {
    for (h <- Seq(1, 2, 5, 7, 13)) { // ≥5 rows exercises every filter type
      val px = fill(9 * h, seed = h)
      val d = ImageCodec.decode(ImageCodec.encodePng(9, h, 1, px))
      assert(d.format === "png" && d.width === 9 && d.height === h &&
        d.channels === 1)
      assert(d.pixels.toSeq === px.toSeq, s"h=$h")
    }
  }

  test("PNG RGB and RGBA roundtrip through our codec") {
    for (ch <- Seq(3, 4)) {
      val px = fill(8 * 6 * ch, seed = ch)
      val d = ImageCodec.decode(ImageCodec.encodePng(8, 6, ch, px))
      assert(d.channels === ch && d.pixels.toSeq === px.toSeq)
    }
  }

  test("our PNGs are real PNGs: ImageIO decodes them to identical pixels") {
    val w = 11; val h = 9
    val px = fill(w * h, seed = 42)
    val img = imageIoRead(ImageCodec.encodePng(w, h, 1, px))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val gray = img.getRaster.getSample(x, y, 0)
      assert(gray === (px(y * w + x) & 0xFF), s"($x,$y)")
    }
  }

  test("our decoder reads PNGs written by ImageIO (independent encoder)") {
    val w = 10; val h = 7
    val px = fill(w * h * 3, seed = 7)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, ((px(i) & 0xFF) << 16) | ((px(i + 1) & 0xFF) << 8) |
        (px(i + 2) & 0xFF))
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val d = ImageCodec.decode(out.toByteArray)
    assert(d.format === "png" && d.width === w && d.height === h &&
      d.channels === 3)
    assert(d.pixels.toSeq === px.toSeq)
  }

  test("BMP roundtrip incl. row padding, cross-checked with ImageIO") {
    val w = 5; val h = 4 // 15 bytes/row -> 1-byte pad per row
    val px = fill(w * h * 3, seed = 3)
    val bmp = ImageCodec.encodeBmp(w, h, px)
    val d = ImageCodec.decode(bmp)
    assert(d.format === "bmp" && d.width === w && d.height === h)
    assert(d.pixels.toSeq === px.toSeq)
    val img = imageIoRead(bmp)
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val i = (y * w + x) * 3
      assert(((rgb >> 16) & 0xFF) === (px(i) & 0xFF), s"R($x,$y)")
      assert(((rgb >> 8) & 0xFF) === (px(i + 1) & 0xFF), s"G($x,$y)")
      assert((rgb & 0xFF) === (px(i + 2) & 0xFF), s"B($x,$y)")
    }
  }

  test("corrupt bytes are rejected, not mis-decoded") {
    val good = ImageCodec.encodePng(6, 6, 1, fill(36, seed = 9))
    val flipped = good.clone()
    flipped(20) = (flipped(20) ^ 0x55).toByte // inside IHDR data -> CRC fails
    intercept[IllegalArgumentException](ImageCodec.decode(flipped))
    intercept[IllegalArgumentException](
      ImageCodec.decode("not an image at all".getBytes("UTF-8")))
    val truncated = java.util.Arrays.copyOf(good, good.length - 8)
    intercept[Exception](ImageCodec.decode(truncated))
  }

  test("bytesToRaster pads with zeros to whole rows") {
    val (h, px) = ImageCodec.bytesToRaster(Array[Byte](1, 2, 3, 4, 5), 2, 1)
    assert(h === 3 && px.toSeq === Seq[Byte](1, 2, 3, 4, 5, 0))
  }
}
