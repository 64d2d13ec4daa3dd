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

  // ---- r19: palette (color type 3) and 16-bit depth ----

  /** The gated path's palette — referenced from the operator itself so
    * the spec can't drift from the values q_multimodal's oracle predicts. */
  private def gatedPalette: Array[Byte] =
    graft.operators.Multimodal.GatedPalette

  test("palette PNG roundtrip: indices expand through PLTE to RGB " +
    "(all 5 filters on the index plane)") {
    for (h <- Seq(1, 5, 11)) {
      val idx = fill(7 * h, seed = h + 100)
      val pal = gatedPalette
      val d = ImageCodec.decode(ImageCodec.encodePalettePng(7, h, pal, idx))
      assert(d.format === "png8p" && d.channels === 3 &&
        d.width === 7 && d.height === h)
      val want = idx.flatMap { b =>
        val i = b & 0xFF
        Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))
      }
      assert(d.pixels.toSeq === want.toSeq, s"h=$h")
    }
  }

  test("our palette PNGs are real: ImageIO expands to the same RGB") {
    val w = 9; val h = 6
    val idx = fill(w * h, seed = 7)
    val pal = gatedPalette
    val img = imageIoRead(ImageCodec.encodePalettePng(w, h, pal, idx))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val i = idx(y * w + x) & 0xFF
      assert(((rgb >> 16) & 0xFF) === (pal(i * 3) & 0xFF), s"R($x,$y)")
      assert(((rgb >> 8) & 0xFF) === (pal(i * 3 + 1) & 0xFF), s"G($x,$y)")
      assert((rgb & 0xFF) === (pal(i * 3 + 2) & 0xFF), s"B($x,$y)")
    }
  }

  test("our decoder reads palette PNGs written by ImageIO") {
    val w = 8; val h = 5
    val idx = fill(w * h, seed = 31)
    val pal = gatedPalette
    // build an IndexColorModel image and let ImageIO encode it as PNG
    val r = Array.tabulate(256)(i => pal(i * 3))
    val g = Array.tabulate(256)(i => pal(i * 3 + 1))
    val b = Array.tabulate(256)(i => pal(i * 3 + 2))
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, b)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val d = ImageCodec.decode(baos.toByteArray)
    assert(d.format === "png8p" && d.channels === 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = idx(y * w + x) & 0xFF
      val o = (y * w + x) * 3
      assert((d.pixels(o) & 0xFF) === (pal(i * 3) & 0xFF), s"R($x,$y)")
      assert((d.pixels(o + 1) & 0xFF) === (pal(i * 3 + 1) & 0xFF), s"G($x,$y)")
      assert((d.pixels(o + 2) & 0xFF) === (pal(i * 3 + 2) & 0xFF), s"B($x,$y)")
    }
  }

  test("16-bit PNG roundtrip: (b<<8|b) samples downsample back to b " +
    "(gray and RGB, all 5 filters over the 2-byte step)") {
    for ((ch, h) <- Seq((1, 7), (3, 6))) {
      val px = fill(5 * h * ch, seed = ch * 10 + h)
      val d = ImageCodec.decode(ImageCodec.encodePng16(5, h, ch, px))
      assert(d.format === "png16" && d.channels === ch &&
        d.width === 5 && d.height === h)
      assert(d.pixels.toSeq === px.toSeq, s"ch=$ch")
    }
  }

  test("our 16-bit PNGs are real: ImageIO reads 16-bit samples whose " +
    "high bytes match") {
    val w = 6; val h = 5
    val px = fill(w * h, seed = 77)
    val img = imageIoRead(ImageCodec.encodePng16(w, h, 1, px))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val s16 = img.getRaster.getSample(x, y, 0)
      assert((s16 >> 8) === (px(y * w + x) & 0xFF), s"($x,$y)")
      assert((s16 & 0xFF) === (px(y * w + x) & 0xFF), s"low($x,$y)")
    }
  }

  test("palette PNG without PLTE and sub-byte palette depths are " +
    "rejected, not mis-decoded") {
    // a type-3 stream missing its PLTE must fail loudly
    val good = ImageCodec.encodePalettePng(4, 4, gatedPalette,
      fill(16, seed = 3))
    // strip the PLTE chunk: copy signature+IHDR, skip PLTE, keep rest
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8)
    var off = 8
    while (off + 8 <= good.length) {
      val len = ((good(off) & 0xFF) << 24) | ((good(off + 1) & 0xFF) << 16) |
        ((good(off + 2) & 0xFF) << 8) | (good(off + 3) & 0xFF)
      val ctype = new String(good, off + 4, 4, "US-ASCII")
      if (ctype != "PLTE") out.write(good, off, 12 + len)
      off += 12 + len
    }
    intercept[IllegalArgumentException](ImageCodec.decode(out.toByteArray))
  }
}
