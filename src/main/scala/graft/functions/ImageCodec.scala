package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM image codec — a REAL public-format parser for the multimodal
  * column family (no external codec libraries; only java.util.zip, which
  * is the JDK's bundled zlib).
  *
  * Decoder support:
  *  - PNG (ISO/IEC 15948): non-interlaced, color types 0 (grayscale),
  *    2 (RGB) and 6 (RGBA) at depths 8 and 16 (16-bit samples downsample
  *    to their high byte), and type 3 (palette, depth 8 — the dominant
  *    web-crawl variant) with PLTE index expansion; chunk CRCs verified;
  *    all five scanline filters (None/Sub/Up/Average/Paeth) inverted
  *    exactly over the format's byte-level pixel step.
  *  - BMP (BITMAPINFOHEADER): 24-bit uncompressed, bottom-up or top-down,
  *    4-byte row padding stripped.
  *
  * The encoders exist so the decode path can be exercised with REAL bytes
  * end-to-end (and gated: q_multimodal encodes a deterministic image from
  * each document's bytes, decodes it back with this parser, and the
  * DuckDB oracle predicts the decoded statistics from the text alone —
  * any filter/padding/inflate defect breaks the hash). The PNG encoder
  * deliberately cycles through ALL five filter types (row r uses filter
  * r mod 5) so every de-filter branch sits on the gated path.
  */
object ImageCodec {

  /** Decoded raster: `pixels` is row-major, top-down, channel-interleaved
    * unsigned bytes (1 channel for grayscale, 3 for RGB, 4 for RGBA). */
  final case class Decoded(format: String, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  /** Sniff the container by magic and decode; throws on anything that is
    * not a well-formed supported image (a real codec's contract — the
    * caller decides how to quarantine bad payloads). */
  def decode(bytes: Array[Byte]): Decoded =
    if (isPng(bytes)) decodePng(bytes)
    else if (isBmp(bytes)) decodeBmp(bytes)
    else throw new IllegalArgumentException(
      s"unsupported image container (${bytes.length} bytes)")

  // ------------------------------------------------------------- PNG

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  def decodePng(bytes: Array[Byte]): Decoded = {
    require(isPng(bytes), "bad PNG signature")
    var off = 8
    var width = 0; var height = 0; var colorType = -1; var bitDepth = 0
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      // a signed-negative length would SHRINK the bound below and walk
      // the CRC update off the array — reject it as malformed up front
      require(len >= 0, s"negative chunk length in $ctype")
      require(off + 8 + len + 4 <= bytes.length, s"truncated chunk $ctype")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, off + 8 + len),
        s"CRC mismatch in $ctype")
      ctype match {
        case "IHDR" =>
          width = be32(bytes, off + 8)
          height = be32(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          require(colorType == 0 || colorType == 2 || colorType == 3 ||
            colorType == 6, s"unsupported color type $colorType")
          require(bitDepth == 8 ||
            (bitDepth == 16 && colorType != 3),
            s"unsupported bit depth $bitDepth for color type $colorType")
          require((bytes(off + 20) & 0xFF) == 0, "interlaced PNG unsupported")
        case "PLTE" =>
          require(len % 3 == 0 && len >= 3 && len <= 768,
            s"bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(seenEnd, "missing IEND")
    if (colorType == 3) require(palette != null, "palette PNG missing PLTE")
    val rawChannels = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1 // one palette index per pixel before expansion
      case 6 => 4
    }
    // the filter step and scanline width are in BYTES: 16-bit samples
    // filter over channels·2-byte pixels (PNG spec: bpp = ceil bytes)
    val sampleBytes = bitDepth / 8
    val bpp = rawChannels * sampleBytes
    val stride = width * bpp
    val raw = inflate(idat.toByteArray, (stride + 1) * height)
    require(raw.length == (stride + 1) * height,
      s"IDAT inflates to ${raw.length}, want ${(stride + 1) * height}")
    val out = new Array[Byte](stride * height)
    var r = 0
    while (r < height) {
      val filter = raw(r * (stride + 1)) & 0xFF
      val src = r * (stride + 1) + 1
      val dst = r * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xFF
        val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val b = if (r > 0) out(dst - stride + i) & 0xFF else 0
        val c = if (r > 0 && i >= bpp) out(dst - stride + i - bpp) & 0xFF else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case f => throw new IllegalArgumentException(s"bad filter $f")
        }
        out(dst + i) = (recon & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    if (colorType == 3) {
      // palette expansion: every index byte becomes its PLTE RGB triple
      val nEntries = palette.length / 3
      val px = new Array[Byte](width * height * 3)
      var i = 0
      while (i < out.length) {
        val idx = out(i) & 0xFF
        require(idx < nEntries, s"palette index $idx >= $nEntries entries")
        px(i * 3) = palette(idx * 3)
        px(i * 3 + 1) = palette(idx * 3 + 1)
        px(i * 3 + 2) = palette(idx * 3 + 2)
        i += 1
      }
      Decoded("png8p", width, height, 3, px)
    } else if (bitDepth == 16) {
      // 16→8 downsample: keep the high byte of each big-endian sample
      // (the standard truncating conversion; the low byte is discarded)
      val px = new Array[Byte](width * height * rawChannels)
      var i = 0
      while (i < px.length) { px(i) = out(i * 2); i += 1 }
      Decoded("png16", width, height, rawChannels, px)
    } else Decoded("png", width, height, rawChannels, out)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(z: Array[Byte], hint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new ByteArrayOutputStream(math.max(hint, 64))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalArgumentException(
        "truncated zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Encode an 8-bit image as PNG. `pixels` is row-major channel-
    * interleaved; row r is filtered with type r mod 5, so a decoder must
    * invert every filter to reproduce the input. */
  def encodePng(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4)
    require(pixels.length == width * height * channels)
    val raw = filterRows(width, height, bpp = channels, samples = pixels)
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8; compression/filter/interlace 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode a paletted PNG (color type 3, depth 8): `indices` is one
    * palette index per pixel (row-major), `palette` is up to 256 RGB
    * triples. Rows cycle all five filters like [[encodePng]], so every
    * de-filter branch sits on the palette decode path too. */
  def encodePalettePng(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 768, s"bad palette size ${palette.length}")
    require(indices.length == width * height)
    val raw = filterRows(width, height, bpp = 1, samples = indices)
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 3 // depth 8, color type 3 (palette)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "PLTE", palette)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode a 16-bit PNG (color types 0/2/6 at depth 16) from 8-bit
    * source pixels: each sample b becomes the big-endian 16-bit value
    * (b<<8 | b), the exact 8→16 scaling PNG recommends, so the decoder's
    * high-byte downsample reproduces the source exactly. Rows cycle all
    * five filters over the channels·2-byte pixel step. */
  def encodePng16(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4)
    require(pixels.length == width * height * channels)
    val wide = new Array[Byte](pixels.length * 2)
    var i = 0
    while (i < pixels.length) {
      wide(i * 2) = pixels(i); wide(i * 2 + 1) = pixels(i)
      i += 1
    }
    val raw = filterRows(width, height, bpp = channels * 2, samples = wide)
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 16; ihdr(9) = colorType.toByte
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Apply the cycling scanline filters (row r → filter r mod 5) over
    * row-major `samples` with a `bpp`-byte pixel step — the shared
    * filtering stage of all three PNG encoders. */
  private def filterRows(width: Int, height: Int, bpp: Int,
      samples: Array[Byte]): Array[Byte] = {
    val stride = width * bpp
    require(samples.length == stride * height)
    val raw = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      val filter = r % 5
      raw(r * (stride + 1)) = filter.toByte
      val src = r * stride
      val dst = r * (stride + 1) + 1
      var i = 0
      while (i < stride) {
        val x = samples(src + i) & 0xFF
        val a = if (i >= bpp) samples(src + i - bpp) & 0xFF else 0
        val b = if (r > 0) samples(src - stride + i) & 0xFF else 0
        val c = if (r > 0 && i >= bpp) samples(src - stride + i - bpp) & 0xFF else 0
        val filt = filter match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(dst + i) = (filt & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    raw
  }

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(out: ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = ctype.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ------------------------------------------------------------- BMP

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  def decodeBmp(bytes: Array[Byte]): Decoded = {
    require(isBmp(bytes), "bad BMP magic")
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = le32(bytes, 18)
    val rawH = le32(bytes, 22)
    val bottomUp = rawH > 0
    val height = math.abs(rawH)
    val bpp = (bytes(28) & 0xFF) | ((bytes(29) & 0xFF) << 8)
    val compression = le32(bytes, 30)
    require(bpp == 24, s"unsupported BMP bpp $bpp")
    require(compression == 0, s"unsupported BMP compression $compression")
    val rowBytes = width * 3
    val rowStride = (rowBytes + 3) / 4 * 4 // rows pad to 4-byte multiples
    require(dataOff + rowStride * height <= bytes.length, "truncated BMP")
    val out = new Array[Byte](width * height * 3)
    var r = 0
    while (r < height) {
      val srcRow = if (bottomUp) height - 1 - r else r
      val src = dataOff + srcRow * rowStride
      var x = 0
      while (x < width) {
        // BMP stores BGR; emit RGB
        out((r * width + x) * 3) = bytes(src + x * 3 + 2)
        out((r * width + x) * 3 + 1) = bytes(src + x * 3 + 1)
        out((r * width + x) * 3 + 2) = bytes(src + x * 3)
        x += 1
      }
      r += 1
    }
    Decoded("bmp", width, height, 3, out)
  }

  /** Encode 24-bit BMP (bottom-up, padded rows) from row-major top-down
    * RGB pixels. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3)
    val rowStride = (width * 3 + 3) / 4 * 4
    val dataSize = rowStride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLe32(out, 2, 54 + dataSize)
    putLe32(out, 10, 54)
    putLe32(out, 14, 40)
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive → bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putLe32(out, 34, dataSize)
    var r = 0
    while (r < height) {
      val dst = 54 + (height - 1 - r) * rowStride // bottom-up
      var x = 0
      while (x < width) {
        out(dst + x * 3) = pixels((r * width + x) * 3 + 2) // B
        out(dst + x * 3 + 1) = pixels((r * width + x) * 3 + 1) // G
        out(dst + x * 3 + 2) = pixels((r * width + x) * 3) // R
        x += 1
      }
      r += 1
    }
    out
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** Pad `bytes` with zeros to a whole number of rows and view them as
    * the pixel samples of a width-`w`, `channels`-channel image — the
    * deterministic bytes→raster convention q_multimodal's gate predicts
    * arithmetically (padding contributes nothing to the sample sum). */
  def bytesToRaster(bytes: Array[Byte], w: Int, channels: Int): (Int, Array[Byte]) = {
    val rowSamples = w * channels
    val h = math.max(1, (bytes.length + rowSamples - 1) / rowSamples)
    val px = java.util.Arrays.copyOf(bytes, rowSamples * h)
    (h, px)
  }
}
