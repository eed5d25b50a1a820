package graft.functions

/** One decoded raster image: `rgb` is row-major (index `y*width + x`),
  * each element a packed `0xRRGGBB`.
  */
final case class DecodedImage(width: Int, height: Int, rgb: Array[Int])

/** Real image decode/encode on the JDK's built-in codecs
  * (`javax.imageio` — PNG/BMP/GIF/JPEG readers ship with the JRE, so
  * this adds no dependency and runs on every executor).
  *
  * Decoding is executor-local and allocation-bounded (one int[] per
  * image); the distributed shape around it stays `mapPartitions` over
  * a binary column — see [[Multimodal]]. Lossless formats (PNG/BMP)
  * round-trip pixels exactly, which is what makes the DuckDB oracle
  * twins possible: the fixture generator builds images from a pure
  * pixel formula, the engine decodes the encoded bytes, and the oracle
  * recomputes the formula in SQL — any decode defect breaks the hash.
  */
object ImageCodec {

  /** Cheap magic-byte sniff so non-image payloads skip codec init:
    * PNG (\x89PNG), BMP (BM), GIF (GIF8), JPEG (\xFF\xD8).
    */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && {
      val b0 = bytes(0) & 0xff
      val b1 = bytes(1) & 0xff
      (b0 == 0x89 && b1 == 'P') ||
      (b0 == 'B' && b1 == 'M') ||
      (b0 == 'G' && b1 == 'I' && (bytes(2) & 0xff) == 'F') ||
      (b0 == 0xff && b1 == 0xd8)
    }

  /** Decode to packed RGB; None for payloads the JDK codecs reject
    * (including anything that fails the magic sniff).
    */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (!looksLikeImage(bytes)) None
    else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Int](w * h)
      img.getRGB(0, 0, w, h, px, 0, w)
      var i = 0
      while (i < px.length) { px(i) = px(i) & 0xffffff; i += 1 }
      DecodedImage(w, h, px)
    }

  /** Encode a pixel formula as a truecolor PNG (fixture generation +
    * specs; PNG is lossless so decode(encodePng(f)) == f exactly).
    */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Integer nearest-neighbor resample to `ow`×`oh` (row-major):
    * source pixel of output (i, j) is (⌊i·w/ow⌋, ⌊j·h/oh⌋) — exact
    * integer math, so the oracle twin reproduces it with `//`.
    */
  def resampleNearest(d: DecodedImage, ow: Int, oh: Int): Array[Int] =
    Array.tabulate(oh * ow) { k =>
      val i = k % ow
      val j = k / ow
      val x = (i.toLong * d.width / ow).toInt
      val y = (j.toLong * d.height / oh).toInt
      d.rgb(y * d.width + x)
    }

  /** Per-channel integer sums — exact (no float accumulation), so both
    * engines agree bit-for-bit.
    */
  def channelSums(d: DecodedImage): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < d.rgb.length) {
      val p = d.rgb(i)
      r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
      i += 1
    }
    (r, g, b)
  }

  def toHex(px: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(px.length * 6)
    px.foreach(p => sb.append(f"${p & 0xffffff}%06x"))
    sb.toString
  }
}
