package graft.operators

/** Real image decoding for the multimodal column path — a
  * dependency-free parser for two public formats:
  *
  *  - PNM binary: P6 (RGB) and P5 (grayscale), per the Netpbm spec —
  *    whitespace/`#`-comment-tolerant header, 8-bit samples for
  *    maxval <= 255 and big-endian 16-bit samples above.
  *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (or the larger V4/V5
  *    headers), uncompressed (BI_RGB) 24/32 bpp, 4-byte-padded rows,
  *    bottom-up or top-down (negative height); 32 bpp alpha is
  *    ignored for the channel stats.
  *
  * The decoder computes pixel SUMMARY STATS in a single streaming
  * pass over the payload — per-channel means, global sample min/max —
  * without materializing a decoded pixel buffer, so per-record memory
  * is O(1) regardless of image size. That is the shape a feature
  * extractor needs at 100 TB: decode cost is one scan of bytes that
  * are already in the partition, and nothing but the fixed-width
  * stats row survives the stage.
  *
  * Malformed input is a `Left(reason)`, never an exception: a corrupt
  * record in a trillion-row media table must become an error row the
  * pipeline can route (see [[Media.decodeImages]]), not a task
  * failure that kills the stage.
  */
object ImageCodec {

  /** Single-pass summary of a decoded image. For grayscale (P5) the
    * one channel is reported in all three means. `pxMin`/`pxMax` are
    * over color samples (alpha excluded for 32 bpp BMP).
    */
  final case class ImageStats(
      codec: String, // ppm | pgm | bmp
      width: Int,
      height: Int,
      channels: Int, // color channels in the stats (1 or 3)
      maxval: Int, // 255 for BMP; PNM header maxval otherwise
      nPixels: Long,
      rMean: Double,
      gMean: Double,
      bMean: Double,
      pxMin: Int,
      pxMax: Int)

  /** True when the payload starts with a magic this codec can parse —
    * the cheap sniff [[Media.decodeFeatures]] uses to route payloads.
    */
  def sniff(data: Array[Byte]): Boolean =
    data.length >= 2 && (
      (data(0) == 'P' && (data(1) == '5' || data(1) == '6')) ||
        (data(0) == 'B' && data(1) == 'M'))

  /** Decode a payload to its summary stats, or a parse-failure reason. */
  def decode(data: Array[Byte]): Either[String, ImageStats] =
    if (data.length < 2) Left("image: payload shorter than any magic")
    else if (data(0) == 'P' && (data(1) == '5' || data(1) == '6')) decodePnm(data)
    else if (data(0) == 'B' && data(1) == 'M') decodeBmp(data)
    else Left("image: unrecognized magic")

  // ------------------------------------------------------------- PNM

  /** Parsed PNM header: everything needed to address the raster. */
  private final case class PnmHeader(
      codec: String, channels: Int, width: Int, height: Int,
      maxval: Int, rasterPos: Int)

  private def parsePnmHeader(d: Array[Byte]): Either[String, PnmHeader] = {
    val channels = if (d(1) == '6') 3 else 1
    val codec = if (channels == 3) "ppm" else "pgm"
    var pos = 2

    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

    // header tokens are separated by whitespace; '#' starts a comment
    // that runs to end-of-line (Netpbm allows comments anywhere in
    // the header)
    def skipWsAndComments(): Unit = {
      var more = true
      while (more && pos < d.length) {
        if (isWs(d(pos))) pos += 1
        else if (d(pos) == '#') { while (pos < d.length && d(pos) != '\n') pos += 1 }
        else more = false
      }
    }

    def readHeaderInt(what: String): Either[String, Int] = {
      skipWsAndComments()
      if (pos >= d.length || d(pos) < '0' || d(pos) > '9')
        return Left(s"$codec: missing $what in header")
      var v = 0L
      while (pos < d.length && d(pos) >= '0' && d(pos) <= '9') {
        v = v * 10 + (d(pos) - '0')
        if (v > Int.MaxValue) return Left(s"$codec: $what overflows")
        pos += 1
      }
      Right(v.toInt)
    }

    for {
      w <- readHeaderInt("width")
      h <- readHeaderInt("height")
      maxval <- readHeaderInt("maxval")
      _ <- if (w <= 0 || h <= 0) Left(s"$codec: non-positive dimensions ${w}x$h")
      else if (maxval <= 0 || maxval > 65535) Left(s"$codec: maxval $maxval out of range")
      // exactly ONE whitespace byte separates maxval from the raster
      else if (pos >= d.length || !isWs(d(pos))) Left(s"$codec: missing raster separator")
      else Right(())
    } yield PnmHeader(codec, channels, w, h, maxval, pos + 1)
  }

  private def decodePnm(d: Array[Byte]): Either[String, ImageStats] =
    parsePnmHeader(d).flatMap { hd =>
      val codec = hd.codec
      val channels = hd.channels
      val (w, h, maxval) = (hd.width, hd.height, hd.maxval)
      val pos = hd.rasterPos
      val bytesPerSample = if (maxval > 255) 2 else 1
      val nSamples = w.toLong * h * channels
      val need = nSamples * bytesPerSample
      if (d.length - pos < need)
        Left(s"$codec: truncated raster — need $need bytes, have ${d.length - pos}")
      else {
          val sums = new Array[Long](3)
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var i = 0L
        var p = pos
        while (i < nSamples) {
          val v =
            if (bytesPerSample == 1) d(p) & 0xff
            else ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff) // 16-bit is big-endian
          sums((i % channels).toInt) += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          p += bytesPerSample
          i += 1
        }
        val n = w.toLong * h
        val (r, g, b) =
          if (channels == 3) (sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n)
          else { val m = sums(0).toDouble / n; (m, m, m) }
        Right(ImageStats(codec, w, h, channels, maxval, n, r, g, b, mn, mx))
      }
    }

  /** Perceptual average-hash (aHash) of an 8-bit PNM image: sample a
    * fixed 8x8 grid by nearest-neighbor — grid cell (gy, gx) reads
    * pixel (gy*h div 8, gx*w div 8), so any geometry maps onto the
    * same 64 positions — take gray = r+g+b per sample (3*v for
    * grayscale P5, keeping the scale identical), threshold each
    * sample against the floor mean (sum div 64), and pack bit
    * i = gy*8+gx into two 32-bit halves (hi = bits 32..63, lo =
    * 0..31; split because a 1<<63 BIGINT overflows the DuckDB
    * oracle's integer build of the same hash). Every step is integer
    * arithmetic, so the q121 gate is exact.
    */
  def aHash(data: Array[Byte]): Either[String, (Long, Long)] =
    if (data.length < 2 || data(0) != 'P' || (data(1) != '5' && data(1) != '6'))
      Left("ahash: not a PNM payload")
    else parsePnmHeader(data).flatMap { hd =>
      if (hd.maxval > 255) Left(s"${hd.codec}: ahash requires 8-bit samples")
      else {
        val need = hd.width.toLong * hd.height * hd.channels
        if (data.length - hd.rasterPos < need)
          Left(s"${hd.codec}: truncated raster — need $need bytes, have ${data.length - hd.rasterPos}")
        else {
          val grays = new Array[Int](64)
          var g = 0
          while (g < 64) {
            val y = (g / 8) * hd.height / 8
            val x = (g % 8) * hd.width / 8
            val o = hd.rasterPos + hd.channels * (y * hd.width + x)
            grays(g) =
              if (hd.channels == 3) (data(o) & 0xff) + (data(o + 1) & 0xff) + (data(o + 2) & 0xff)
              else 3 * (data(o) & 0xff)
            g += 1
          }
          val mean = grays.map(_.toLong).sum / 64L
          var hi = 0L
          var lo = 0L
          var i = 0
          while (i < 64) {
            if (grays(i) > mean) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Right((hi, lo))
        }
      }
    }

  // ------------------------------------------------------------- BMP

  private def decodeBmp(d: Array[Byte]): Either[String, ImageStats] = {
    if (d.length < 54) return Left("bmp: truncated header")
    def u16(o: Int): Int = (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) | ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)

    val dataOffset = i32(10)
    val dibSize = i32(14)
    if (dibSize < 40) return Left(s"bmp: unsupported DIB header size $dibSize")
    val width = i32(18)
    val heightRaw = i32(22)
    val bpp = u16(28)
    val compression = i32(30)
    if (width <= 0 || heightRaw == 0) return Left(s"bmp: bad dimensions ${width}x$heightRaw")
    if (compression != 0) return Left(s"bmp: compression $compression not supported (BI_RGB only)")
    if (bpp != 24 && bpp != 32) return Left(s"bmp: $bpp bpp not supported (24/32 only)")
    val height = math.abs(heightRaw) // negative height = top-down row order
    val bytesPerPx = bpp / 8
    // rows are padded to 4-byte boundaries
    val rowSize = ((width.toLong * bytesPerPx + 3) / 4 * 4)
    val need = rowSize * height
    if (dataOffset < 14 + dibSize || dataOffset > d.length)
      return Left(s"bmp: bad pixel data offset $dataOffset")
    if (d.length - dataOffset < need)
      return Left(s"bmp: truncated raster — need $need bytes, have ${d.length - dataOffset}")

    // stats are order-independent, so row direction doesn't matter;
    // samples within a pixel are B,G,R[,A]
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var row = 0
    while (row < height) {
      var p = dataOffset + (row * rowSize).toInt
      var x = 0
      while (x < width) {
        val bl = d(p) & 0xff
        val gr = d(p + 1) & 0xff
        val rd = d(p + 2) & 0xff
        bSum += bl; gSum += gr; rSum += rd
        val lo = math.min(bl, math.min(gr, rd))
        val hi = math.max(bl, math.max(gr, rd))
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
        p += bytesPerPx // 32 bpp: skip alpha
        x += 1
      }
      row += 1
    }
    val n = width.toLong * height
    Right(ImageStats("bmp", width, height, 3, 255, n,
      rSum.toDouble / n, gSum.toDouble / n, bSum.toDouble / n, mn, mx))
  }
}
