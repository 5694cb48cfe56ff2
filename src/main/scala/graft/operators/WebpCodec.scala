package graft.operators

/** WebP (VP8L lossless) decode — after PNG/JPEG/GIF/BMP the last
  * common web image format, dependency-free on the same precedent as
  * the siblings (the reference sniffs and decodes its own inputs
  * JDK-only, /root/reference/src/main.rs:431-433). Implements the
  * public "WebP Lossless Bitstream Specification".
  *
  * IN scope:
  *  - RIFF container walk to a `VP8L` chunk; LSB-first bitstream,
  *    14-bit dimensions, version 0
  *  - the FULL prefix-code machinery: simple codes (1- and 2-symbol,
  *    including the 0-bit single-symbol degenerate), normal codes via
  *    the code-length code (3-bit CL lengths in the spec order,
  *    16/17/18 repeat tokens with offsets 3/3/11) and the max_symbol
  *    token-count shortcut
  *  - literals (green/red/blue/alpha tree order), LZ77 backward
  *    references (length/distance prefix values, the 120-entry 2D
  *    distance map AND direct distances above it), color cache
  *    (0x1e35a7bd multiplicative hash, every emitted pixel inserted)
  *  - the SUBTRACT-GREEN transform (inverse: add green to r/b)
  *
  * OUT of scope (explicit Lefts, the GIF/PDF scoping discipline):
  *  - lossy `VP8 ` and extended `VP8X` containers (animation, EXIF):
  *    a different codec family entirely
  *  - the predictor, cross-color and color-indexing transforms, and
  *    meta prefix codes (entropy images) — sub-image recursion;
  *    census/error-channel surfaces them, never silent garbage
  *
  * Memory: LZ77 references reach arbitrarily far back, so the decoder
  * materializes the O(raster) ARGB buffer behind an explicit size
  * guard — the progressive-JPEG documented exception class; stats and
  * the aHash grid fold over it once. Alpha is excluded from stats
  * (channels = 3, the rgba.png rule).
  *
  * The ENCODER half is the adapter/fixture substrate (encodePng
  * pattern, not a production sink): literal-only, no transforms, flat
  * 8-bit canonical codes for green/red/blue (transmitted through the
  * real code-length-code + max_symbol path, so the decoder's normal-
  * code machinery sits on every oracle row), 0-bit single-symbol
  * alpha and distance trees. Lossless: the oracle recomputes stats
  * from the source text exactly as the PPM/PNG gates do.
  */
object WebpCodec {

  import ImageCodec.ImageStats

  def sniff(d: Array[Byte]): Boolean =
    d.length >= 16 && d(0) == 'R' && d(1) == 'I' && d(2) == 'F' && d(3) == 'F' &&
      d(8) == 'W' && d(9) == 'E' && d(10) == 'B' && d(11) == 'P'

  private final case class WebpAbort(msg: String) extends RuntimeException(msg)

  /** CL-code transmission order (spec 5.2.2). */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  /** The 2D offset map for distance codes 1..120 (spec 5.2.3): pairs
    * (dx, dy), dist = dy * xsize + dx (clamped to >= 1). Codes above
    * 120 are direct: dist = code - 120.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (5, 0), (1, 5), (-1, 5), (5, 1), (-5, 1),
    (2, 5), (-2, 5), (5, 2), (-5, 2), (4, 3), (-4, 3), (3, 4), (-3, 4),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6),
    (6, 2), (-6, 2), (4, 4), (-4, 4), (5, 3), (-5, 3), (3, 5), (-3, 5),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 5), (-4, 5), (5, 4), (-5, 4),
    (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 6), (-3, 6),
    (6, 3), (-6, 3), (0, 8), (8, 0), (1, 8), (-1, 8), (7, 3), (-7, 3),
    (3, 7), (-3, 7), (8, 1), (-8, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 8), (-2, 8), (8, 2), (-8, 2), (5, 5), (-5, 5), (7, 4), (-7, 4),
    (4, 7), (-4, 7), (0, 9), (9, 0), (1, 9), (-1, 9), (9, 1), (-9, 1),
    (3, 8), (-3, 8), (8, 3), (-8, 3), (2, 9), (-2, 9), (9, 2), (-9, 2),
    (5, 6), (-5, 6), (6, 5), (-6, 5))

  // ------------------------------------------------------------ decode

  private final class BitReader(d: Array[Byte], var pos: Int, end: Int) {
    private var acc = 0L
    private var n = 0
    def bits(k: Int): Int = {
      while (n < k) {
        if (pos >= end) throw WebpAbort("webp: bitstream exhausted")
        acc |= (d(pos) & 0xffL) << n
        pos += 1
        n += 8
      }
      val v = (acc & ((1L << k) - 1)).toInt
      acc >>>= k
      n -= k
      v
    }
    def bit(): Int = bits(1)
  }

  /** Canonical prefix code over `lengths` (increasing length, then
    * symbol order; first-read bit = MSB of the code). A code with
    * exactly ONE used symbol reads zero bits (the simple-code
    * degenerate the spec allows). Over/under-subscribed codes abort.
    */
  private final class Huff(lengths: Array[Int]) {
    private var single = -1
    // binary tree in arrays; node 0 is the root, -sym-1 marks a leaf
    private var left: Array[Int] = null
    private var right: Array[Int] = null
    locally {
      val used = lengths.zipWithIndex.filter(_._1 > 0)
      if (used.isEmpty) throw WebpAbort("webp: empty prefix code")
      if (used.length == 1) single = used(0)._2
      else {
        var kraft = 0.0
        used.foreach { case (l, _) =>
          if (l > 15) throw WebpAbort(s"webp: code length $l > 15")
          kraft += 1.0 / (1L << l)
        }
        if (math.abs(kraft - 1.0) > 1e-12)
          throw WebpAbort("webp: prefix code not complete")
        val maxNodes = 2 * used.length + 16
        left = Array.fill(maxNodes)(0)
        right = Array.fill(maxNodes)(0)
        var nextNode = 1
        // canonical code assignment: sort by (length, symbol)
        var code = 0
        var prevLen = 0
        used.sortBy { case (l, s) => (l, s) }.foreach { case (l, sym) =>
          code <<= (l - prevLen)
          prevLen = l
          // walk MSB-first, creating nodes
          var node = 0
          var i = l - 1
          while (i >= 0) {
            val b = (code >> i) & 1
            if (i == 0) {
              if (b == 0) left(node) = -sym - 1 else right(node) = -sym - 1
            } else {
              val nxt = if (b == 0) left(node) else right(node)
              val child =
                if (nxt > 0) nxt
                else {
                  val c = nextNode
                  nextNode += 1
                  if (b == 0) left(node) = c else right(node) = c
                  c
                }
              node = child
            }
            i -= 1
          }
          code += 1
        }
      }
    }
    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val nxt = if (br.bit() == 0) left(node) else right(node)
        if (nxt < 0) return -nxt - 1
        if (nxt == 0) throw WebpAbort("webp: invalid prefix code walk")
        node = nxt
      }
      -1 // unreachable
    }
  }

  /** One prefix code: simple (1 bit flag set) or normal via the
    * code-length code with 16/17/18 repeats and max_symbol.
    */
  private def readCode(br: BitReader, alphabetSize: Int): Huff = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) { // simple
      val numSyms = br.bit() + 1
      val first = if (br.bit() == 1) br.bits(8) else br.bits(1)
      if (first >= alphabetSize) throw WebpAbort("webp: simple-code symbol out of range")
      if (numSyms == 2) {
        val second = br.bits(8)
        if (second >= alphabetSize) throw WebpAbort("webp: simple-code symbol out of range")
        lengths(first) = 1
        lengths(second) = 1
      } else lengths(first) = 1
      new Huff(lengths)
    } else {
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = new Huff(clLens)
      var maxTokens =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabetSize
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize && maxTokens > 0) {
        maxTokens -= 1
        val cl = clTree.read(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prevLen = cl
        } else {
          val (rep, fill) = cl match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case 18 => (11 + br.bits(7), 0)
            case _ => throw WebpAbort(s"webp: bad code-length symbol $cl")
          }
          if (sym + rep > alphabetSize)
            throw WebpAbort("webp: code-length repeat overruns alphabet")
          var r = 0
          while (r < rep) { lengths(sym) = fill; sym += 1; r += 1 }
        }
      }
      new Huff(lengths)
    }
  }

  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** Decode the first VP8L image to (stats, aHash grid grays). */
  def decode(d: Array[Byte]): Either[String, (ImageStats, Array[Int])] = {
    if (!sniff(d)) return Left("webp: missing RIFF/WEBP signature")
    try decodeInner(d)
    catch {
      case WebpAbort(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("webp: truncated payload")
    }
  }

  private def decodeInner(d: Array[Byte]): Either[String, (ImageStats, Array[Int])] = {
    def u32le(o: Int): Long =
      (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)
    // RIFF chunk walk to VP8L
    var pos = 12
    var payload = -1
    var payloadEnd = -1
    while (payload < 0 && pos + 8 <= d.length) {
      val fourcc = new String(d, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32le(pos + 4)
      if (size > d.length) return Left("webp: chunk size overruns file")
      fourcc match {
        case "VP8L" =>
          payload = pos + 8
          payloadEnd = math.min(d.length, pos + 8 + size.toInt)
        case "VP8 " =>
          return Left("webp: lossy VP8 out of scope — VP8L lossless only")
        case "VP8X" =>
          return Left("webp: extended VP8X container out of scope (animation/metadata)")
        case _ =>
          pos += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
      }
    }
    if (payload < 0) return Left("webp: no VP8L chunk found")
    if ((d(payload) & 0xff) != 0x2f) return Left("webp: bad VP8L signature byte")
    val br = new BitReader(d, payload + 1, payloadEnd)
    val width = br.bits(14) + 1
    val height = br.bits(14) + 1
    br.bit() // alpha hint — informational
    val version = br.bits(3)
    if (version != 0) return Left(s"webp: VP8L version $version not supported")
    val nPx = width.toLong * height
    if (nPx > (1L << 26))
      return Left("webp: raster too large for LZ77 buffering")

    // transforms (level 0): subtract-green only
    var subtractGreen = false
    while (br.bit() == 1) {
      br.bits(2) match {
        case 2 => subtractGreen = true
        case 0 => return Left("webp: predictor transform out of scope")
        case 1 => return Left("webp: cross-color transform out of scope")
        case 3 => return Left("webp: color-indexing (palette) transform out of scope")
        case t => return Left(s"webp: unknown transform $t")
      }
    }

    // color cache
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    if (cacheBits > 11) return Left(s"webp: bad color-cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    // meta prefix codes
    if (br.bit() == 1) return Left("webp: meta prefix codes (entropy image) out of scope")

    val greenTree = readCode(br, 256 + 24 + cacheSize)
    val redTree = readCode(br, 256)
    val blueTree = readCode(br, 256)
    val alphaTree = readCode(br, 256)
    val distTree = readCode(br, 40)

    val px = new Array[Int](nPx.toInt) // ARGB
    def insertCache(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var i = 0
    while (i < nPx) {
      val g = greenTree.read(br)
      if (g < 256) {
        val r = redTree.read(br)
        val b = blueTree.read(br)
        val a = alphaTree.read(br)
        val argb = (a << 24) | (r << 16) | (g << 8) | b
        px(i) = argb
        insertCache(argb)
        i += 1
      } else if (g < 256 + 24) {
        val len = prefixValue(g - 256, br)
        val distCode = prefixValue(distTree.read(br), br)
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistMap(distCode - 1)
            dy * width + dx
          }
        val dist = math.max(1, dist0)
        if (dist > i) throw WebpAbort("webp: LZ77 distance before image start")
        if (i + len > nPx) throw WebpAbort("webp: LZ77 run overruns raster")
        var k = 0
        while (k < len) {
          px(i) = px(i - dist)
          insertCache(px(i))
          i += 1
          k += 1
        }
      } else {
        if (cache == null) throw WebpAbort("webp: cache reference without a color cache")
        val argb = cache(g - 256 - 24)
        px(i) = argb
        // spec: cache hits re-insert (a no-op on the same slot)
        insertCache(argb)
        i += 1
      }
    }

    // stats + aHash grid over the (inverse-transformed) raster; alpha
    // excluded (channels = 3, the rgba.png rule)
    var sr = 0L
    var sg = 0L
    var sb = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    i = 0
    while (i < nPx) {
      val v = px(i)
      val g = (v >>> 8) & 0xff
      var r = (v >>> 16) & 0xff
      var b = v & 0xff
      if (subtractGreen) { r = (r + g) & 0xff; b = (b + g) & 0xff }
      sr += r; sg += g; sb += b
      val lo = math.min(g, math.min(r, b))
      val hi = math.max(g, math.max(r, b))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      i += 1
    }
    val grays = new Array[Int](64)
    var gi = 0
    while (gi < 64) {
      val y = (gi / 8) * height / 8
      val x = (gi % 8) * width / 8
      val v = px(y * width + x)
      val g = (v >>> 8) & 0xff
      var r = (v >>> 16) & 0xff
      var b = v & 0xff
      if (subtractGreen) { r = (r + g) & 0xff; b = (b + g) & 0xff }
      grays(gi) = r + g + b
      gi += 1
    }
    Right((ImageStats("webp", width, height, 3, 255, nPx,
      sr.toDouble / nPx, sg.toDouble / nPx, sb.toDouble / nPx, mn, mx),
      grays))
  }

  // ------------------------------------------------------------ encode

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(1 << 12)
    private var acc = 0L
    private var n = 0
    def put(v: Int, k: Int): Unit = {
      acc |= (v.toLong & ((1L << k) - 1)) << n
      n += k
      while (n >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        n -= 8
      }
    }
    /** A canonical prefix code: first-WRITTEN bit is the code's MSB. */
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write((acc & 0xff).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** A FLAT 8-bit canonical code over symbols 0..255 (code == symbol),
    * transmitted through the real normal-code path: CL code {8->0,
    * 16->1} at one bit each, max_symbol = 44 tokens, one literal "8"
    * then 43 repeat-previous tokens. Complete (256 x 2^-8 = 1) with
    * any trailing alphabet symbols at length 0.
    */
  private def writeFlat8(bw: BitWriter): Unit = {
    bw.put(0, 1) // normal code
    bw.put(15, 4) // num_code_lengths - 4 = 15 -> all 19 slots
    var i = 0
    while (i < 19) {
      val len = if (ClOrder(i) == 8 || ClOrder(i) == 16) 1 else 0
      bw.put(len, 3)
      i += 1
    }
    bw.put(1, 1) // use max_symbol
    bw.put(3, 3) // length_nbits = 2 + 2*3 = 8
    bw.put(42, 8) // max tokens = 2 + 42 = 44
    // canonical CL code: symbol 8 -> 0, symbol 16 -> 1
    bw.putCode(0, 1) // literal length 8 (symbol 0 of the run)
    var reps = 0
    while (reps < 42) { bw.putCode(1, 1); bw.put(3, 2); reps += 1 } // 42 x repeat-6
    bw.putCode(1, 1); bw.put(0, 2) // + repeat-3 -> 1 + 252 + 3 = 256 symbols
  }

  /** A 0-bit single-symbol simple code. */
  private def writeSingle(bw: BitWriter, sym: Int): Unit = {
    bw.put(1, 1) // simple
    bw.put(0, 1) // one symbol
    if (sym < 2) { bw.put(0, 1); bw.put(sym, 1) }
    else { bw.put(1, 1); bw.put(sym, 8) }
  }

  /** Lossless VP8L encode of an 8-bit RGB raster — literal-only (24
    * bits/px), no transforms, no cache, flat green/red/blue codes,
    * 0-bit alpha(255)/distance trees. The fixture/adapter substrate;
    * byte-exact round trip by construction.
    */
  def encodeWebpLossless(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384,
      s"encodeWebpLossless: bad dimensions ${w}x$h")
    require(rgb.length == 3 * w * h,
      s"encodeWebpLossless: raster length ${rgb.length} != 3*$w*$h")
    val bw = new BitWriter
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1) // no alpha
    bw.put(0, 3) // version 0
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix codes
    writeFlat8(bw) // green (alphabet 280; lengths beyond 255 are 0)
    writeFlat8(bw) // red
    writeFlat8(bw) // blue
    writeSingle(bw, 255) // alpha
    writeSingle(bw, 0) // distance (unused)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      // flat-8 canonical code: code == symbol, written MSB-first
      bw.putCode(g, 8)
      bw.putCode(r, 8)
      bw.putCode(b, 8)
      // alpha/distance trees are 0-bit
      i += 1
    }
    val payload = Array[Byte](0x2f) ++ bw.toBytes
    val out = new java.io.ByteArrayOutputStream(payload.length + 24)
    def ascii(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = payload.length + (payload.length & 1)
    ascii("RIFF")
    u32le(4 + 8 + padded)
    ascii("WEBP")
    ascii("VP8L")
    u32le(payload.length)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
