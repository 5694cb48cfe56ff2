package graft.operators

/** Baseline TIFF decode — the scanned-document image format (faxes,
  * archival scans, the raster sibling of the PDF path), dependency-
  * free like its codec siblings. Implements TIFF 6.0 baseline plus
  * the LZW extension.
  *
  * IN scope:
  *  - both byte orders (II little-endian, MM big-endian), IFD entry
  *    walk with inline-vs-offset value resolution (SHORT and LONG
  *    types; inline values are left-justified per spec §2)
  *  - 8-bit samples, 1 (gray) or 3 (RGB) samples per pixel, chunky
  *    planar config; PhotometricInterpretation 0 (WhiteIsZero —
  *    samples inverted for stats), 1, and 2
  *  - multi-strip rasters (RowsPerStrip + StripOffsets/ByteCounts,
  *    partial last strip), decoded strip by strip in O(strip) memory
  *  - Compression 1 (none), 32773 (PackBits), and 5 (TIFF LZW —
  *    MSB-first with EARLY CHANGE, the exact algorithm PDF's
  *    /LZWDecode borrowed, so the decoder is shared with
  *    [[graft.sources.Pdf]]); Predictor 2 (horizontal differencing)
  *
  * OUT of scope (named Lefts): other bit depths, planar config 2,
  * palette color (photometric 3), CCITT/JPEG-in-TIFF compressions,
  * tiled TIFFs, and multi-page files beyond the FIRST IFD (the GIF
  * first-frame rule: census stats want one raster).
  *
  * Malformed input is a Left, never an exception. The independent
  * python fixture (scripts/gen_tiff_fixture.py) pins the decoder.
  */
object TiffCodec {

  import ImageCodec.ImageStats

  def sniff(d: Array[Byte]): Boolean =
    d.length >= 8 && (
      (d(0) == 'I' && d(1) == 'I' && d(2) == 42 && d(3) == 0) ||
        (d(0) == 'M' && d(1) == 'M' && d(2) == 0 && d(3) == 42))

  private final case class Abort(msg: String) extends RuntimeException(msg)

  def decode(d: Array[Byte]): Either[String, (ImageStats, Array[Int])] = {
    if (!sniff(d)) return Left("tiff: missing II*/MM* signature")
    try decodeInner(d)
    catch {
      case Abort(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("tiff: truncated payload")
      case _: NegativeArraySizeException => Left("tiff: negative size field")
    }
  }

  private def decodeInner(d: Array[Byte]): Either[String, (ImageStats, Array[Int])] = {
    val le = d(0) == 'I'
    def u16(o: Int): Int =
      if (le) (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
      else ((d(o) & 0xff) << 8) | (d(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (d(o) & 0xffL) | ((d(o + 1) & 0xffL) << 8) |
        ((d(o + 2) & 0xffL) << 16) | ((d(o + 3) & 0xffL) << 24)
      else ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)

    val ifd = u32(4).toInt
    val n = u16(ifd)
    // tag -> (fieldType, count, entry offset of the value cell)
    var entries = Map.empty[Int, (Int, Int, Int)]
    var k = 0
    while (k < n) {
      val e = ifd + 2 + 12 * k
      entries += u16(e) -> ((u16(e + 2), u32(e + 4).toInt, e + 8))
      k += 1
    }
    def vals(tag: Int): Option[Seq[Long]] = entries.get(tag).map { case (tpe, count, cell) =>
      val unit = tpe match {
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case 1 => 1 // BYTE
        case t => throw Abort(s"tiff: unsupported field type $t for tag $tag")
      }
      val base = if (unit * count <= 4) cell else u32(cell).toInt
      (0 until count).map { i =>
        unit match {
          case 1 => (d(base + i) & 0xff).toLong
          case 2 => u16(base + 2 * i).toLong
          case _ => u32(base + 4 * i)
        }
      }
    }
    def one(tag: Int, default: => Long): Long =
      vals(tag).map(_.head).getOrElse(default)

    val w = one(256, throw Abort("tiff: no ImageWidth")).toInt
    val h = one(257, throw Abort("tiff: no ImageLength")).toInt
    if (w <= 0 || h <= 0) return Left(s"tiff: bad dimensions ${w}x$h")
    val spp = one(277, 1L).toInt
    if (spp != 1 && spp != 3) return Left(s"tiff: $spp samples/pixel out of scope")
    val bps = vals(258).getOrElse(Seq.fill(spp)(1L))
    if (vals(258).isDefined && bps.exists(_ != 8L))
      return Left("tiff: only 8-bit samples are in scope")
    if (vals(258).isEmpty) return Left("tiff: no BitsPerSample")
    val compression = one(259, 1L).toInt
    if (compression != 1 && compression != 5 && compression != 32773)
      return Left(s"tiff: compression $compression out of scope")
    val photometric = one(262, 1L).toInt
    if (photometric > 2 || (photometric == 2) != (spp == 3))
      return Left(s"tiff: photometric $photometric with $spp samples out of scope")
    if (one(284, 1L) != 1L) return Left("tiff: planar configuration 2 out of scope")
    val predictor = one(317, 1L).toInt
    if (predictor != 1 && predictor != 2)
      return Left(s"tiff: predictor $predictor out of scope")
    val rowsPerStrip = math.min(one(278, h.toLong), h.toLong).toInt
    // RowsPerStrip = 0 (or a negative LONG read as Int) would divide by
    // zero below — ArithmeticException is not in decode()'s catch list,
    // so it must be a Left here, not a throw
    if (rowsPerStrip <= 0) return Left(s"tiff: RowsPerStrip $rowsPerStrip out of range")
    val offsets = vals(273).getOrElse(throw Abort("tiff: no StripOffsets"))
    val counts = vals(279).getOrElse(throw Abort("tiff: no StripByteCounts"))
    if (offsets.length != counts.length) return Left("tiff: ragged strip tables")
    val expectStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    if (offsets.length != expectStrips)
      return Left(s"tiff: ${offsets.length} strips for $expectStrips expected")

    val rowBytes = w * spp
    val gridX = Array.tabulate(64)(g => (g % 8) * w / 8)
    val gridY = Array.tabulate(64)(g => (g / 8) * h / 8)
    val grays = new Array[Int](64)
    val sums = new Array[Long](3)
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var y = 0

    for (s <- offsets.indices) {
      val off = offsets(s).toInt
      val len = counts(s).toInt
      if (off + len > d.length) throw Abort("tiff: strip runs past EOF")
      val raw = java.util.Arrays.copyOfRange(d, off, off + len)
      val rowsHere = math.min(rowsPerStrip, h - y)
      val strip = compression match {
        case 1 => raw
        case 32773 => packBitsDecode(raw, rowsHere * rowBytes)
        case _ => graft.sources.Pdf.lzwDecode(raw)
          .getOrElse(throw Abort("tiff: malformed LZW strip"))
      }
      if (strip.length != rowsHere * rowBytes)
        throw Abort(s"tiff: strip $s decoded ${strip.length} of ${rowsHere * rowBytes} bytes")
      var r = 0
      while (r < rowsHere) {
        val base = r * rowBytes
        if (predictor == 2) { // horizontal differencing, per channel
          var x = spp
          while (x < rowBytes) {
            strip(base + x) = (strip(base + x) + strip(base + x - spp)).toByte
            x += 1
          }
        }
        var x = 0
        while (x < rowBytes) {
          val raw0 = strip(base + x) & 0xff
          val v = if (photometric == 0) 255 - raw0 else raw0
          sums(x % spp % 3) += v
          if (spp == 1) { sums(1) += 0; sums(2) += 0 } // gray: single channel
          if (v < mn) mn = v
          if (v > mx) mx = v
          x += 1
        }
        var g = 0
        while (g < 64) {
          if (gridY(g) == y) {
            val px = base + gridX(g) * spp
            grays(g) =
              if (spp == 1) {
                val v = if (photometric == 0) 255 - (strip(px) & 0xff) else strip(px) & 0xff
                3 * v
              } else {
                def ch(i: Int) = {
                  val rv = strip(px + i) & 0xff
                  if (photometric == 0) 255 - rv else rv
                }
                ch(0) + ch(1) + ch(2)
              }
          }
          g += 1
        }
        y += 1
        r += 1
      }
    }
    val nPx = w.toLong * h
    val stats =
      if (spp == 1) {
        val m = sums(0).toDouble / nPx
        ImageStats("tiff", w, h, 1, 255, nPx, m, m, m, mn, mx)
      } else ImageStats("tiff", w, h, 3, 255, nPx,
        sums(0).toDouble / nPx, sums(1).toDouble / nPx, sums(2).toDouble / nPx, mn, mx)
    Right((stats, grays))
  }

  /** PackBits (Apple/TIFF §9): control n in 0..127 copies n+1
    * literals; 129..255 repeats the next byte 257-n times; 128 is a
    * no-op.
    */
  private def packBitsDecode(src: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = 0
    var o = 0
    while (o < expect) {
      if (i >= src.length) throw Abort("tiff: truncated PackBits strip")
      val n = src(i) & 0xff
      i += 1
      if (n < 128) {
        var k = 0
        while (k <= n) {
          if (o >= expect) throw Abort("tiff: PackBits overrun")
          out(o) = src(i); i += 1; o += 1; k += 1
        }
      } else if (n > 128) {
        val rep = 257 - n
        val b = src(i)
        i += 1
        var k = 0
        while (k < rep) {
          if (o >= expect) throw Abort("tiff: PackBits overrun")
          out(o) = b; o += 1; k += 1
        }
      } // 128: no-op
    }
    out
  }

  private def packBitsEncode(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(row.length + 8)
    var i = 0
    while (i < row.length) {
      // find a run of >= 3 equal bytes
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128) run += 1
      if (run >= 3) {
        out.write(257 - run)
        out.write(row(i))
        i += run
      } else {
        // literal stretch up to the next >= 3 run (or 128 bytes)
        var j = i
        var lit = 0
        var done = false
        while (!done && j < row.length && lit < 128) {
          var r = 1
          while (j + r < row.length && row(j + r) == row(j) && r < 3) r += 1
          if (r >= 3) done = true
          else { j += 1; lit += 1 }
        }
        out.write(lit - 1)
        out.write(row, i, lit)
        i = j
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ encode

  /** Deterministic baseline-TIFF encoder — the `Media.toTiff`
    * adapter/fixture substrate: chunky 8-bit gray or RGB, either byte
    * order, multi-strip, Compression 1/5/32773 with optional
    * horizontal differencing on LZW. IFD tags emitted in ascending
    * order per spec.
    */
  def encodeTiff(
      pixels: Array[Byte], w: Int, h: Int, spp: Int,
      compression: Int = 1, predictor: Int = 1,
      rowsPerStrip: Int = 2, littleEndian: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0, s"encodeTiff: bad dimensions ${w}x$h")
    require(spp == 1 || spp == 3, s"encodeTiff: bad samples/pixel $spp")
    require(pixels.length == w * h * spp, "encodeTiff: raster length mismatch")
    require(Set(1, 5, 32773).contains(compression), s"encodeTiff: compression $compression")
    require(predictor == 1 || (predictor == 2 && compression == 5),
      "encodeTiff: predictor 2 only with LZW")

    val rowBytes = w * spp
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val raw = java.util.Arrays.copyOfRange(
        pixels, s * rowsPerStrip * rowBytes, (s * rowsPerStrip + rows) * rowBytes)
      if (predictor == 2) {
        var r = 0
        while (r < rows) {
          var x = rowBytes - 1
          while (x >= spp) {
            raw(r * rowBytes + x) = (raw(r * rowBytes + x) - raw(r * rowBytes + x - spp)).toByte
            x -= 1
          }
          r += 1
        }
      }
      compression match {
        case 1 => raw
        case 32773 =>
          // PackBits restarts per ROW per spec
          val o = new java.io.ByteArrayOutputStream()
          var r = 0
          while (r < rows) {
            o.write(packBitsEncode(java.util.Arrays.copyOfRange(
              raw, r * rowBytes, (r + 1) * rowBytes)))
            r += 1
          }
          o.toByteArray
        case _ => graft.sources.Pdf.lzwEncode(raw)
      }
    }

    val out = new java.io.ByteArrayOutputStream(pixels.length + 512)
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (littleEndian) { b(v); b(v >> 8) } else { b(v >> 8); b(v) }
    def w32(v: Long): Unit =
      if (littleEndian) { b(v.toInt); b((v >> 8).toInt); b((v >> 16).toInt); b((v >> 24).toInt) }
      else { b((v >> 24).toInt); b((v >> 16).toInt); b((v >> 8).toInt); b(v.toInt) }

    if (littleEndian) { b('I'); b('I'); b(42); b(0) } else { b('M'); b('M'); b(0); b(42) }
    // layout: header(8) | strip data | [strip tables] | IFD
    val dataStart = 8
    val stripOffs = strips.scanLeft(dataStart)(_ + _.length).init
    val afterData = dataStart + strips.map(_.length).sum
    // out-of-line arrays (when > 1 strip): offsets then counts then bps
    val needTables = nStrips > 1
    val offTable = afterData
    val cntTable = offTable + (if (needTables) 4 * nStrips else 0)
    val bpsTable = cntTable + (if (needTables) 4 * nStrips else 0)
    val ifdStart = bpsTable + (if (spp == 3) 6 else 0)
    w32(ifdStart.toLong)
    strips.foreach(out.write)
    if (needTables) {
      stripOffs.foreach(o => w32(o.toLong))
      strips.foreach(s => w32(s.length.toLong))
    }
    if (spp == 3) { w16(8); w16(8); w16(8) }

    case class Entry(tag: Int, tpe: Int, count: Int, value: Long)
    val entries = Seq(
      Entry(256, 4, 1, w.toLong),
      Entry(257, 4, 1, h.toLong),
      if (spp == 3) Entry(258, 3, 3, bpsTable.toLong) else Entry(258, 3, 1, 8L),
      Entry(259, 3, 1, compression.toLong),
      Entry(262, 3, 1, if (spp == 3) 2L else 1L),
      if (needTables) Entry(273, 4, nStrips, offTable.toLong)
      else Entry(273, 4, 1, stripOffs.head.toLong),
      Entry(277, 3, 1, spp.toLong),
      Entry(278, 4, 1, rowsPerStrip.toLong),
      if (needTables) Entry(279, 4, nStrips, cntTable.toLong)
      else Entry(279, 4, 1, strips.head.length.toLong)) ++
      (if (predictor == 2) Seq(Entry(317, 3, 1, 2L)) else Nil)

    w16(entries.length)
    entries.foreach { e =>
      w16(e.tag); w16(e.tpe); w32(e.count.toLong)
      if (e.tpe == 3 && e.count == 1) {
        // SHORT inline: left-justified in the 4-byte cell
        w16(e.value.toInt); w16(0)
      } else w32(e.value)
    }
    w32(0L) // no next IFD
    out.toByteArray
  }
}
