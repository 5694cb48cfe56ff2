package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: exact flat-tile round trips (the q227 oracle
  * lever — DC-only blocks with unit quantization are mathematically
  * invertible), tolerance-gated round trips for general rasters (the
  * AC/Huffman path), the restart-marker and padding paths, and the
  * malformed-input discipline (Left, never a throw). The committed
  * python-encoded fixtures pin the decoder against an independent
  * implementation in ImageCodecSpec.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def seededBytes(n: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  /** Expand flat 8x8-or-16x16 tiles to a raster: tile (tx, ty) of a
    * tw x th grid carries value vals(ty*tw + tx).
    */
  private def tiles(vals: Array[Byte], tw: Int, th: Int, tile: Int): Array[Byte] = {
    val w = tw * tile
    Array.tabulate(w * th * tile) { k =>
      val x = k % w
      val y = k / w
      vals((y / tile) * tw + x / tile)
    }
  }

  test("flat-tile GRAYSCALE round trip is bit-exact (unit quant, DC-only blocks)") {
    for ((tw, th, seed) <- Seq((1, 1, 1), (3, 2, 2), (4, 4, 3))) {
      val vals = seededBytes(tw * th, seed)
      val raster = tiles(vals, tw, th, 8)
      val jpg = JpegCodec.encodeJpegGray(raster, 8 * tw, 8 * th)
      val s = ImageCodec.decode(jpg).toOption.get
      assert(s.codec === "jpeg")
      assert((s.width, s.height, s.channels, s.maxval) === ((8 * tw, 8 * th, 1, 255)))
      val n = raster.length
      assert(s.nPixels === n.toLong)
      // every tile is DC-only: decode must reproduce the bytes exactly
      assert(s.rMean === raster.map(b => (b & 0xff).toLong).sum.toDouble / n, s"seed $seed")
      assert(s.pxMin === raster.map(_ & 0xff).min && s.pxMax === raster.map(_ & 0xff).max)
    }
  }

  test("flat-16x16-tile gray COLOR 4:2:0 round trip is bit-exact") {
    for ((tw, th, seed) <- Seq((1, 1, 5), (3, 2, 6), (2, 4, 7))) {
      val vals = seededBytes(tw * th, seed)
      val gray = tiles(vals, tw, th, 16)
      val rgb = gray.flatMap(v => Array(v, v, v))
      val jpg = JpegCodec.encodeJpeg(rgb, 16 * tw, 16 * th, subsample = true)
      val s = ImageCodec.decode(jpg).toOption.get
      assert((s.width, s.height, s.channels) === ((16 * tw, 16 * th, 3)))
      val n = gray.length
      val mean = gray.map(b => (b & 0xff).toLong).sum.toDouble / n
      // r=g=b=v tiles: Y=v, Cb=Cr=128 exactly; the 2x2 chroma average
      // of a flat 16x16 tile is flat — all three channels recover v
      assert((s.rMean, s.gMean, s.bMean) === ((mean, mean, mean)), s"seed $seed")
      assert(s.pxMin === gray.map(_ & 0xff).min && s.pxMax === gray.map(_ & 0xff).max)
    }
  }

  test("general-raster 4:4:4 and 4:2:0 round trips land within unit-quant tolerance") {
    for ((w, h, seed) <- Seq((8, 8, 11), (24, 16, 12), (17, 9, 13))) {
      val rgb = seededBytes(3 * w * h, seed)
      def chMean(c: Int) =
        (0 until w * h).map(i => rgb(3 * i + c) & 0xff).sum.toDouble / (w * h)
      for (sub <- Seq(false, true)) {
        val s = ImageCodec.decode(JpegCodec.encodeJpeg(rgb, w, h, sub)).toOption.get
        assert((s.width, s.height, s.channels, s.nPixels) ===
          ((w, h, 3, (w.toLong * h))), s"seed $seed sub=$sub")
        // unit quantization: DCT round-trip error is a few counts per
        // sample; random-noise chroma subsampling moves means more
        val tol = if (sub) 6.0 else 2.0
        for (c <- 0 until 3)
          assert(math.abs(Seq(s.rMean, s.gMean, s.bMean)(c) - chMean(c)) <= tol,
            s"seed $seed sub=$sub ch=$c: ${Seq(s.rMean, s.gMean, s.bMean)(c)} vs ${chMean(c)}")
      }
    }
  }

  test("non-multiple-of-MCU sizes: padding encodes, decode trims to the true frame") {
    for ((w, h) <- Seq((1, 1), (7, 5), (9, 17), (15, 15))) {
      val gray = seededBytes(w * h, w * 31 + h)
      val s = ImageCodec.decode(JpegCodec.encodeJpegGray(gray, w, h)).toOption.get
      assert((s.width, s.height, s.nPixels) === ((w, h, (w.toLong * h))))
      // flat-DC exactness does not apply (blocks straddle content and
      // pad), but the pad must not leak into stats: min/max stay in
      // the neighborhood of the true range
      assert(s.pxMin >= 0 && s.pxMax <= 255)
    }
    // and a flat padded image IS exact: pad replicates the edge value
    val flat = Array.fill(13 * 5)(77.toByte)
    val s = ImageCodec.decode(JpegCodec.encodeJpegGray(flat, 13, 5)).toOption.get
    assert((s.rMean, s.pxMin, s.pxMax) === ((77.0, 77, 77)))
  }

  test("restart markers: DRI + RSTn decode to the same pixels as the unrestarted stream") {
    val vals = seededBytes(5 * 3, 21)
    val raster = tiles(vals, 5, 3, 8)
    val plain = ImageCodec.decode(JpegCodec.encodeJpegGray(raster, 40, 24)).toOption.get
    for (ri <- Seq(1, 2, 7)) {
      val rst = ImageCodec.decode(
        JpegCodec.encodeJpegGray(raster, 40, 24, restartInterval = ri)).toOption.get
      assert(rst === plain, s"restartInterval $ri")
    }
  }

  test("aHash: a JPEG re-encode of a PPM raster pairs with the original at low hamming") {
    for ((w, h, seed) <- Seq((8, 8, 41), (16, 12, 42), (24, 18, 43))) {
      val rgb = seededBytes(3 * w * h, seed)
      val ppm = (s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
      val (hiP, loP) = ImageCodec.aHash(ppm).toOption.get
      val (hiJ, loJ) = ImageCodec.aHash(
        JpegCodec.encodeJpeg(rgb, w, h, subsample = false)).toOption.get
      val hamming = java.lang.Long.bitCount(hiP ^ hiJ) + java.lang.Long.bitCount(loP ^ loJ)
      assert(hamming <= 7, s"seed $seed: hamming $hamming — re-encode would not pair")
    }
  }

  test("PROGRESSIVE decode ≡ baseline decode, bit-exactly (successive approximation is lossless)") {
    // the scan script transmits every coefficient bit (DC Al=1 +
    // refine; AC bands at Al=2 + two refinement passes), so the
    // reconstructed coefficients equal the baseline-encoded ones —
    // stats AND aHash must match exactly on ANY raster
    for ((w, h, seed) <- Seq((8, 8, 61), (17, 9, 62), (24, 16, 63), (5, 30, 64))) {
      val rgb = seededBytes(3 * w * h, seed)
      for (sub <- Seq(false, true)) {
        val base = ImageCodec.decode(JpegCodec.encodeJpeg(rgb, w, h, sub)).toOption.get
        val prog = JpegCodec.encodeJpegProgressive(rgb, w, h, sub)
        val got = ImageCodec.decode(prog).toOption.get
        assert(got === base, s"seed $seed sub=$sub")
        assert(ImageCodec.aHash(prog).toOption.get ===
          ImageCodec.aHash(JpegCodec.encodeJpeg(rgb, w, h, sub)).toOption.get,
          s"seed $seed sub=$sub aHash")
      }
      val gray = seededBytes(w * h, seed + 100)
      val baseG = ImageCodec.decode(JpegCodec.encodeJpegGray(gray, w, h)).toOption.get
      val progG = ImageCodec.decode(
        JpegCodec.encodeJpegProgressiveGray(gray, w, h)).toOption.get
      assert(progG === baseG, s"seed $seed gray")
    }
  }

  test("progressive flat tiles stay bit-exact end-to-end (the q229 oracle lever)") {
    val vals = seededBytes(3 * 2, 71)
    val gray = tiles(vals, 3, 2, 8)
    val s = ImageCodec.decode(
      JpegCodec.encodeJpegProgressiveGray(gray, 24, 16)).toOption.get
    val n = gray.length
    assert(s.rMean === gray.map(b => (b & 0xff).toLong).sum.toDouble / n)
    assert((s.pxMin, s.pxMax) === ((gray.map(_ & 0xff).min, gray.map(_ & 0xff).max)))
    val rgb16 = tiles(vals, 3, 2, 16).flatMap(v => Array(v, v, v))
    val c = ImageCodec.decode(
      JpegCodec.encodeJpegProgressive(rgb16, 48, 32, subsample = true)).toOption.get
    val mean = vals.map(b => (b & 0xff).toLong).sum.toDouble / vals.length
    assert((c.rMean, c.gMean, c.bMean) === ((mean, mean, mean)))
  }

  test("progressive mutations never throw (bit flips + truncations)") {
    val good = JpegCodec.encodeJpegProgressive(seededBytes(3 * 24 * 16, 81), 24, 16,
      subsample = true)
    val rnd = new scala.util.Random(82)
    for (_ <- 0 until 300) {
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      JpegCodec.decode(b) // Left or Right, must not throw
    }
    for (cut <- 0 until good.length by 11)
      JpegCodec.decode(good.take(cut))
  }

  test("out-of-scope and malformed payloads are Left(reason), never an exception") {
    // progressive: SOF2 in place of SOF0
    val good = JpegCodec.encodeJpegGray(Array.fill(64)(10.toByte), 8, 8)
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    // a baseline stream mislabeled SOF2: its full-band interleaved
    // scan violates the progressive scan rules -> Left, not garbage
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isLeft)
    // genuinely unsupported frame type (lossless SOF3)
    val lossless = good.clone(); lossless(sofAt + 1) = 0xc3.toByte
    assert(JpegCodec.decode(lossless).left.exists(_.contains("not supported")))
    // structural truncations parse as Left, never throw
    for (cut <- Seq(2, 3, 10, sofAt + 3))
      assert(ImageCodec.decode(good.take(cut)).isLeft, s"cut $cut")
    // tail truncations (losing only EOI/padding may still decode —
    // real crawls carry EOI-less files): must never throw
    for (cut <- Seq(good.length - 3, good.length - 1))
      ImageCodec.decode(good.take(cut))
    // not a JPEG at all
    assert(JpegCodec.decode("hello".getBytes).left.exists(_.contains("SOI")))
    // bit flips anywhere must never throw (the CodecPropertySpec rule)
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 200) {
      val b = good.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      JpegCodec.decode(b) // Left or Right, must not throw
    }
  }

  test("EXIF orientation: all 8 stored transforms normalize to the upright aHash grid (hamming 0)") {
    // 64x64 gray raster of flat 8x8 tiles: grid cells == tiles, so the
    // dihedral grid remap is EXACT and rotated re-encodes of the same
    // image must pair at hamming 0
    val vals = seededBytes(64, 21)
    def at(y: Int, x: Int): Byte = vals((y / 8) * 8 + (x / 8))
    val base = Array.tabulate(64 * 64)(k => at(k / 64, k % 64))
    val (baseStats, baseGrid) =
      JpegCodec.decode(JpegCodec.encodeJpegGray(base, 64, 64)).toOption.get
    assert(baseStats.orientation === 1)
    // the stored raster whose DISPLAY transform (per EXIF value o)
    // reproduces base: the physical inverse of each display op
    def stored(o: Int): Array[Byte] = Array.tabulate(64 * 64) { k =>
      val y = k / 64
      val x = k % 64
      val (by, bx) = o match {
        case 2 => (y, 63 - x) // mirror H (self-inverse)
        case 3 => (63 - y, 63 - x) // rot 180
        case 4 => (63 - y, x) // mirror V
        case 5 => (x, y) // transpose
        case 6 => (x, 63 - y) // stored = rotCCW(base)
        case 7 => (63 - x, 63 - y) // transverse
        case 8 => (63 - x, y) // stored = rotCW(base)
        case _ => (y, x)
      }
      at(by, bx)
    }
    for (o <- 2 to 8) {
      val jpg = JpegCodec.withExifOrientation(
        JpegCodec.encodeJpegGray(stored(o), 64, 64), o)
      val (st, grid) = JpegCodec.decode(jpg).toOption.get
      assert(st.orientation === o)
      assert(grid.toSeq === baseGrid.toSeq, s"orientation $o grid")
      // pixel stats are rotation-invariant
      assert(st.nPixels === baseStats.nPixels && st.rMean === baseStats.rMean)
    }
  }

  test("EXIF parse: big-endian TIFF accepted; garbled APP1 keeps orientation 1, never aborts") {
    val jpg = JpegCodec.encodeJpegGray(Array.fill(64)(55.toByte), 8, 8)
    // hand-built MM (big-endian) Exif APP1 with orientation 3
    val tiff = Array[Byte](
      'E'.toByte, 'x'.toByte, 'i'.toByte, 'f'.toByte, 0, 0,
      0x4d, 0x4d, 0, 42, 0, 0, 0, 8,
      0, 1,
      0x01, 0x12, 0, 3, 0, 0, 0, 1,
      0, 3, 0, 0,
      0, 0, 0, 0)
    val segLen = tiff.length + 2
    val mm = Array(jpg(0), jpg(1), 0xff.toByte, 0xe1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++
      tiff ++ jpg.drop(2)
    assert(JpegCodec.decode(mm).toOption.get._1.orientation === 3)
    // truncated / non-Exif APP1 payloads: decode fine, orientation 1
    val junk = Array(jpg(0), jpg(1), 0xff.toByte, 0xe1.toByte, 0.toByte, 6.toByte,
      'J'.toByte, 'F'.toByte, 'X'.toByte, 0.toByte) ++ jpg.drop(2)
    assert(JpegCodec.decode(junk).toOption.get._1.orientation === 1)
    // out-of-range orientation value ignored
    assert(JpegCodec.decode(
      JpegCodec.withExifOrientation(jpg, 8)).toOption.get._1.orientation === 8)
  }

  test("grayscale frames with declared 2x2 sampling decode identically to 1x1 (T.81 A.2.2)") {
    // legal files: single-component scans are non-interleaved, so the
    // declared factors must not shape the block walk — including on
    // non-MCU-multiple dims where a 2x2 walk would mis-place blocks
    for ((w, h, seed) <- Seq((24, 16, 11), (20, 12, 12), (8, 8, 13))) {
      val raster = seededBytes(w * h, seed)
      val jpg = JpegCodec.encodeJpegGray(raster, w, h)
      val sofAt = {
        var i = 2
        while (!((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0)) i += 1
        i
      }
      // component spec: len(2) prec(1) h(2) w(2) nc(1) id(1) HV(1)
      val hvAt = sofAt + 2 + 2 + 1 + 2 + 2 + 1 + 1
      assert((jpg(hvAt) & 0xff) === 0x11)
      val declared22 = jpg.clone(); declared22(hvAt) = 0x22.toByte
      val a = JpegCodec.decode(jpg)
      val b = JpegCodec.decode(declared22)
      assert(b.isRight, s"${w}x$h: 2x2-declared grayscale must decode")
      assert(a.map(_._1) === b.map(_._1), s"${w}x$h stats")
      assert(a.map(_._2.toSeq) === b.map(_._2.toSeq), s"${w}x$h grid")
    }
  }
}
