package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[ExifGps]]: LE round trips through the Scala builder, the
  * committed INDEPENDENT big-endian python fixture (den=2 truncating
  * rational), and the redaction contract — coordinates zeroed in the
  * bytes, orientation surviving, non-GPS inputs untouched.
  */
class ExifGpsSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  private val baseJpeg =
    JpegCodec.encodeJpegGray(Array.tabulate(64)(i => (i * 3).toByte), 8, 8)

  test("LE round trip: extract recovers the spliced coordinates + orientation") {
    val tagged = ExifGps.withExifGps(baseJpeg, 5, "N", "W", 37207L, 356405L)
    val g = ExifGps.extract(tagged).get
    assert((g.latRef, g.lonRef, g.latArcsec, g.lonArcsec) ===
      (("N", "W", 37207L, 356405L)))
    // the same APP1 carries the orientation; JpegCodec must read it
    assert(JpegCodec.decode(tagged).toOption.get._1.orientation === 5)
    assert(ExifGps.hasGps(tagged))
    assert(!ExifGps.hasGps(baseJpeg))
    assert(ExifGps.extract(baseJpeg).isEmpty)
  }

  test("python fixture: big-endian order, truncating den=2 rational") {
    val g = ExifGps.extract(fixture("sample_gps.jpg")).get
    assert((g.latRef, g.lonRef) === (("N", "W")))
    assert(g.latArcsec === 37207L, "15/2 seconds must truncate to 7")
    assert(g.lonArcsec === 356405L)
  }

  test("strip: coordinates gone from the BYTES, orientation survives, sizes keep") {
    for (src <- Seq(
      ExifGps.withExifGps(baseJpeg, 6, "S", "E", 1234L, 98765L),
      fixture("sample_gps.jpg"))) {
      val (scrubbed, stripped) = ExifGps.strip(src)
      assert(stripped)
      assert(scrubbed.length === src.length, "in-place redaction never resizes")
      assert(ExifGps.extract(scrubbed).isEmpty)
      assert(!ExifGps.hasGps(scrubbed))
      // orientation in the SAME APP1 must survive the zeroing
      // (decodable only for the real-raster LE source; the marker
      // fixture has no scan data)
      assert(JpegCodec.decode(scrubbed).toOption.map(_._1.orientation) ===
        JpegCodec.decode(src).toOption.map(_._1.orientation))
    }
    assert(JpegCodec.decode(
      ExifGps.strip(ExifGps.withExifGps(baseJpeg, 6, "S", "E", 1L, 2L))._1)
      .toOption.get._1.orientation === 6)
    // a GPS-free jpeg is returned unchanged
    val plain = JpegCodec.withExifOrientation(baseJpeg, 3)
    val (same, stripped) = ExifGps.strip(plain)
    assert(!stripped)
    assert(same eq plain)
  }

  test("bare TIFF: graft + extract + strip, both byte orders (r20)") {
    val px = Array.tabulate(5 * 4 * 3)(i => (i * 7).toByte)
    for (le <- Seq(true, false)) {
      val base = TiffCodec.encodeTiff(px, 5, 4, 3, littleEndian = le)
      val tagged = ExifGps.tiffWithGps(base, "S", "E", 123456L, 7L)
      val g = ExifGps.extract(tagged).get
      assert((g.latRef, g.lonRef, g.latArcsec, g.lonArcsec) ===
        (("S", "E", 123456L, 7L)), s"le=$le")
      assert(ExifGps.hasGps(tagged) && !ExifGps.hasGps(base), s"le=$le")
      // the appended-IFD graft must not disturb the raster
      val before = TiffCodec.decode(base).toOption.get
      val taggedDec = TiffCodec.decode(tagged).toOption.get
      assert(taggedDec._1 === before._1, s"le=$le")
      assert(taggedDec._2.toSeq === before._2.toSeq, s"le=$le")
      // strip: GPS bytes zeroed IN PLACE (same size), stats unchanged
      val (scrubbed, stripped) = ExifGps.strip(tagged)
      assert(stripped && scrubbed.length === tagged.length, s"le=$le")
      assert(ExifGps.extract(scrubbed).isEmpty && !ExifGps.hasGps(scrubbed), s"le=$le")
      val after = TiffCodec.decode(scrubbed).toOption.get
      assert(after._1 === before._1, s"le=$le")
      assert(after._2.toSeq === before._2.toSeq, s"le=$le")
      // the coordinate rationals are GONE from the byte stream: the
      // only difference region must read zero
      val diff = tagged.indices.filter(i => tagged(i) != scrubbed(i))
      assert(diff.nonEmpty && diff.forall(i => scrubbed(i) == 0), s"le=$le")
    }
    // double-graft guard + non-TIFF guard
    val base = TiffCodec.encodeTiff(px, 5, 4, 3)
    val once = ExifGps.tiffWithGps(base, "N", "E", 1L, 2L)
    assertThrows[IllegalArgumentException](ExifGps.tiffWithGps(once, "N", "E", 1L, 2L))
    assertThrows[IllegalArgumentException](
      ExifGps.tiffWithGps("nope".getBytes("US-ASCII"), "N", "E", 1L, 2L))
  }

  test("python fixture: bare big-endian TIFF with a GPS IFD (r20)") {
    val d = fixture("sample_gps.tif")
    val g = ExifGps.extract(d).get
    assert((g.latRef, g.lonRef) === (("N", "W")))
    assert(g.latArcsec === 37207L, "15/2 seconds must truncate to 7")
    assert(g.lonArcsec === 356405L)
    val (scrubbed, stripped) = ExifGps.strip(d)
    assert(stripped && ExifGps.extract(scrubbed).isEmpty)
    assert(TiffCodec.decode(scrubbed).toOption.get._1 ===
      TiffCodec.decode(d).toOption.get._1)
  }

  test("malformed inputs never throw") {
    assert(ExifGps.extract(Array.emptyByteArray).isEmpty)
    assert(ExifGps.extract("not a jpeg at all".getBytes("US-ASCII")).isEmpty)
    val tagged = ExifGps.withExifGps(baseJpeg, 1, "N", "E", 10L, 20L)
    for (cut <- 0 until math.min(tagged.length, 160)) {
      ExifGps.extract(tagged.take(cut)) // None or Some, never a throw
      ExifGps.strip(tagged.take(cut))
    }
    // truncated APP1 claims a length past EOF
    val bad = tagged.clone()
    bad(4) = 0x7f
    assert(ExifGps.extract(bad).isEmpty)
  }
}
