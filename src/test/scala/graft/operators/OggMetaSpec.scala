package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[OggMeta]]: round trips over both codec headers, the committed
  * INDEPENDENT python fixture (comment page, -1-granule header page,
  * multi-lacing 600-byte body, EOS), and the malformed-input
  * discipline incl. a CRC tamper and the chained-stream Left.
  */
class OggMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  test("opus and vorbis round trips across page counts and channel layouts") {
    val fill = "pcmish".getBytes("US-ASCII")
    for (n <- Seq(1, 3, 7); ch <- Seq(1, 2)) {
      val o = OggMeta.decode(
        OggMeta.encodeOgg("opus", ch, 48000, preSkip = 312, n, 96312L, fill)).toOption.get
      assert((o.codec, o.channels, o.sampleRate, o.preSkip) === (("opus", ch, 48000, 312)))
      assert((o.nPages, o.lastGranule) === ((n + 1L, 96312L)))
      assert(o.durationMs === (96312L - 312) * 1000 / 48000)
      val v = OggMeta.decode(
        OggMeta.encodeOgg("vorbis", ch, 44100, 0, n, 88200L, fill)).toOption.get
      assert((v.codec, v.channels, v.sampleRate, v.preSkip) === (("vorbis", ch, 44100, 0)))
      assert(v.durationMs === 2000L)
    }
  }

  test("python fixture: comment page, -1 granule, multi-lacing, EOS") {
    val st = OggMeta.decode(fixture("sample.ogg")).toOption.get
    assert((st.codec, st.channels, st.preSkip) === (("opus", 2, 312)))
    assert((st.nPages, st.lastGranule, st.durationMs) === ((5L, 48312L, 1000L)))
  }

  test("malformed input is a Left, never a throw; CRC tamper caught") {
    val good = OggMeta.encodeOgg("opus", 1, 48000, 0, 2, 960L,
      "x".getBytes("US-ASCII"))
    for (cut <- 0 until good.length)
      OggMeta.decode(good.take(cut)) match {
        case Right(st) => assert(st.nPages >= 1, s"cut=$cut") // page-boundary prefix
        case Left(_) => ()
      }
    val bad = good.clone()
    bad(good.length - 3) = (bad(good.length - 3) ^ 0x20).toByte // body byte: CRC must catch
    assert(OggMeta.decode(bad).left.toOption.get.contains("CRC"))
    assert(OggMeta.decode("OggSnope".getBytes("US-ASCII")).isLeft)
    assert(OggMeta.decode(Array.emptyByteArray).isLeft)
    // a second BOS page = chained stream: named Left
    val chained = good ++ good
    assert(OggMeta.decode(chained).left.toOption.get.contains("out of scope"))
  }
}
