package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4Meta]]: round trips over track layouts and both FullBox
  * versions, the committed INDEPENDENT python fixture (spec-exact box
  * sizes, free box, v0+v1 tkhd mix, size-0 trailing mdat), and the
  * malformed-input discipline incl. the fragmented-movie Left.
  */
class Mp4MetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  private val fill = "mdatish".getBytes("US-ASCII")

  test("round trips across track layouts, brands, and versions") {
    for (dur <- Seq(6000L, 6001L); ts <- Seq(1000L, 90000L)) { // even=v0, odd=v1
      val v = Mp4Meta.Mp4Track("vide", "avc1", 1L, 320, 240)
      val a = Mp4Meta.Mp4Track("soun", "mp4a", 2L, 0, 0)
      val st = Mp4Meta.decode(
        Mp4Meta.encodeMp4("isom", 77L, ts, dur, Seq(v, a), fill)).toOption.get
      assert((st.brand, st.minorVersion, st.timescale) === (("isom", 77L, ts)))
      assert(st.durationMs === dur * 1000L / ts)
      assert((st.nTracks, st.width, st.height) === ((2, 320, 240)))
      assert((st.videoCodec, st.audioCodec) === (("avc1", "mp4a")))
    }
    // audio-only: no vide track -> zero dims, empty video codec
    val solo = Mp4Meta.decode(Mp4Meta.encodeMp4("mp42", 0L, 48000L, 96000L,
      Seq(Mp4Meta.Mp4Track("soun", "mp4a", 1L, 0, 0)), fill)).toOption.get
    assert((solo.nTracks, solo.width, solo.videoCodec, solo.audioCodec) ===
      ((1, 0, "", "mp4a")))
  }

  test("python fixture: spec-exact boxes, v0+v1 tkhd, free box, size-0 mdat") {
    for (name <- Seq("sample.mp4", "sample_sz0.mp4")) {
      val st = Mp4Meta.decode(fixture(name)).toOption.get
      assert((st.brand, st.minorVersion) === (("isom", 512L)), name)
      assert((st.timescale, st.durationMs) === ((90000L, 3000L)), name)
      assert((st.nTracks, st.width, st.height) === ((2, 640, 360)), name)
      assert((st.videoCodec, st.audioCodec) === (("avc1", "mp4a")), name)
    }
  }

  test("malformed input is a Left, never a throw; fragmented named") {
    val good = Mp4Meta.encodeMp4("isom", 1L, 1000L, 2000L,
      Seq(Mp4Meta.Mp4Track("vide", "avc1", 1L, 64, 48)), fill)
    // a cut landing exactly after moov but before/inside mdat still
    // decodes (mdat is never read and any box may be truncated from
    // the END only if the walk never enters it) — every cut that
    // breaks box framing must be a Left
    for (cut <- 0 until good.length)
      Mp4Meta.decode(good.take(cut)) match {
        case Right(st) => assert(st.nTracks === 1, s"cut=$cut")
        case Left(_) => ()
      }
    assert(Mp4Meta.decode("notamp4file".getBytes("US-ASCII")).isLeft)
    assert(Mp4Meta.decode(Array.emptyByteArray).isLeft)
    // moof: fragmented movies are a named Left
    val frag = good ++ Array[Byte](0, 0, 0, 8) ++ "moof".getBytes("US-ASCII")
    assert(Mp4Meta.decode(frag).left.toOption.get.contains("fragmented"))
    // a child box lying about its size: named Left
    val bad = good.clone()
    // ftyp size is the first u32; shrink it below header size
    bad(3) = 4
    assert(Mp4Meta.decode(bad).isLeft)
    // no moov at all
    val noMoov = good.take(20) // just the 20-byte ftyp box
    assert(Mp4Meta.decode(noMoov).left.toOption.get.contains("moov"))
  }
}
