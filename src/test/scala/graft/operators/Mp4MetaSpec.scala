package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4Meta]]: round trips over track layouts and both FullBox
  * versions, FRAGMENTED movies across all three duration sources
  * (per-sample trun, tfhd default, trex fallback, plus mehd winning),
  * the committed INDEPENDENT python fixtures (spec-exact box sizes,
  * free box, v0+v1 tkhd mix, size-0 trailing mdat, hand-rolled
  * moof/traf segments), and the malformed-input discipline.
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

  test("fragmented: all three duration sources, both trun layouts") {
    val v = Mp4Meta.Mp4Track("vide", "avc1", 1L, 320, 240)
    // per-sample trun durations
    val ps = Mp4Meta.decode(Mp4Meta.encodeMp4Fragmented(
      "dash", 9L, 1000L, Seq(v), mediaTimescale = 1000L,
      trexDefaults = Map(1L -> 7L), mehdDuration = None,
      frags = Seq(
        Mp4Meta.Mp4Frag(1L, Seq(100L, 150L, 250L), perSample = true, tfhdDefault = false,
          "f1".getBytes("US-ASCII")),
        Mp4Meta.Mp4Frag(1L, Seq(300L, 200L), perSample = true, tfhdDefault = false,
          "f2".getBytes("US-ASCII"))))).toOption.get
    assert((ps.fragmented, ps.nFragments) === ((true, 2)))
    assert(ps.durationMs === 1000L) // 500 + 500 ticks @ 1000
    assert((ps.brand, ps.width, ps.videoCodec) === (("dash", 320, "avc1")))
    // tfhd default (frag 1) + trex fallback (frag 2), media timescale
    // differing from the movie's
    val df = Mp4Meta.decode(Mp4Meta.encodeMp4Fragmented(
      "iso6", 0L, 1000L, Seq(v), mediaTimescale = 2000L,
      trexDefaults = Map(1L -> 250L), mehdDuration = None,
      frags = Seq(
        Mp4Meta.Mp4Frag(1L, Seq(100L, 100L, 100L), perSample = false, tfhdDefault = true,
          Array.emptyByteArray),
        Mp4Meta.Mp4Frag(1L, Seq(250L, 250L), perSample = false, tfhdDefault = false,
          Array.emptyByteArray)))).toOption.get
    assert(df.durationMs === (300L + 500L) * 1000L / 2000L)
    // mehd wins over the trun sums (movie timescale)
    val me = Mp4Meta.decode(Mp4Meta.encodeMp4Fragmented(
      "dash", 0L, 1000L, Seq(v), mediaTimescale = 2000L,
      trexDefaults = Map(1L -> 250L), mehdDuration = Some(4000L),
      frags = Seq(Mp4Meta.Mp4Frag(1L, Seq(250L), perSample = false,
        tfhdDefault = false, Array.emptyByteArray)))).toOption.get
    assert(me.durationMs === 4000L)
    // a trun with NO duration source anywhere — a traf for a track
    // the moov never declared (so no trex), no tfhd default, no
    // per-sample durations — is a named Left
    val orphan = Mp4Meta.decode(Mp4Meta.encodeMp4Fragmented(
      "dash", 0L, 1000L, Seq(v), mediaTimescale = 1000L,
      trexDefaults = Map.empty, mehdDuration = None,
      frags = Seq(Mp4Meta.Mp4Frag(9L, Seq(5L, 5L), perSample = false,
        tfhdDefault = false, Array.emptyByteArray))))
    assert(orphan.left.toOption.get.contains("duration source"))
  }

  test("python fragmented fixtures: moof walk + mehd precedence") {
    val st = Mp4Meta.decode(fixture("sample_frag.mp4")).toOption.get
    assert((st.fragmented, st.nFragments) === ((true, 3)))
    assert((st.brand, st.timescale, st.durationMs) === (("iso6", 90000L, 300L)))
    assert((st.nTracks, st.width, st.height, st.videoCodec) ===
      ((1, 640, 360, "avc1")))
    val me = Mp4Meta.decode(fixture("sample_frag_mehd.mp4")).toOption.get
    assert((me.fragmented, me.nFragments, me.durationMs) === ((true, 3, 500L)))
  }

  test("standalone DASH segment: styp + sidx, no moov (r20)") {
    // count x default via tfhd (no trex exists) + per-sample layout
    val seg = Mp4Meta.decode(Mp4Meta.encodeMp4Segment(
      "msdh", 3L, 50000L,
      refDurations = Seq(60000L, 40000L),
      frags = Seq(
        Mp4Meta.Mp4Frag(1L, Seq(30000L, 30000L), perSample = false,
          tfhdDefault = true, "a".getBytes("US-ASCII")),
        Mp4Meta.Mp4Frag(1L, Seq(15000L, 25000L), perSample = true,
          tfhdDefault = false, "b".getBytes("US-ASCII"))))).toOption.get
    assert((seg.brand, seg.minorVersion, seg.timescale) === (("msdh", 3L, 50000L)))
    assert(seg.durationMs === 100000L * 1000L / 50000L)
    assert((seg.nTracks, seg.fragmented, seg.nFragments) === ((0, true, 2)))
    assert((seg.width, seg.videoCodec, seg.audioCodec) === ((0, "", "")))
    // moov-less AND sidx-less: named Left (no timescale source)
    val noSidx = Mp4Meta.encodeMp4Segment("msdh", 0L, 1000L, Seq(10L),
      Seq(Mp4Meta.Mp4Frag(1L, Seq(10L), perSample = true, tfhdDefault = false,
        Array.emptyByteArray)))
    // strip the sidx box: it sits right after styp (whose size is
    // the stream's first u32)
    def u32(a: Array[Byte], o: Int) = ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) |
      ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
    val stypLen = u32(noSidx, 0)
    val sidxLen = u32(noSidx, stypLen)
    val bare = noSidx.take(stypLen) ++ noSidx.drop(stypLen + sidxLen)
    assert(Mp4Meta.decode(bare).left.toOption.get.contains("no moov"))
    // a sidx-bearing FULL movie: sidx outranks the trun sums but not
    // mvhd/mehd — pinned via the fragmented fixture in the next test
  }

  test("python segment fixture: moov-less sidx walk") {
    val st = Mp4Meta.decode(fixture("sample_segment.m4s")).toOption.get
    assert((st.brand, st.timescale, st.durationMs) === (("msdh", 48000L, 2500L)))
    assert((st.nTracks, st.fragmented, st.nFragments) === ((0, true, 2)))
  }

  test("malformed input is a Left, never a throw") {
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
    // a trailing empty moof still decodes (r20) — it only flips the
    // fragmented flag; the mvhd duration keeps winning
    val frag = good ++ Array[Byte](0, 0, 0, 8) ++ "moof".getBytes("US-ASCII")
    val fs = Mp4Meta.decode(frag).toOption.get
    assert((fs.fragmented, fs.nFragments, fs.durationMs) === ((true, 1, 2000L)))
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
