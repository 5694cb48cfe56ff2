package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[WebmMeta]]: round trips over track layouts and both segment-size
  * forms, the committed INDEPENDENT python fixture (unknown-size
  * segment, 4-byte-float Duration/SamplingFrequency, SeekHead to
  * skip), and the malformed-input discipline.
  */
class WebmMetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  private val fill = "clusterish".getBytes("US-ASCII")

  test("round trips across track layouts and segment-size forms") {
    for (unknown <- Seq(false, true)) {
      val v = WebmMeta.WebmTrack(1, "V_VP9", width = 640, height = 360)
      val a = WebmMeta.WebmTrack(2, "A_OPUS", hz = 48000, channels = 2)
      val st = WebmMeta.decode(WebmMeta.encodeWebm(
        1000000L, 1234.0, Seq(v, a), fill, unknownSegmentSize = unknown)).toOption.get
      assert((st.docType, st.timestampScale, st.durationMs) ===
        (("webm", 1000000L, 1234L)), s"unknown=$unknown")
      assert((st.nTracks, st.width, st.height) === ((2, 640, 360)))
      assert((st.videoCodec, st.audioCodec, st.audioHz, st.audioChannels) ===
        (("V_VP9", "A_OPUS", 48000, 2)))
    }
    // audio-only; non-default timestamp scale (0.5 ms ticks)
    val solo = WebmMeta.decode(WebmMeta.encodeWebm(
      500000L, 4000.0, Seq(WebmMeta.WebmTrack(2, "A_VORBIS", hz = 44100, channels = 1)),
      fill)).toOption.get
    assert(solo.durationMs === 2000L)
    assert((solo.nTracks, solo.width, solo.videoCodec, solo.audioCodec) ===
      ((1, 0, "", "A_VORBIS")))
  }

  test("python fixture: unknown-size segment, 4-byte floats, SeekHead skipped") {
    val st = WebmMeta.decode(fixture("sample.webm")).toOption.get
    assert((st.docType, st.timestampScale, st.durationMs) ===
      (("webm", 1000000L, 2500L)))
    assert((st.nTracks, st.width, st.height) === ((2, 1280, 720)))
    assert((st.videoCodec, st.audioCodec, st.audioHz, st.audioChannels) ===
      (("V_VP9", "A_OPUS", 48000, 2)))
  }

  test("live-mux duration fallback: last cluster + last SimpleBlock (r20)") {
    val v = WebmMeta.WebmTrack(1, "V_VP9", width = 64, height = 48)
    // no Duration element: ticks come from the cluster walk
    val live = WebmMeta.decode(WebmMeta.encodeWebm(
      1000000L, 0.0, Seq(v), "clu".getBytes("US-ASCII"),
      omitDuration = true, clusterTimestamp = 4000L,
      blockRelTimes = Seq(2, 37))).toOption.get
    assert(live.durationMs === 4037L)
    assert((live.nTracks, live.videoCodec) === ((1, "V_VP9")))
    // negative relative time (B-frame reordering) subtracts
    val neg = WebmMeta.decode(WebmMeta.encodeWebm(
      2000000L, 0.0, Seq(v), Array.emptyByteArray,
      omitDuration = true, clusterTimestamp = 500L,
      blockRelTimes = Seq(-20))).toOption.get
    assert(neg.durationMs === 480L * 2L) // 480 ticks at 2 ms each
    // Duration present: clusters are NOT walked, the float wins
    val timed = WebmMeta.decode(WebmMeta.encodeWebm(
      1000000L, 777.0, Seq(v), Array.emptyByteArray,
      clusterTimestamp = 4000L, blockRelTimes = Seq(50))).toOption.get
    assert(timed.durationMs === 777L)
    // no Duration and only a zero-timestamped blockless cluster: 0
    val bare = WebmMeta.decode(WebmMeta.encodeWebm(
      1000000L, 0.0, Seq(v), Array.emptyByteArray,
      omitDuration = true)).toOption.get
    assert(bare.durationMs === 0L)
  }

  test("python live fixture: two clusters, unknown-size tail, 2-byte varint, BlockGroup (r20)") {
    val st = WebmMeta.decode(fixture("sample_live.webm")).toOption.get
    assert(st.durationMs === 2047L)
    assert((st.docType, st.timestampScale) === (("webm", 1000000L)))
    assert((st.width, st.height, st.videoCodec) === ((320, 180, "V_VP9")))
  }

  test("malformed input is a Left, never a throw; out-of-scope named") {
    val good = WebmMeta.encodeWebm(1000000L, 100.0,
      Seq(WebmMeta.WebmTrack(1, "V_VP8", width = 16, height = 16)), fill)
    for (cut <- 0 until good.length)
      WebmMeta.decode(good.take(cut)) match {
        case Right(st) => assert(st.docType === "webm", s"cut=$cut")
        case Left(_) => ()
      }
    assert(WebmMeta.decode("nonsense bytes".getBytes("US-ASCII")).isLeft)
    assert(WebmMeta.decode(Array.emptyByteArray).isLeft)
    // unknown size on a non-Segment element: named Left
    val tamper = good.clone()
    // the Info element follows the Segment header; find its ID
    val infoId = Array[Byte](0x15, 0x49.toByte, 0xa9.toByte, 0x66.toByte)
    val at = tamper.indices.indexWhere(i => i + 5 <= tamper.length &&
      infoId.indices.forall(k => tamper(i + k) == infoId(k)))
    assert(at >= 0)
    tamper(at + 4) = 0xff.toByte // Info size -> all-ones 1-byte varint
    assert(WebmMeta.decode(tamper).left.toOption.get.contains("unknown-size"))
    // a DocType that is neither webm nor matroska: named Left
    val mk = good.clone()
    val dt = mk.indices.indexWhere(i => i + 9 <= mk.length &&
      mk(i) == 0x42 && (mk(i + 1) & 0xff) == 0x82)
    assert(dt >= 0)
    mk(dt + 3) = 'x'.toByte // "webm" -> "xebm"
    assert(WebmMeta.decode(mk).left.toOption.get.contains("out of scope"))
  }

  test("zero-size SimpleBlock in the duration fallback is a Left (r21 advice)") {
    val v = WebmMeta.WebmTrack(1, "V_VP9", width = 64, height = 48)
    // duration-less: the cluster walk parses block headers
    val d = WebmMeta.encodeWebm(1000000L, 0.0, Seq(v), Array.emptyByteArray,
      omitDuration = true, clusterTimestamp = 100L, blockRelTimes = Seq(7)).clone()
    // the one SimpleBlock: id 0xA3, size varint 0x84 (4-byte payload)
    val at = d.indices.indexWhere(i => (d(i) & 0xff) == 0xa3 &&
      i + 1 < d.length && (d(i + 1) & 0xff) == 0x84)
    assert(at >= 0)
    d(at + 1) = 0x80.toByte // size -> 0: header read would hit the sibling
    assert(WebmMeta.decode(d).left.toOption.get.contains("empty"))
  }
}
