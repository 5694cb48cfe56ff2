package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp3Meta]]: round trips over the builder (full bitrate/rate
  * tables), the committed INDEPENDENT python fixture (ID3v2.4
  * syncsafe frames, UTF-16 + UTF-8 text encodings, padding bits, a
  * VBR bitrate switch, an ID3v1 trailer), and the malformed-input
  * discipline.
  */
class Mp3MetaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  test("round trip across the full bitrate and rate tables") {
    val fill = "payload".getBytes("US-ASCII")
    for (bIdx <- 1 to 14; rIdx <- 0 to 2) {
      val st = Mp3Meta.decode(
        Mp3Meta.encodeMp3("t", "a", nFrames = 3, bIdx, rIdx, mono = true, fill)).toOption.get
      val rates = Array(44100, 48000, 32000)
      assert((st.version, st.layer, st.channels) === (("mpeg1", 3, 1)), s"b=$bIdx r=$rIdx")
      assert(st.sampleRate === rates(rIdx))
      assert(st.nFrames === 3L)
      assert(st.durationMs === 3L * 1152 * 1000 / rates(rIdx))
      assert(!st.vbr)
      assert((st.title, st.artist) === (("t", "a")))
    }
  }

  test("python fixture: v2.4 syncsafe frames, UTF-16/UTF-8 text, padding, VBR, ID3v1 trailer") {
    val st = Mp3Meta.decode(fixture("sample.mp3")).toOption.get
    assert((st.bitrateKbps, st.sampleRate, st.channels) === ((128, 44100, 2)))
    assert(st.nFrames === 6L)
    assert(st.durationMs === 6L * 1152 * 1000 / 44100)
    assert(st.vbr)
    assert((st.title, st.artist) === (("Pinned Title", "pinned artist")))
  }

  test("unsynchronised ID3v2.3 tags: escapes dropped, text intact (r20)") {
    // 'ÿ' is 0xFF in ISO-8859-1: the unsync pass must insert (and the
    // decoder drop) a 0x00 escape inside the title bytes themselves
    val title = "ÿÿloudÿ"
    val st = Mp3Meta.decode(Mp3Meta.encodeMp3(
      title, "aÿb", nFrames = 3, bitrateIdx = 9, rateIdx = 0,
      mono = true, fill = "pay".getBytes("ISO-8859-1"),
      unsync = true)).toOption.get
    assert((st.title, st.artist) === ((title, "aÿb")))
    assert((st.nFrames, st.bitrateKbps, st.sampleRate) === ((3L, 128, 44100)))
    // the escaped tag is LONGER than the plain one (escapes exist)
    val plain = Mp3Meta.encodeMp3(title, "aÿb", 3, 9, 0, mono = true,
      fill = "pay".getBytes("ISO-8859-1"))
    val unsynced = Mp3Meta.encodeMp3(title, "aÿb", 3, 9, 0, mono = true,
      fill = "pay".getBytes("ISO-8859-1"), unsync = true)
    assert(unsynced.length > plain.length)
    // flag-only (no FF bytes anywhere): identical fields either way
    val noFf = Mp3Meta.decode(Mp3Meta.encodeMp3("plain", "tag", 2, 5, 1,
      mono = true, fill = Array[Byte](1, 2, 3), unsync = true)).toOption.get
    assert((noFf.title, noFf.artist, noFf.nFrames) === (("plain", "tag", 2L)))
  }

  test("python fixture: unsynchronised v2.3 tag with real escapes (r20)") {
    val st = Mp3Meta.decode(fixture("sample_unsync.mp3")).toOption.get
    assert(st.title === "yÿåy")
    assert(st.artist === "unsync artist")
    assert((st.nFrames, st.vbr) === ((2L, false)))
  }

  test("python fixture: ID3v2.2 — 6-byte frames, TT2/TP1, UTF-16 title (r20)") {
    val st = Mp3Meta.decode(fixture("sample_v22.mp3")).toOption.get
    assert((st.title, st.artist) === (("Old Title", "v22 artist")))
    assert((st.nFrames, st.sampleRate, st.channels) === ((3L, 48000, 2)))
    assert(st.durationMs === 3L * 1152 * 1000 / 48000)
    // a compressed v2.2 tag (flag bit 6) is a named Left
    val c = fixture("sample_v22.mp3").clone()
    c(5) = 0x40.toByte
    assert(Mp3Meta.decode(c).left.toOption.get.contains("compressed"))
  }

  test("malformed input is a Left, never a throw") {
    val good = Mp3Meta.encodeMp3("t", "a", 2, 9, 0, mono = false,
      "x".getBytes("US-ASCII"))
    // a cut landing EXACTLY on a frame boundary is a valid shorter
    // stream (MP3 has no declared length) — every other cut is a Left
    for (cut <- 0 until good.length)
      Mp3Meta.decode(good.take(cut)) match {
        case Right(st) => assert(st.nFrames === 1L, s"cut=$cut")
        case Left(_) => ()
      }
    assert(Mp3Meta.decode("ID3junk".getBytes("US-ASCII")).isLeft)
    assert(Mp3Meta.decode(Array.emptyByteArray).isLeft)
    // free-format and reserved fields are NAMED Lefts
    val ff = good.clone()
    // first frame starts right after the tag: find the sync
    var p = 0
    while (!((ff(p) & 0xff) == 0xff && (ff(p + 1) & 0xe0) == 0xe0)) p += 1
    ff(p + 2) = (ff(p + 2) & 0x0f).toByte // bitrate index 0
    assert(Mp3Meta.decode(ff).left.toOption.get.contains("free-format"))
  }

  test("ID3v2.3 negative frame size is a Left, not an infinite loop (r18 ADVICE)") {
    // v2.3 frame sizes are plain 32-bit: 0xFFFFFFF6 = -10 makes
    // p = body + fSize = p — the walk must reject, not stall
    val d = Array[Byte](
      'I', 'D', '3', 3, 0, 0, 0, 0, 0, 10, // header, syncsafe tagSize 10
      'T', 'I', 'T', '2',
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xF6.toByte, // fSize = -10
      0, 0) // frame flags
    assert(Mp3Meta.decode(d).left.toOption.get.contains("negative"))
  }

  test("ID3v2.4 unsync: per-frame de-unsync under stored-size offsets (r21 advice)") {
    // v2.4 frame sizes count the STORED (still-unsynced) bytes; a
    // whole-tag de-unsync would shrink the first body and land the
    // walk mid-frame, losing TPE1. Two frames, each with an FF 00
    // escape inside the body, exercise exactly that alignment.
    def ss(v: Int) = Array[Byte](((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    val base = Mp3Meta.encodeMp3("t", "a", nFrames = 3, bitrateIdx = 9,
      rateIdx = 0, mono = true, fill = "pay".getBytes("ISO-8859-1"))
    val audioStart = 10 + (((base(6) & 0x7f) << 21) | ((base(7) & 0x7f) << 14) |
      ((base(8) & 0x7f) << 7) | (base(9) & 0x7f))
    val audio = base.drop(audioStart)
    def frame(id: String, flags: Array[Byte]): Array[Byte] = {
      // stored body: ISO-8859-1 enc byte, unsynced 0xFF (escape 0x00
      // follows), then a plain char — logical text is "ÿ" + char
      val tail = if (id == "TIT2") 'x' else 'z'
      val body = Array[Byte](0, 0xFF.toByte, 0, tail.toByte)
      id.getBytes("US-ASCII") ++ ss(body.length) ++ flags ++ body
    }
    // tag-level unsync flag (0x80): every frame de-unsyncs
    val tagBody = frame("TIT2", Array[Byte](0, 0)) ++ frame("TPE1", Array[Byte](0, 0))
    val tagged = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0x80.toByte) ++ ss(tagBody.length) ++ tagBody ++ audio
    val st = Mp3Meta.decode(tagged).toOption.get
    assert((st.title, st.artist) === (("ÿx", "ÿz")))
    // frame-level unsync flag (format byte bit 0x02), no tag flag
    val fBody = frame("TIT2", Array[Byte](0, 0x02)) ++ frame("TPE1", Array[Byte](0, 0x02))
    val framed = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0) ++ ss(fBody.length) ++ fBody ++ audio
    val st2 = Mp3Meta.decode(framed).toOption.get
    assert((st2.title, st2.artist) === (("ÿx", "ÿz")))
  }

  test("ID3v2.4 data length indicator (format flag 0x01) skips before decode (r22 advice)") {
    def ss(v: Int) = Array[Byte](((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    val base = Mp3Meta.encodeMp3("t", "a", nFrames = 3, bitrateIdx = 9,
      rateIdx = 0, mono = true, fill = "pay".getBytes("ISO-8859-1"))
    val audioStart = 10 + (((base(6) & 0x7f) << 21) | ((base(7) & 0x7f) << 14) |
      ((base(8) & 0x7f) << 7) | (base(9) & 0x7f))
    val audio = base.drop(audioStart)
    // DLI alone: stored body = 4-byte synchsafe restored-size prefix,
    // then enc byte + text — the prefix must not be read as text
    def dliFrame(id: String, fmtFlags: Int, data: Array[Byte]): Array[Byte] = {
      val body = ss(data.length) ++ data
      id.getBytes("US-ASCII") ++ ss(body.length) ++
        Array[Byte](0, fmtFlags.toByte) ++ body
    }
    val plainData = Array[Byte](0) ++ "hi".getBytes("ISO-8859-1")
    val tagBody = dliFrame("TIT2", 0x01, plainData) ++
      dliFrame("TPE1", 0x01, plainData)
    val tagged = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0) ++ ss(tagBody.length) ++ tagBody ++ audio
    val st = Mp3Meta.decode(tagged).toOption.get
    assert((st.title, st.artist) === (("hi", "hi")))
    // DLI + frame unsync together (the common encoder combination):
    // the synchsafe prefix strips first, the remaining body de-unsyncs
    val unsyncData = Array[Byte](0, 0xFF.toByte, 0, 'q'.toByte) // "ÿq"
    val uBody = dliFrame("TIT2", 0x03, unsyncData) ++
      dliFrame("TPE1", 0x03, unsyncData)
    val utag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0) ++ ss(uBody.length) ++ uBody ++ audio
    val st2 = Mp3Meta.decode(utag).toOption.get
    assert((st2.title, st2.artist) === (("ÿq", "ÿq")))
    // a DLI frame too short to hold its own prefix is a named Left
    val short = "TIT2".getBytes("US-ASCII") ++ ss(2) ++
      Array[Byte](0, 0x01, 0, 0)
    val stag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0) ++ ss(short.length) ++ short ++ audio
    assert(Mp3Meta.decode(stag).left.toOption.get.contains("data length"))
  }
}
