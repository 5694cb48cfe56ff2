package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: lossless, so every round trip is a hard stats
  * equality — all five fixed orders, constant blocks, 8/16-bit,
  * multi-channel, all four stereo assignments, short tail frames —
  * plus an LPC subframe decoded from a hand-built bitstream (the
  * encoder never emits LPC; the decoder must), the committed
  * independent-python fixture, and the malformed-input discipline
  * (Left, never a throw).
  */
class FlacCodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  private def expected(samples: Array[Int]) =
    (samples.map(_.toLong).sum.toDouble / samples.length, samples.min, samples.max)

  test("round trip is EXACT across fixed orders, block sizes, and sample widths") {
    val r = new scala.util.Random(7)
    for {
      order <- 0 to 4
      (bits, lo, hi) <- Seq((8, -100, 100), (16, -30000, 30000))
      n <- Seq(1, 5, 192, 450)
    } {
      val s = Array.fill(n)(lo + r.nextInt(hi - lo + 1))
      val enc = FlacCodec.encodeFlac(s, channels = 1, rate = 8000, bits = bits,
        blockSize = 192, fixedOrder = order)
      val st = FlacCodec.decode(enc).toOption.get
      val (mean, mn, mx) = expected(s)
      assert(st.codec === "flac")
      assert((st.channels, st.sampleRate, st.bits, st.nFrames) === ((1, 8000, bits, n.toLong)),
        s"order=$order bits=$bits n=$n")
      assert((st.mean, st.sMin, st.sMax) === ((mean, mn, mx)), s"order=$order bits=$bits n=$n")
      assert(st.durationMs === n * 1000L / 8000)
    }
  }

  test("constant blocks take the CONSTANT subframe and still round-trip") {
    val s = Array.fill(400)(42)
    val st = FlacCodec.decode(FlacCodec.encodeFlac(s, 1, 44100, 8)).toOption.get
    assert((st.mean, st.sMin, st.sMax, st.nFrames) === ((42.0, 42, 42, 400L)))
  }

  test("independent multi-channel and all three stereo transforms round-trip") {
    val r = new scala.util.Random(11)
    val inter = Array.fill(2 * 333)(r.nextInt(200) - 100)
    val (mean, mn, mx) = expected(inter)
    for (mode <- Seq("independent", "leftside", "rightside", "midside")) {
      val st = FlacCodec.decode(
        FlacCodec.encodeFlac(inter, 2, 16000, 8, stereoMode = mode)).toOption.get
      assert(st.channels === 2, mode)
      assert(st.nFrames === 333L, mode)
      assert((st.mean, st.sMin, st.sMax) === ((mean, mn, mx)), mode)
    }
    val tri = Array.fill(3 * 100)(r.nextInt(100))
    val st3 = FlacCodec.decode(FlacCodec.encodeFlac(tri, 3, 8000, 8)).toOption.get
    val (m3, n3, x3) = expected(tri)
    assert((st3.channels, st3.mean, st3.sMin, st3.sMax) === ((3, m3, n3, x3)))
  }

  test("python fixture: independent encoder, short tail frame, known stats") {
    val st = FlacCodec.decode(fixture("tone.flac")).toOption.get
    val samples = Array.tabulate(100)(i => (7 * i) % 101 + (if (i % 9 == 0) 13 else 0))
    val (mean, mn, mx) = expected(samples)
    assert((st.codec, st.channels, st.sampleRate, st.bits) === (("flac", 1, 8000, 8)))
    assert((st.nFrames, st.durationMs) === ((100L, 12L)))
    assert((st.mean, st.sMin, st.sMax) === ((mean, mn, mx)))
  }

  test("an LPC subframe decodes (hand-built: coef 1<<shift == the order-1 predictor)") {
    // one 16-sample frame, mono 8-bit, LPC order 1, precision 5,
    // shift 2, coef 4 -> pred = s[i-1]*4 >> 2 = s[i-1]; residuals are
    // the same deltas an order-1 FIXED subframe would code.
    val s = Array(10, 12, 11, 15, 14, 14, 9, 3, 7, 20, 19, 18, 2, 5, 6, 8)
    val w = new FlacCodec.BitWriter
    w.write(0x3ffeL, 14)
    w.write(0L, 2) // reserved + fixed-blocksize
    w.write(6L, 4) // 8-bit blocksize at end
    w.write(0L, 4) // rate from STREAMINFO
    w.write(0L, 4) // mono
    w.write(1L, 3) // 8-bit
    w.write(0L, 1)
    FlacCodec.writeUtf8Num(w, 0L)
    w.write(15L, 8) // blocksize-1
    val head = w.toBytes
    val body = new FlacCodec.BitWriter
    body.write(0L, 1) // padding
    body.write(32L, 6) // LPC order 1 (type 32 + order-1)
    body.write(0L, 1) // no wasted bits
    body.write(s(0).toLong, 8) // warmup
    body.write(4L, 4) // precision code 4 -> 5 bits
    body.write(2L, 5) // shift 2
    body.write(4L, 5) // coefficient 4 (5-bit signed)
    body.write(0L, 2) // residual method 0
    body.write(0L, 4) // partition order 0
    body.write(0L, 4) // rice parameter 0
    for (i <- 1 until 16) {
      val r = s(i) - s(i - 1)
      val zig = (r << 1) ^ (r >> 31)
      var q = zig
      while (q > 0) { body.write(0L, 1); q -= 1 }
      body.write(1L, 1)
    }
    val frameBytes = head ++ Array(FlacCodec.crc8(head, 0, head.length).toByte) ++ body.toBytes
    val c16 = FlacCodec.crc16(frameBytes, 0, frameBytes.length)

    val si = new FlacCodec.BitWriter
    si.write(0x80L, 8); si.write(34L, 24)
    si.write(16L, 16); si.write(16L, 16)
    si.write(0L, 24); si.write(0L, 24)
    si.write(8000L, 20); si.write(0L, 3); si.write(7L, 5) // 8-bit
    si.write(16L, 36)
    for (_ <- 0 until 16) si.write(0L, 8)
    val flac = "fLaC".getBytes("US-ASCII") ++ si.toBytes ++ frameBytes ++
      Array(((c16 >> 8) & 0xff).toByte, (c16 & 0xff).toByte)

    val st = FlacCodec.decode(flac).toOption.get
    val (mean, mn, mx) = expected(s)
    assert((st.nFrames, st.mean, st.sMin, st.sMax) === ((16L, mean, mn, mx)))
  }

  test("malformed input is a Left, never a throw") {
    val good = FlacCodec.encodeFlac(Array.tabulate(300)(i => (i * 37) % 99 - 40), 1, 8000, 8)
    for (cut <- 0 until good.length)
      assert(FlacCodec.decode(good.take(cut)).isLeft, s"cut=$cut")
    // corrupt one frame-body byte: CRC-16 must catch it
    val bad = good.clone()
    bad(good.length - 10) = (bad(good.length - 10) ^ 0x55).toByte
    val res = FlacCodec.decode(bad)
    assert(res.isLeft)
    // flip a header byte: CRC-8 must catch it (find the first frame sync)
    var fs = 4
    while (!((bad(fs) & 0xff) == 0xff && (bad(fs + 1) & 0xf8) == 0xf8)) fs += 1
    val bad2 = good.clone()
    bad2(fs + 2) = (bad2(fs + 2) ^ 0x10).toByte
    assert(FlacCodec.decode(bad2).isLeft)
    assert(FlacCodec.decode("fLaCxxxx".getBytes("US-ASCII")).isLeft)
    assert(FlacCodec.decode(Array.emptyByteArray).isLeft)
  }
}
