package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the two r16 decoders: the round-trip identities
  * the q216/q220 gates pin on driver data must hold on ARBITRARY
  * inputs — random rasters through every PNG filter path, adversarial
  * strings (parens, backslashes, control chars, octal-looking text)
  * through the PDF literal escaper/parser. Seeded samples (the repo's
  * scalacheck idiom) keep failures replayable. Both encoders are the
  * adapters' substrate, and both decoders face crawl bytes — the
  * property layer is what says "no input shape we didn't plant breaks
  * the inverse".
  */
class CodecPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ------------------------------------------------------------- PNG

  private val rasterGen: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 13)
    h <- Gen.choose(1, 11)
    px <- Gen.listOfN(3 * w * h, Gen.choose(0, 255))
  } yield (w, h, px.map(_.toByte).toArray)

  test("PNG round trip: random rasters decode to the PPM truth (stats AND aHash), every filter exercised") {
    for (i <- 0 until 40) {
      val (w, h, rgb) = sample(rasterGen, 7000L + i)
      val ppm = (s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
      val truth = ImageCodec.decode(ppm).toOption.get
      val png = ImageCodec.encodePng(rgb, w, h)
      val got = ImageCodec.decode(png).toOption.get
      assert(got.copy(codec = "ppm") === truth, s"seed ${7000 + i} w=$w h=$h")
      assert(ImageCodec.aHash(png).toOption.get ===
        ImageCodec.aHash(ppm).toOption.get, s"seed ${7000 + i} aHash")
    }
    // the encoder cycles filters by row, so any h >= 5 raster has hit
    // all five unfilter paths; assert one such case ran
    assert((0 until 40).exists(i => sample(rasterGen, 7000L + i)._2 >= 5))
  }

  test("PNG decoder never throws on mutated payloads: Left or a valid decode, task-safe") {
    val (w, h, rgb) = sample(rasterGen, 99L)
    val good = ImageCodec.encodePng(rgb, w, h)
    val mutGen = for {
      pos <- Gen.choose(0, good.length - 1)
      bit <- Gen.choose(0, 7)
    } yield (pos, bit)
    for (i <- 0 until 200) {
      val (pos, bit) = sample(mutGen, 8000L + i)
      val b = good.clone()
      b(pos) = (b(pos) ^ (1 << bit)).toByte
      ImageCodec.decode(b) match {
        case Right(s) => assert(s.nPixels === w.toLong * h) // CRC happened to survive? still sane
        case Left(e) => assert(e.nonEmpty)
      }
    }
    // truncations at every length: never an exception
    for (len <- 0 to good.length by 7)
      assert(ImageCodec.decode(java.util.Arrays.copyOf(good, len)).isLeft ||
        len == good.length)
  }

  // ------------------------------------------------------------- JPEG

  test("JPEG round trip: random rasters stay within unit-quant tolerance; flat tiles exact") {
    for (i <- 0 until 25) {
      val (w, h, rgb) = sample(rasterGen, 8600L + i)
      val n = w * h
      val got = ImageCodec.decode(
        JpegCodec.encodeJpeg(rgb, w, h, subsample = i % 2 == 1)).toOption.get
      assert((got.width, got.height, got.nPixels) === ((w, h, n.toLong)),
        s"seed ${8600 + i}")
      def mean(c: Int) = (0 until n).map(k => rgb(3 * k + c) & 0xff).sum.toDouble / n
      // 4:2:0 on random NOISE at tiny sizes (w,h <= 13) is the worst
      // case for chroma averaging + clamp bias — real images are
      // chroma-smooth; the 4:4:4 path stays at DCT-round-trip error
      val tol = if (i % 2 == 1) 16.0 else 2.0
      assert(math.abs(got.rMean - mean(0)) <= tol &&
        math.abs(got.gMean - mean(1)) <= tol &&
        math.abs(got.bMean - mean(2)) <= tol, s"seed ${8600 + i}")
    }
  }

  test("JPEG decoder never throws on mutated payloads: Left or a decode, task-safe") {
    val good = JpegCodec.encodeJpeg(sample(rasterGen, 77L)._3.take(3 * 9 * 7), 9, 7,
      subsample = false)
    val mutGen = for {
      pos <- Gen.choose(0, good.length - 1)
      bit <- Gen.choose(0, 7)
    } yield (pos, bit)
    for (i <- 0 until 300) {
      val (pos, bit) = sample(mutGen, 8700L + i)
      val b = good.clone()
      b(pos) = (b(pos) ^ (1 << bit)).toByte
      JpegCodec.decode(b) match {
        case Right((s, _)) => assert(s.width > 0 && s.height > 0)
        case Left(e) => assert(e.nonEmpty)
      }
    }
    // truncations at every length: never an exception (a tail cut that
    // loses only padding/EOI may still decode — that is valid)
    for (len <- 0 to good.length by 3)
      JpegCodec.decode(java.util.Arrays.copyOf(good, len))
  }

  // ------------------------------------------------------------- PDF

  private val nastyText: Gen[String] = {
    val unit = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("(", ")", "\\", "((", "))", "\\\\", "\\(", "()", ")("),
      Gen.oneOf(" ", "  ", "\t"),
      Gen.oneOf("\\101", "\\0", "\\n", "Tj", "TJ", "BT", "ET", "%", "[", "]", "<", ">"))
    Gen.listOf(unit).map(_.mkString.take(120))
  }

  test("PDF round trip: adversarial strings survive escape -> literal-parse exactly, all six stream encodings") {
    for (i <- 0 until 120) {
      val t = sample(nastyText, 9000L + i)
      for (mode <- Seq("raw", "flate", "hex", "a85flate", "rle", "lzw")) {
        val x = Pdfx.extract(Pdfx.build(s"T$i|", t, mode))
        assert(x === s"T$i|$t~fin.", s"seed ${9000 + i} mode=$mode text=${t.take(40)}")
      }
    }
  }

  private object Pdfx {
    def build(title: String, text: String, mode: String): Array[Byte] =
      graft.sources.Pdf.buildPdf(title, text, mode)
    def extract(pdf: Array[Byte]): String =
      graft.sources.Pdf.extractText(pdf).toOption.get.text
  }

  // ------------------------------------------------------------ WebP

  test("WebP round trip: random rasters decode to the PPM truth (stats AND aHash)") {
    for (i <- 0 until 40) {
      val (w, h, rgb) = sample(rasterGen, 9000L + i)
      val ppm = (s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
      val truth = ImageCodec.decode(ppm).toOption.get
      val webp = WebpCodec.encodeWebpLossless(rgb, w, h)
      val got = ImageCodec.decode(webp).toOption.get
      assert(got.copy(codec = "ppm") === truth, s"seed ${9000 + i} w=$w h=$h")
      assert(ImageCodec.aHash(webp).toOption.get ===
        ImageCodec.aHash(ppm).toOption.get, s"seed ${9000 + i} aHash")
    }
  }

  test("WebP decoder never throws on mutated payloads: Left or a decode, task-safe") {
    val (w, h, rgb) = sample(rasterGen, 111L)
    val good = WebpCodec.encodeWebpLossless(rgb, w, h)
    val mutGen = for {
      pos <- Gen.choose(0, good.length - 1)
      bit <- Gen.choose(0, 7)
    } yield (pos, bit)
    for (i <- 0 until 300) {
      val (pos, bit) = sample(mutGen, 10000L + i)
      val b = good.clone()
      b(pos) = (b(pos) ^ (1 << bit)).toByte
      WebpCodec.decode(b) match {
        case Right((s, _)) => assert(s.nPixels > 0)
        case Left(e) => assert(e.nonEmpty)
      }
    }
    for (len <- Seq(0, 3, 11, 15, 21, good.length - 1))
      WebpCodec.decode(java.util.Arrays.copyOf(good, len))
  }
}
