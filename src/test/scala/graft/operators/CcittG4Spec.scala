package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[CcittG4]]: exhaustive MH run round trips (every run length 0..3000
  * in both colors through horizontal-mode encode/decode), seeded
  * random raster round trips across widths (all three 2D modes
  * exercised), structured edge rasters, and malformed-stream
  * discipline.
  */
class CcittG4Spec extends AnyFunSuite {

  private def seededBits(w: Int, h: Int, seed: Long, density: Int): Array[Byte] = {
    var s = seed
    Array.tabulate(w * h) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      (if (((s >>> 33) % 100) < density) 1 else 0).toByte
    }
  }

  test("random raster round trips across widths, heights, densities") {
    for (w <- Seq(1, 7, 63, 64, 65, 320, 2600);
         h <- Seq(1, 3, 9);
         density <- Seq(0, 3, 50, 97, 100)) {
      val bits = seededBits(w, h, w * 1000L + h * 10 + density, density)
      val dec = CcittG4.decode(CcittG4.encode(bits, w, h), w, h)
      assert(java.util.Arrays.equals(dec, bits),
        s"w=$w h=$h density=$density")
    }
  }

  test("every run length 0..3000 in both colors round trips") {
    // a 2-row raster: row 0 all white (forces pure vertical coding),
    // row 1 = white run r then black to the end — wide enough that
    // the encoder must use horizontal mode with makeup chains
    val w = 3100
    for (r <- 0 to 3000 by 7) {
      val bits = new Array[Byte](2 * w)
      var x = r
      while (x < w) { bits(w + x) = 1; x += 1 }
      val dec = CcittG4.decode(CcittG4.encode(bits, w, 2), w, 2)
      assert(java.util.Arrays.equals(dec, bits), s"white run $r")
      // and the inverse: black run r then white
      val inv = new Array[Byte](2 * w)
      var y = 0
      while (y < r) { inv(w + y) = 1; y += 1 }
      val dec2 = CcittG4.decode(CcittG4.encode(inv, w, 2), w, 2)
      assert(java.util.Arrays.equals(dec2, inv), s"black run $r")
    }
  }

  test("structured rasters: checkerboard, vertical bars, single pixels") {
    val w = 97; val h = 13
    val checker = Array.tabulate(w * h)(i => ((i / w + i % w) % 2).toByte)
    assert(java.util.Arrays.equals(
      CcittG4.decode(CcittG4.encode(checker, w, h), w, h), checker))
    val bars = Array.tabulate(w * h)(i => (if (i % w % 5 < 2) 1 else 0).toByte)
    assert(java.util.Arrays.equals(
      CcittG4.decode(CcittG4.encode(bars, w, h), w, h), bars))
    val dots = new Array[Byte](w * h)
    dots(0) = 1; dots(w - 1) = 1; dots(w * h - 1) = 1; dots(w * 6 + 48) = 1
    assert(java.util.Arrays.equals(
      CcittG4.decode(CcittG4.encode(dots, w, h), w, h), dots))
  }

  test("malformed streams throw the named Malformed, never raw OOB") {
    val bits = seededBits(64, 4, 42L, 30)
    val good = CcittG4.encode(bits, 64, 4)
    // truncations starve the bit reader or desync a mode
    for (cut <- 0 until good.length) {
      try { CcittG4.decode(good.take(cut), 64, 4); () }
      catch { case CcittG4.Malformed(_) => () }
    }
    // pure garbage
    intercept[CcittG4.Malformed] {
      CcittG4.decode(Array.fill(16)(0.toByte), 64, 4)
    }
  }
}
