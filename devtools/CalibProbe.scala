package graft

/** Standalone machine-speed probe: the same fixed single-core integer
  * workload Bench emits as `calib_sec`, runnable without the sweep —
  * for interpreting fresh-JVM TimeQ numbers on a possibly
  * differently-loaded box (PERF.md: normalize before comparing).
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    def calibrate(): Double = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      val t0 = System.nanoTime()
      while (i < (1 << 26)) { h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      if (h == 42L) System.err.println("")
      dt
    }
    calibrate()
    val samples = Seq(calibrate(), calibrate(), calibrate())
    println(f"[calib] min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
  }
}
