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
    // width sweep: the same workload on k threads at once — what does
    // THIS box's idle all-cores median actually read? (r14: deciding
    // whether the quiet gate's 1.15 median bound is achievable here)
    for (k <- Seq(8, 16, 24, 32)) {
      val times = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val threads = (0 until k).map(_ => new Thread(() => { times.add(calibrate()) }))
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val s = times.asScala.toSeq.sorted
      println(f"[calib-mt] k=$k median=${s(s.size / 2)}%.3f max=${s.last}%.3f " +
        f"ratio_med=${s(s.size / 2) / samples.min}%.2f ratio_max=${s.last / samples.min}%.2f")
    }
  }
}
