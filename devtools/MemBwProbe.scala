package graft

/** Memory-bandwidth probe — the discriminator the r17→r18 bench
  * adjudication was missing. The register-resident calibrate() loop
  * (both single-core min and all-cores median) stayed flat across the
  * r16→r17 driver artifacts (+0%/+5%) while the same code's
  * memory-streaming work (converter parse throughput, shuffle-heavy
  * heavies) ran 1.5-2x slower — the signature of HOST-level memory
  * bandwidth contention, which a frequency-bound integer loop cannot
  * see. This probe streams a buffer far larger than LLC and reports
  * GB/s single-threaded and all-cores, the two numbers that move when
  * a metal neighbor saturates the memory controllers.
  */
object MemBwProbe {
  def main(args: Array[String]): Unit = {
    val words = 1 << 26 // 512 MiB of longs — far beyond any LLC
    val a = new Array[Long](words)
    java.util.Arrays.fill(a, 0x9E3779B97F4A7C15L)

    def sweep(arr: Array[Long], from: Int, until: Int): Long = {
      var s = 0L
      var i = from
      while (i < until) { s += arr(i); i += 1 }
      s
    }
    def gbs(seconds: Double, bytes: Long): Double = bytes / seconds / 1e9

    // single-thread: 3 passes, report best and median
    def onePass(): Double = {
      val t0 = System.nanoTime()
      val s = sweep(a, 0, words)
      if (s == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // warm/fault
    val st = Seq(onePass(), onePass(), onePass()).sorted
    println(f"[membw] st_best=${gbs(st.head, words.toLong * 8)}%.2f GB/s " +
      f"st_median=${gbs(st(1), words.toLong * 8)}%.2f GB/s")

    // all-cores: n threads each sweeping a disjoint slice, wall-clock
    // over the barrier — aggregate bandwidth under full width
    val n = Runtime.getRuntime.availableProcessors()
    def mtPass(): Double = {
      val chunk = words / n
      val t0 = System.nanoTime()
      val threads = (0 until n).map { k =>
        new Thread(() => {
          var r = 0
          // re-sweep the slice 4x so per-thread work dominates startup
          while (r < 4) { if (sweep(a, k * chunk, (k + 1) * chunk) == 42L) System.err.println(""); r += 1 }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    mtPass()
    val mt = Seq(mtPass(), mtPass()).min
    val mtBytes = words.toLong * 8 * 4
    println(f"[membw] mt_aggregate=${gbs(mt, mtBytes)}%.2f GB/s over $n threads")
  }
}
