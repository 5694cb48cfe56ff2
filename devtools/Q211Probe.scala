package graft

/** r20 one-shot: adjudicate q211's fresh-JVM scale inversion. The
  * executed plans are IDENTICAL at both scales (3 broadcast joins,
  * 19 exchanges, 0 reuse), so this pass times the query AND its
  * edge-extraction input separately, 3 warm runs each, per scale —
  * to see which side carries the inversion.
  */
object Q211Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("q211probe")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def time(tag: String)(f: => Long): Unit = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$sf $tag runs=${runs.map(r => f"${r._1}%.2f").mkString(",")} rows=${runs.head._2}")
      }
      time("full")(SparkEntry.queries("q211_coupling")(spark, sf).count())
    }
    spark.stop()
  }
}
