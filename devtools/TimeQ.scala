package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.build("timeq")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir); df.count(); Checkpoints.release(df)
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = math.min(once(), once())
      println(f"[timeq] $name = $t%.3f s")
    }
    spark.stop()
  }
}
