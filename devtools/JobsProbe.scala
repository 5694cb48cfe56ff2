package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-clock census for one query: job id, duration, and the
  * first line of its call site — plus the driver-side GAPS between
  * jobs (plan construction, file ops, manifest commits), which no UI
  * stage view attributes. Usage:
  *   Test/runMain graft.JobsProbe <sfDir> <query> [warmRuns]
  */
object JobsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val warm = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.build("jobs-probe")
    spark.read.parquet(s"$dir/region.parquet").count()
    val fn = SparkEntry.queries(name)
    (0 until warm).foreach { _ =>
      val df = fn(spark, dir); df.count(); Checkpoints.release(df)
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, t0, je.time, site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    val df = fn(spark, dir); df.count(); Checkpoints.release(df)
    val t1 = System.currentTimeMillis()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val sorted = done.asScala.toSeq.sortBy(_._2)
    var prevEnd = t0
    var gapTotal = 0L
    sorted.foreach { case (id, s, e, site) =>
      val gap = s - prevEnd
      if (gap > 0) gapTotal += gap
      println(f"[jobs] gap ${gap}%5d ms | job $id%3d ${e - s}%5d ms  $site")
      prevEnd = math.max(prevEnd, e)
    }
    println(f"[jobs] total ${t1 - t0} ms, ${sorted.size} jobs, driver gaps $gapTotal ms")
    spark.stop()
  }
}
