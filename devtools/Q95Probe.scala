package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Counts jobs/stages/tasks and input volume for one warm q95 run at a
  * given scale — evidence for the q95 sf-inversion investigation
  * (VERDICT r11 task 4): a higher stage count or input-bytes at the
  * SMALLER scale would indicate residual multi-consumer re-execution.
  */
object Q95Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = args.lift(1).getOrElse("q95_dedup_increment")
    val spark = GraftSession.build("q95probe")
    val fn = SparkEntry.queries(name)
    // warm run: codegen, JIT, parquet footers
    locally { val df = fn(spark, sfDir); df.count(); Checkpoints.release(df) }

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val inputBytes = new AtomicLong
    val shuffleRead = new AtomicLong
    val execRunMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        inputBytes.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        execRunMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        println(f"[q95stage] id=${s.stageInfo.stageId}%3d tasks=${s.stageInfo.numTasks}%3d " +
          f"run=${s.stageInfo.taskMetrics.executorRunTime / 1e3}%6.2f s  ${s.stageInfo.name.take(60)}")
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.count()
    Checkpoints.release(df)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(f"[q95probe] $sfDir $name rows=$n wall=$wall%.3f s " +
      f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
      f"input=${inputBytes.get / 1e6}%.1f MB shuffleRead=${shuffleRead.get / 1e6}%.1f MB " +
      f"execRun=${execRunMs.get / 1e3}%.1f s")
    spark.stop()
  }
}
