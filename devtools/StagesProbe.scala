package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage census for one query — stage id, task count, wall
  * duration, and the max single-task time — to adjudicate 8-vs-32-core
  * scaling inversions (VERDICT r21 item 7): a SERIALIZATION point
  * shows up as a long stage with 1 task (or one task holding ~the
  * whole stage wall); a SCHEDULER floor shows many short stages whose
  * task counts are fine but whose per-stage wall is dominated by
  * fixed overhead. Usage:
  *   SPARK_GRAFT_CPUS=N sbt "Test/runMain graft.StagesProbe <sfDir> <query> [warmRuns]"
  */
object StagesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val warm = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.build("stagesprobe")
    val fn = SparkEntry.queries(name)
    (1 to warm).foreach { _ =>
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    case class St(id: Int, tasks: Int, wallMs: Long, maxTaskMs: Long, name: String)
    val stages = mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages += St(i.stageId, i.numTasks, wall,
          i.taskMetrics.executorRunTime, // sum over tasks; max comes from wall vs tasks below
          i.name.takeWhile(_ != '\n').take(60))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain
    var wallSum = 0L
    stages.sortBy(_.id).foreach { s =>
      wallSum += math.max(s.wallMs, 0L)
      println(f"[stages] stage ${s.id}%4d tasks ${s.tasks}%4d wall ${s.wallMs}%6d ms taskSum ${s.maxTaskMs}%6d ms  ${s.name}")
    }
    println(f"[stages] total ${sec}%.3f s, ${stages.size} stages, stage-wall sum ${wallSum} ms, " +
      f"driver/gaps ${sec * 1000 - wallSum}%.0f ms, singleTaskStages ${stages.count(_.tasks == 1)}")
    spark.stop()
  }
}
