package graft

/** Writes `.explain("formatted")` output for the named queries to
  * files — the plans/r21 evidence artifacts. Usage:
  *   Test/runMain graft.ExplainFmt <sfDir> <outDir> <suffix> q... q...
  * writes <outDir>/<query>_<suffix>.txt for each query.
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.build("explain-fmt")
    for (name <- args.drop(3)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      Checkpoints.release(df)
      println(s"[explainfmt] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
