package graft
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("explain")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
    }
    spark.stop()
  }
}
