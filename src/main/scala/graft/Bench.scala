package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line the driver collects
  * into BENCH_r{N}.json. Timing includes plan + execution to a count
  * (forces the whole plan; avoids driver-side materialization cost).
  *
  * Each query runs once as warmup (JIT + codegen compilation +
  * parquet footer reads — paid once per executor lifetime in
  * production), then twice measured, reporting the MIN: single warm
  * runs of the heavy similarity queries still vary 2-6x with GC/AQE
  * noise in a shared JVM, and the minimum is the standard estimator
  * for the actual plan cost under one-way noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    // warmup: JIT/codegen/parquet-footer caches
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      once(name, fn) // warm: codegen compile, JIT, IO caches
      System.gc() // don't bill this query for its predecessor's garbage
      name -> math.min(once(name, fn), once(name, fn)) // steady state, noise-robust
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
