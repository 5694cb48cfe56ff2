package graft

/** Degenerate-input audit: every registered query must plan and
  * execute (not throw) over EMPTY tables with the production schemas.
  * At fleet scale, empty partitions and empty daily drops are routine
  * inputs — a min()/head()/window over zero rows must yield an empty
  * or null-bearing result, never an exception.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty-sf")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      // limit(0) preserves the exact production schema incl. the
      // TIMESTAMP(NANOS) events column handled by Tables
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on empty tables") {
      val n = fn(spark, emptyDir).count()
      assert(n >= 0L)
    }
  }
}
