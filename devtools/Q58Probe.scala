package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch stage-timing probe for the dedup-apply pipeline (dev tool,
  * not part of the library surface).
  */
object Q58Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("q58probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = Tables(spark, dir, "documents")
      val pairs = time("pairs-build") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 32, 8, 0.5)
      }
      val clusters = time("cc") { Dedup.connectedComponents(pairs, "doc_a", "doc_b") }
      val res = time("apply+agg") {
        Dedup.removeDuplicates(docs, "doc_id", clusters)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).cast("long").as("n_chars"))
          .orderBy(col("lang"))
          .count()
      }
      println(s"[probe] rows=$res")
    }
    spark.stop()
  }
}
