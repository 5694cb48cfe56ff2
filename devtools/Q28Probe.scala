package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch stage-timing probe for the minhash-LSH pipeline (dev tool,
  * not part of the library surface; lives under devtools/, compiled on
  * the Test classpath only). Times each sub-stage of q28 at the given
  * SF plus fanout variants. The sub-stages are the REAL ones —
  * `Dedup.minhashSigs/minhashBands/minhashCandidates`, the same
  * package-private helpers `minhashLshPairs` composes — so the probe
  * cannot drift from the production pipeline.
  *
  * Run: `sbt "Test/runMain graft.Q28Probe"` (SPARK_GRAFT_SF_DIR to
  * pick the scale factor). Findings: docs/q28-perf-note.md.
  */
object Q28Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("q28probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime(); val n = f
      val t1 = System.nanoTime()
      System.gc()
      val t2 = System.nanoTime(); val m = f
      val t3 = System.nanoTime()
      assert(n == m, s"$name unstable rowcount: $n vs $m")
      println(f"[probe] $name%-24s min ${math.min(t1 - t0, t3 - t2) / 1e9}%6.2f s  rows=$n")
    }

    val docs = Tables(spark, dir, "documents")
    val numHashes = 32; val bands = 8
    val fanout = spark.sessionState.conf.numShufflePartitions

    def sigsOf(base: DataFrame): DataFrame =
      Dedup.minhashSigs(base, "doc_id", "text", numHashes)
    def bandedOf(sigs: DataFrame): DataFrame =
      Dedup.minhashBands(sigs, numHashes, bands)
    def candOf(banded: DataFrame): DataFrame =
      Dedup.minhashCandidates(banded)

    // warm up IO + codegen once
    docs.count()
    Dedup.minhashLshPairs(docs, "doc_id", "text", 32, 8, 0.5).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round  (sf dir $dir, fanout=$fanout) ---")
      time("full-current") { Dedup.minhashLshPairs(docs, "doc_id", "text", 32, 8, 0.5).count() }
      time("sigs-repart") { sigsOf(docs.repartition(fanout, col("doc_id"))).count() }
      time("sigs-noRepart") { sigsOf(docs).count() }
      time("band-repart") { bandedOf(sigsOf(docs.repartition(fanout, col("doc_id")))).count() }
      time("cand-repart") { candOf(bandedOf(sigsOf(docs.repartition(fanout, col("doc_id"))))).count() }
      val shingledFull = docs
        .select(col("doc_id").as("doc"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"), Dedup.shinglesFromToks(col("toks")).as("sh"))
      time("shingled-x1") { shingledFull.count() }
      time("verify-joins-only") {
        val cand = candOf(bandedOf(sigsOf(docs.repartition(fanout, col("doc_id")))))
        cand
          .join(shingledFull.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
          .join(shingledFull.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
          .withColumn("jr",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .filter(col("jr") >= 0.5)
          .count()
      }
    }
    spark.stop()
  }
}
