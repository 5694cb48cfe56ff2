package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch stage-timing probe for the minhash-LSH pipeline (dev tool,
  * not part of the library surface). Times each sub-stage of q28 at
  * the given SF plus fanout variants, to localize the r3/r4 bench
  * regression (VERDICT r4 item #1).
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
    val numHashes = 32; val bands = 8; val rows = numHashes / bands
    val fanout = spark.sessionState.conf.numShufflePartitions

    def sigsOf(base: DataFrame): DataFrame =
      base
        .select(col("doc_id").as("doc"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"), explode(Dedup.shinglesMultiFromToks(col("toks"))).as("x"))
        .withColumn("h", pmod(TextFunctions.hash60(col("x")), lit(Dedup.P)))
        .groupBy(col("doc"))
        .agg(min(pmod(col("h") * Dedup.hashA(0) + Dedup.hashB(0), lit(Dedup.P))).as("sig_0"),
          (1 until numHashes).map(k =>
            min(pmod(col("h") * Dedup.hashA(k) + Dedup.hashB(k), lit(Dedup.P))).as(s"sig_$k")): _*)

    def bandedOf(sigs: DataFrame): DataFrame =
      sigs.select(col("doc"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws("|", (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*)).as("bh"))
        }: _*)).as("bk"))
        .select(col("doc"), col("bk.band"), col("bk.bh"))

    def candOf(banded: DataFrame): DataFrame =
      banded.select(col("band"), col("bh"), col("doc").as("doc_a"))
        .join(banded.select(col("band"), col("bh"), col("doc").as("doc_b")), Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct()

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
