package graft

import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the prefix-filter jaccard join
  * (dev tool, not part of the library surface).
  */
object Q30Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("q30probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = Tables(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // mirror the operator's stages
    val gramStrings = expr(
      """case when length(lc) >= 3 then
        |  array_distinct(transform(sequence(1, length(lc) - 2),
        |    i -> substring(lc, i, 3)))
        |else array(lc) end""".stripMargin)
    val grams = array_sort(array_distinct(transform(gramStrings,
      x => graft.functions.TextFunctions.hash60(x))))
    val g = df.select(col("lang").as("blk"), col("doc_id").as("doc"), lower(col("text")).as("lc"))
      .select(col("blk"), col("doc"), grams.as("g"))
      .withColumn("n", size(col("g")))
    val fanout = spark.sessionState.conf.numShufflePartitions
    var gSets: org.apache.spark.sql.DataFrame = null
    time("gSets") { gSets = g.repartition(fanout, col("doc")).localCheckpoint(true); gSets.count() }
    val occ = gSets.select(col("blk"), col("doc"), col("n"), explode(col("g")).as("gram"))
    time("gramDf") { occ.groupBy(col("gram")).agg(count(lit(1))).count() }
    val gramDf = occ.groupBy(col("gram")).agg(count(lit(1)).as("df_"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("df_"), col("gram"))
    val prefixLen = (col("n") - ceil(lit(0.75) * col("n") - lit(1e-9)).cast("int") + lit(1))
    val prefixes = occ.join(gramDf, "gram")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= least(prefixLen, col("n")))
      .select(col("blk"), col("gram"), col("doc"), col("n"))
    time("prefixes") { prefixes.count() }
    // NOTE: approximate mirror of Dedup.ngramJaccardPairs' candidate
    // stage WITHOUT the PPJoin positional filter (the real stage also
    // prunes on prefix positions); "full" below times the actual
    // operator and is the number that matters.
    val cand = prefixes.select(col("blk"), col("gram"), col("doc").as("doc_a"), col("n").as("n_a"))
      .join(prefixes.select(col("blk"), col("gram"), col("doc").as("doc_b"), col("n").as("n_b")),
        Seq("blk", "gram"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_a") * 0.75 <= col("n_b") && col("n_b") * 0.75 <= col("n_a"))
      .select(col("doc_a"), col("doc_b")).distinct()
    time("cand") { cand.count() }
    time("full") { graft.operators.Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", 0.75).count() }
    spark.stop()
  }
}
