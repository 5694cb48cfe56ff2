package graft

import org.apache.spark.sql.functions._

/** Stage breakdown for q104 (winnowPairs): times each pipeline prefix
  * so the dominant stage is measurable, not guessed.
  */
object Q104Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("q104probe")
    val docs = Tables(spark, sfDir, "documents")
    val fanout = spark.sessionState.conf.numShufflePartitions

    def timed(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[q104probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
    }

    val rep = docs.repartition(fanout, col("doc_id"))

    timed("tokens only") {
      rep.select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(sum(size(col("toks")))).collect()(0).getLong(0)
    }
    timed("grams exploded (strings)") {
      val k = 3
      rep.select(col("doc_id").as("doc"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"),
          when(size(col("toks")) >= k,
            transform(sequence(lit(1), size(col("toks")) - (k - 1)),
              i => concat_ws(" ", (0 until k).map(d => element_at(col("toks"), i + lit(d))): _*)))
            .otherwise(array(concat_ws(" ", col("toks")))).as("grams"))
        .select(posexplode(col("grams")).as(Seq("pos", "gram")))
        .count()
    }
    timed("grams + poly hash") {
      val k = 3
      rep.select(col("doc_id").as("doc"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"),
          when(size(col("toks")) >= k,
            transform(sequence(lit(1), size(col("toks")) - (k - 1)),
              i => concat_ws(" ", (0 until k).map(d => element_at(col("toks"), i + lit(d))): _*)))
            .otherwise(array(concat_ws(" ", col("toks")))).as("grams"))
        .select(col("doc"), posexplode(col("grams")).as(Seq("pos", "gram")))
        .select(col("doc"), col("pos"), graft.functions.TextFunctions.polyHash(col("gram")).as("h"))
        .groupBy().sum("h").collect()
      0L
    }
    timed("fingerprints flat (w/ window)") {
      operators.Dedup.winnowFingerprintsFlat(rep, "doc_id", "text").count()
    }
    timed("full winnowPairs") {
      val df = operators.Dedup.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, maxDf = 10, minShared = 2)
      val n = df.count(); Checkpoints.release(df); n
    }
    spark.stop()
  }
}
