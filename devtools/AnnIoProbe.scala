package graft

import org.apache.spark.sql.functions._

/** Sub-step timing for the ANN publish/append artifact I/O (r22,
  * verdict item 2): inside publishAnn's 2.2 s and appendAnn's 2.4 s
  * (Q232Probe), how much is index compute vs segment write vs model
  * save/load vs the dup-check read?
  */
object AnnIoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("annio-probe")
    import graft.operators.{Encode, Similarity, AnnModel}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annio] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$dir/region.parquet").count()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val enc = new Encode.HashingTrickEncoder(dims = 16)
    val chunks = graft.operators.Retrieval
      .chunkSliding(docs, "doc_id", "text", winTokens = 32, stride = 24)
      .select(graft.operators.Retrieval.chunkVid("doc_id").as("vid"), col("chunk"))
    val corpus = Encode.encodeWithModel(chunks, "vid", "chunk", enc).localCheckpoint(true)
    println(s"[annio] corpus rows = ${corpus.count()}")
    val day1 = corpus.filter(expr("(vid div 1000) % 2 = 0"))
    val day2 = corpus.filter(expr("(vid div 1000) % 2 = 1"))
    val sample = day1.orderBy(col("vid")).limit(16)
      .select(Similarity.asDoubleVec(col("embedding")))
      .collect().map(_.getSeq[Double](0).toArray)
    val coarse = sample.take(8)
    val subDim = sample(0).length / 4
    val codebooks = Array.tabulate(4)(m =>
      sample.map(_.slice(m * subDim, (m + 1) * subDim)))
    val tmp = java.nio.file.Files.createTempDirectory("annio").toString

    // publish sub-steps, twice (first run carries codegen warmup)
    for (round <- 1 to 2) {
      val idx1 = Similarity.ivfPqIndex(day1, "vid", "embedding", coarse, codebooks)
      time(s"r$round index compute (noop)") {
        idx1.write.format("noop").mode("overwrite").save()
      }
      time(s"r$round seg write (repart+pby)") {
        idx1.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$tmp/seg-$round")
      }
      time(s"r$round model save") {
        AnnModel.save(spark, s"$tmp/model-$round", coarse, codebooks)
      }
      time(s"r$round model load") {
        AnnModel.load(spark, s"$tmp/model-$round")
      }
      val seg = time(s"r$round seg read (lazy plan)") {
        spark.read.parquet(s"$tmp/seg-$round")
      }
      time(s"r$round dup-check count") {
        val delta = Similarity.ivfPqIndex(day2, "vid", "embedding", coarse, codebooks)
        seg.join(broadcast(delta.select("neighbor_id").distinct()),
          Seq("neighbor_id"), "left_semi").count()
      }
      time(s"r$round delta ckpt+write") {
        val delta = Similarity.ivfPqIndex(day2, "vid", "embedding", coarse, codebooks)
          .localCheckpoint(true)
        delta.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$tmp/segd-$round")
        Checkpoints.release(delta)
      }
    }
    spark.stop()
  }
}
