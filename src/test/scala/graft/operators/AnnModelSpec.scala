package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-session amortization story: an IVF-PQ index is built and
  * written ONCE (model artifact + partitioned index table), and a
  * FRESH session probes it without retraining. The reload must be
  * bit-for-bit — any drift in the quantizer silently reshapes every
  * probe's candidate set.
  */
class AnnModelSpec extends SparkSpec {

  private def bits(a: Array[Array[Double]]): Seq[Seq[Long]] =
    a.toSeq.map(_.toSeq.map(java.lang.Double.doubleToRawLongBits))

  test("save/load round-trips coarse centroids and codebooks bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = Similarity.trainKMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy(col("cluster_id"))
      .collect().map(_.getSeq[Double](1).toArray)
    val codebooks = Similarity.pqTrain(emb, "vec_id", "embedding",
      numSubspaces = 4, codebookSize = 8, iters = 2)
    val dir = tmpDir("ann-model")
    AnnModel.save(spark, dir, coarse, codebooks)
    val loaded = AnnModel.load(spark, dir)
    assert(bits(loaded.coarse) === bits(coarse))
    assert(loaded.codebooks.length === codebooks.length)
    loaded.codebooks.zip(codebooks).foreach { case (l, b) =>
      assert(bits(l) === bits(b))
    }
  }

  test("a fresh session probes a prebuilt index via the reloaded model, equal to the in-session probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = Similarity.trainKMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy(col("cluster_id"))
      .collect().map(_.getSeq[Double](1).toArray)
    val codebooks = Similarity.pqTrain(emb, "vec_id", "embedding",
      numSubspaces = 4, codebookSize = 8, iters = 2)

    // "yesterday": write BOTH halves of the artifact — model + index
    // table partitioned by cluster (the BucketingSpec pruning shape)
    val artifactDir = tmpDir("ann-artifact")
    AnnModel.save(spark, artifactDir, coarse, codebooks)
    Similarity.ivfPqIndex(emb, "vec_id", "embedding", coarse, codebooks)
      .write.partitionBy("cluster").mode("overwrite")
      .parquet(s"$artifactDir/index.parquet")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("rank").cast("long"), col("approx_d2"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3))))
        .sortBy(t => (t._1, t._3))

    val inSession = rows(Similarity.ivfPqProbe(
      emb.filter(col("vec_id") < 5), Similarity.ivfPqIndex(
        emb, "vec_id", "embedding", coarse, codebooks),
      "vec_id", "embedding", k = 10, coarse, codebooks, nprobe = 2))

    // "today": a fresh session state — no in-memory model, no cached
    // plans; everything comes off disk
    val s2 = spark.newSession()
    val model = AnnModel.load(s2, artifactDir)
    val idx = s2.read.parquet(s"$artifactDir/index.parquet")
    val reloaded = rows(Similarity.ivfPqProbe(
      s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") < 5),
      idx, "vec_id", "embedding", k = 10, model.coarse, model.codebooks, nprobe = 2))

    assert(reloaded.nonEmpty)
    assert(reloaded === inSession)
  }

  test("load fails loudly on a model dir that disagrees with its manifest") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val codebooks = Array(Array(Array(1.0), Array(2.0)), Array(Array(3.0), Array(4.0)))
    val dir = tmpDir("ann-model-bad")
    AnnModel.save(spark, dir, coarse, codebooks)
    // truncate the coarse table to simulate a partial copy
    spark.read.parquet(s"$dir/coarse.parquet").limit(1)
      .write.mode("overwrite").parquet(s"$dir/coarse2.parquet")
    val src = new java.io.File(s"$dir/coarse2.parquet")
    val dst = new java.io.File(s"$dir/coarse.parquet")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dst)
    assert(src.renameTo(dst))
    val e = intercept[IllegalArgumentException](AnnModel.load(spark, dir))
    assert(e.getMessage.contains("disagrees with manifest"))
  }
}
