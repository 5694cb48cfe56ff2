package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistence for the ANN model ARTIFACT — the coarse centroids and
  * PQ codebooks that [[Similarity.ivfPqIndex]]/[[Similarity.ivfPqProbe]]
  * take as driver-side arrays.
  *
  * Why this exists: the index TABLE already persists (written
  * partitioned by `cluster`, see BucketingSpec), but without the model
  * a fresh session cannot probe it — it would have to re-run k-means
  * and PQ training, which defeats the build-once/probe-daily
  * amortization the build/probe bench split measures. The model is the
  * small half of the artifact pair (nlist x dims + dims x codebookSize
  * doubles — KBs at any corpus size); this writes it NEXT TO the index
  * so the two travel together, the same persisted-artifact publish
  * story as the reference product (an artifact dir plus a pointer,
  * process-changesets-r2.yml:145-174).
  *
  * Format: plain parquet (doubles round-trip bit-exactly — the
  * reload-vs-in-session probe is pinned bit-for-bit by AnnModelSpec
  * and the q92 oracle routes through a save/load round trip) plus a
  * tiny JSON manifest with the shape for fail-fast validation. No
  * custom binary format: any Spark/DuckDB/pandas session can read the
  * model for inspection.
  */
object AnnModel {

  /** Coarse quantizer + per-subspace PQ codebooks, as the probe
    * operators consume them: `coarse(c)` = centroid c,
    * `codebooks(m)(c)` = centroid c of subspace m.
    */
  final case class IvfPq(
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]])

  private val coarseSchema = StructType(Seq(
    StructField("cluster_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false)))
  private val cbSchema = StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("cluster", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Writes `modelDir/coarse.parquet`, `modelDir/codebooks.parquet`,
    * `modelDir/manifest.json`. Tiny frames — coalesce(1) keeps the
    * artifact a single file per table.
    */
  def save(
      spark: SparkSession,
      modelDir: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Unit = {
    require(coarse.nonEmpty, "AnnModel.save: empty coarse quantizer")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "AnnModel.save: empty codebooks")
    val coarseRows = coarse.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    val cbRows = for {
      (cents, m) <- codebooks.zipWithIndex.toSeq
      (cv, c) <- cents.zipWithIndex
    } yield Row(m, c, cv.toSeq)
    spark.createDataFrame(spark.sparkContext.parallelize(coarseRows.toSeq, 1), coarseSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/coarse.parquet")
    spark.createDataFrame(spark.sparkContext.parallelize(cbRows, 1), cbSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/codebooks.parquet")
    val manifest =
      s"""{
         |  "format": "graft-ann-model",
         |  "version": 1,
         |  "nlist": ${coarse.length},
         |  "dims": ${coarse(0).length},
         |  "num_subspaces": ${codebooks.length},
         |  "codebook_size": ${codebooks(0).length},
         |  "sub_dim": ${codebooks(0)(0).length}
         |}
         |""".stripMargin
    // resolve through the session's Hadoop FileSystem, like the
    // parquet writes above — a URI-schemed or non-local modelDir must
    // not split the artifact across filesystems (manifest local,
    // parquet remote)
    val manifestPath = new Path(modelDir, "manifest.json")
    val fs = manifestPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(manifestPath, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Reads a model dir written by [[save]], validating shape against
    * the manifest so a truncated copy fails loudly instead of probing
    * with a silently-wrong quantizer.
    */
  def load(spark: SparkSession, modelDir: String): IvfPq = {
    val manifestPath = new Path(modelDir, "manifest.json")
    val fs = manifestPath.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(manifestPath)
    val manifest =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    def field(name: String): Int = {
      val m = s""""$name":\\s*(\\d+)""".r.findFirstMatchIn(manifest)
      require(m.isDefined, s"AnnModel.load: manifest missing '$name' ($modelDir)")
      m.get.group(1).toInt
    }
    val (nlist, nsub, cbSize) = (field("nlist"), field("num_subspaces"), field("codebook_size"))
    val (dims, subDim) = (field("dims"), field("sub_dim"))
    val coarse = spark.read.parquet(s"$modelDir/coarse.parquet")
      .orderBy(col("cluster_id"))
      .select(col("cluster_id"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    require(coarse.length == nlist && coarse.map(_._1).toSeq == (0 until nlist),
      s"AnnModel.load: coarse table disagrees with manifest (nlist=$nlist, " +
        s"got ${coarse.length} rows) in $modelDir")
    require(coarse.forall(_._2.length == dims),
      s"AnnModel.load: coarse centroid width != manifest dims=$dims in $modelDir")
    val cb = spark.read.parquet(s"$modelDir/codebooks.parquet")
      .orderBy(col("sub"), col("cluster"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(cb.length == nsub * cbSize,
      s"AnnModel.load: codebook table disagrees with manifest " +
        s"(${nsub}x$cbSize, got ${cb.length} rows) in $modelDir")
    require(cb.forall(_._3.length == subDim),
      s"AnnModel.load: codebook centroid width != manifest sub_dim=$subDim in $modelDir")
    val codebooks = Array.tabulate(nsub) { m =>
      val rows = cb.filter(_._1 == m)
      require(rows.map(_._2).toSeq == (0 until cbSize),
        s"AnnModel.load: subspace $m cluster ids not dense in $modelDir")
      rows.map(_._3)
    }
    IvfPq(coarse.map(_._2), codebooks)
  }
}
