package graft.operators

import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{DOUBLE, INT32}

import org.apache.spark.sql.SparkSession

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
  *
  * I/O path (r22, guide §5 — the driver should do almost no data
  * work): these are KB-sized DRIVER-state tables, so save/load go
  * through parquet-hadoop directly (standard 3-level LIST schema, one
  * file per table) instead of launching four Spark jobs per lifecycle
  * step for a handful of rows — each publish/append/probe chain paid
  * ~1 s of pure job-scheduling overhead here at any corpus size. The
  * bytes stay ordinary parquet; [[load]] also accepts a Spark-written
  * DIRECTORY per table (the pre-r22 layout and any externally
  * rewritten model), reading every part file.
  */
object AnnModel {

  /** Coarse quantizer + per-subspace PQ codebooks, as the probe
    * operators consume them: `coarse(c)` = centroid c,
    * `codebooks(m)(c)` = centroid c of subspace m.
    */
  final case class IvfPq(
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]])

  private def vecField(name: String) =
    Types.requiredGroup().as(LogicalTypeAnnotation.listType())
      .addField(Types.repeatedGroup()
        .addField(Types.required(DOUBLE).named("element")).named("list"))
      .named(name)

  private val coarseSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("cluster_id"))
    .addField(vecField("centroid"))
    .named("spark_schema")
  private val cbSchema: MessageType = Types.buildMessage()
    .addField(Types.required(INT32).named("sub"))
    .addField(Types.required(INT32).named("cluster"))
    .addField(vecField("centroid"))
    .named("spark_schema")

  private def addVec(g: Group, name: String, v: Array[Double]): Unit = {
    val list = g.addGroup(name)
    v.foreach(x => list.addGroup("list").add("element", x))
  }

  private def readVec(g: Group, name: String): Array[Double] = {
    val list = g.getGroup(name, 0)
    Array.tabulate(list.getFieldRepetitionCount("list"))(i =>
      list.getGroup("list", i).getDouble("element", 0))
  }

  private def writeGroups(
      spark: SparkSession, path: Path, schema: MessageType,
      rows: Iterator[Group => Unit]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = path.getFileSystem(conf)
    // Spark's directory write was mode(overwrite); mirror it
    if (fs.exists(path)) fs.delete(path, true)
    val factory = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(path, conf))
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { fill =>
      val g = factory.newGroup(); fill(g); w.write(g)
    } finally w.close()
  }

  /** Every row group of `path` — a single parquet file, or a
    * Spark-written DIRECTORY of part files (pre-r22 models and
    * externally rewritten artifacts; AnnModelSpec rewrites one).
    */
  private def readGroups(spark: SparkSession, path: Path): Seq[Group] = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = path.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
          .sortBy(_.getName).toSeq
      else Seq(path)
    val out = ArrayBuffer.empty[Group]
    files.foreach { f =>
      val r = ParquetReader.builder(new GroupReadSupport(), f).withConf(conf).build()
      try {
        var g = r.read()
        while (g != null) { out += g; g = r.read() }
      } finally r.close()
    }
    out.toSeq
  }

  /** Writes `modelDir/coarse.parquet`, `modelDir/codebooks.parquet`,
    * `modelDir/manifest.json`. Tiny frames — one parquet file per
    * table, written directly (no Spark jobs).
    */
  def save(
      spark: SparkSession,
      modelDir: String,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Unit = {
    require(coarse.nonEmpty, "AnnModel.save: empty coarse quantizer")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "AnnModel.save: empty codebooks")
    writeGroups(spark, new Path(modelDir, "coarse.parquet"), coarseSchema,
      coarse.iterator.zipWithIndex.map { case (c, i) =>
        (g: Group) => { g.add("cluster_id", i); addVec(g, "centroid", c) }
      })
    val cbRows = for {
      (cents, m) <- codebooks.iterator.zipWithIndex
      (cv, c) <- cents.iterator.zipWithIndex
    } yield (g: Group) => {
      g.add("sub", m); g.add("cluster", c); addVec(g, "centroid", cv)
    }
    writeGroups(spark, new Path(modelDir, "codebooks.parquet"), cbSchema, cbRows)
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

  /** Reads a model dir written by [[save]] (or its pre-r22 Spark
    * directory-per-table form), validating shape against the manifest
    * so a truncated copy fails loudly instead of probing with a
    * silently-wrong quantizer.
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
    val coarse = readGroups(spark, new Path(modelDir, "coarse.parquet"))
      .map(g => (g.getInteger("cluster_id", 0), readVec(g, "centroid")))
      .sortBy(_._1)
    require(coarse.length == nlist && coarse.map(_._1) == (0 until nlist),
      s"AnnModel.load: coarse table disagrees with manifest (nlist=$nlist, " +
        s"got ${coarse.length} rows) in $modelDir")
    require(coarse.forall(_._2.length == dims),
      s"AnnModel.load: coarse centroid width != manifest dims=$dims in $modelDir")
    val cb = readGroups(spark, new Path(modelDir, "codebooks.parquet"))
      .map(g => (g.getInteger("sub", 0), g.getInteger("cluster", 0),
        readVec(g, "centroid")))
      .sortBy(t => (t._1, t._2))
    require(cb.length == nsub * cbSize,
      s"AnnModel.load: codebook table disagrees with manifest " +
        s"(${nsub}x$cbSize, got ${cb.length} rows) in $modelDir")
    require(cb.forall(_._3.length == subDim),
      s"AnnModel.load: codebook centroid width != manifest sub_dim=$subDim in $modelDir")
    val codebooks = Array.tabulate(nsub) { m =>
      val rows = cb.filter(_._1 == m)
      require(rows.map(_._2) == (0 until cbSize),
        s"AnnModel.load: subspace $m cluster ids not dense in $modelDir")
      rows.map(_._3).toArray
    }
    IvfPq(coarse.map(_._2).toArray, codebooks)
  }
}
