package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample stages of a media training-data pipeline.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shape,
  * typed Dataset surface — while the codec itself is a STUB (this
  * environment has no image/audio libraries): `decodeFeatures` derives
  * deterministic fake features from the raw bytes. Swapping the stub
  * for a real decoder changes ONE function body and nothing about the
  * distributed plan.
  *
  * Scale notes: decode runs via `mapPartitions` so a real decoder
  * amortizes per-partition init (model load, codec context) the same
  * way mapInPandas batches do; binary payloads stay columnar in parquet
  * and are never shuffled (features are extracted before any wide op).
  */
object Media {

  /** Typed media record: opaque payload + the metadata a real ingest
    * would carry alongside it.
    */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      format: String, // e.g. png | wav | mp4
      data: Array[Byte])

  /** Extracted (stub) features; the schema a real decoder would fill. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // image-ish: fake dimensions decoded from the payload
      width: Int,
      height: Int,
      // audio/video-ish: fake duration
      duration_ms: Long,
      // content digest of the payload (real, not stubbed)
      byte_mean: Double)

  /** Documents -> opaque media table: deterministic reinterpretation of
    * the text payload as bytes, with kind/format cycling by doc_id.
    * This is the ingest-shape adapter used by tests and queries (the
    * testdata ships no binary table; payload bytes must still come from
    * driver data, not synthesized noise).
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val kind = element_at(
      typedLit(Seq("image", "audio", "video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val fmt = element_at(
      typedLit(Seq("png", "wav", "mp4")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      fmt.as("format"),
      encode(col("text"), "UTF-8").as("data"))
  }

  /** STUB decode: deterministic fake features from raw bytes.
    * A real implementation would replace the body with an actual codec
    * call per record (the `???` boundary); everything around it — the
    * per-partition iterator, the typed output, the partition-parallel
    * execution — is the production plumbing.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens HERE in a real decoder (codec
      // contexts, model weights); the stub needs none.
      it.map { m =>
        val n = m.data.length.toLong
        // ---- STUB decode (deterministic fake; replace with codec) ----
        val w = (n % 640 + 1).toInt
        val h = (n % 480 + 1).toInt
        val dur = n * 10
        val mean = if (n == 0) 0d else m.data.map(b => (b & 0xff).toDouble).sum / n
        // --------------------------------------------------------------
        MediaFeatures(m.media_id, m.kind, n, w, h, dur, mean)
      }
    }
  }

  /** Deterministic frame sampling: n evenly-spaced fixed-width byte
    * slices of the payload (the plumbing of video frame extraction:
    * same output schema, same explode shape a real demuxer would
    * produce). Pure Catalyst expressions — no UDF.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val len = length(col("data"))
    val frames = transform(sequence(lit(0), lit(n - 1)), i => {
      val offset = floor(i * greatest(len - frameBytes, lit(0)) /
        lit(math.max(n - 1, 1))).cast("int")
      struct(i.as("frame_no"),
        offset.as("offset"),
        col("data").substr(offset + 1, lit(frameBytes)).as("frame"))
    })
    media.select(col("media_id"), col("kind"), explode(frames).as("f"))
      .select(col("media_id"), col("kind"),
        col("f.frame_no"), col("f.offset"), col("f.frame"))
  }

  /** Metadata "resize": pure plan-side transform a real pipeline uses to
    * propagate target dimensions to the decode stage (no byte work).
    */
  def withTargetSize(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }
}
