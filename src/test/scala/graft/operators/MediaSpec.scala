package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Media.{MediaFeatures, MediaRecord}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "aaaa"), (1L, "bbbbbbbb"), (2L, "cccccccccccc"), (3L, "dd"))
    .toDF("doc_id", "text")

  test("fromDocuments builds opaque binary payloads with cycling kinds") {
    val m = Media.fromDocuments(docs).orderBy($"media_id").collect()
    assert(m.map(_.getAs[String]("kind")).toSeq ===
      Seq("image", "audio", "video", "image"))
    assert(m.head.getAs[Array[Byte]]("data") === "aaaa".getBytes("UTF-8"))
  }

  test("decodeFeatures fallback profile: non-image payloads get the documented byte arithmetic") {
    val media = Media.fromDocuments(docs).as[MediaRecord].repartition(2)
    val feats = Media.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length === 4)
    val f0 = feats.head
    assert(f0 === MediaFeatures(0L, "image", 4L, 5, 5, 40L, 97.0))
    // byte_mean is a real (non-stub) payload digest
    assert(feats(1).byte_mean === 98.0)
  }

  test("sampleFrames slices bytes at deterministic offsets") {
    val media = Seq((9L, "video", "mp4", "0123456789abcdefghij".getBytes("UTF-8")))
      .toDF("media_id", "kind", "format", "data")
    val frames = Media.sampleFrames(media, n = 2, frameBytes = 4)
      .orderBy($"frame_no").collect()
    assert(frames.length === 2)
    assert(new String(frames(0).getAs[Array[Byte]]("frame")) === "0123")
    assert(frames(1).getAs[Int]("offset") === 16)
    assert(new String(frames(1).getAs[Array[Byte]]("frame")) === "ghij")
  }

  test("withTargetSize scales metadata preserving aspect ratio") {
    val feats = Seq((1L, 640, 480)).toDF("media_id", "width", "height")
    val r = Media.withTargetSize(feats, maxDim = 320).collect().head
    assert(r.getAs[Int]("target_width") === 320)
    assert(r.getAs[Int]("target_height") === 240)
  }
}
