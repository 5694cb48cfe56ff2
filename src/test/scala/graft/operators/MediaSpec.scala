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

  test("mixed-format table: PNG re-encodes pair with their PPM twins; non-images flow to the error channel; dedup-apply keeps one per cluster") {
    // the q219 production shape in miniature: the SAME documents as
    // PPM (media_id = doc_id) and as PNG (media_id = doc_id + 100),
    // plus audio and undecodable rows in the same column
    val texts = Seq((1L, "the quick brown fox jumps over"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "sphinx of black quartz judge my vow"))
      .toDF("doc_id", "text")
    val mixed = Media.toPpm(texts)
      .union(Media.toPng(texts.withColumn("doc_id", $"doc_id" + 100)))
      .union(Media.toWav(texts.withColumn("doc_id", $"doc_id" + 200)))
      .union(texts.withColumn("doc_id", $"doc_id" + 300).select(
        $"doc_id".as("media_id"), lit("blob").as("kind"), lit("bin").as("format"),
        encode(concat(lit(" "), $"text"), "UTF-8").as("data")))
      .as[MediaRecord]

    // every PPM/PNG twin pairs at hamming 0 (aHash is format-blind);
    // WAV and blob rows never reach the pair table (error channel)
    val pairs = Media.imageNearDupPairs(mixed, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(Set((1L, 101L, 0), (2L, 102L, 0), (3L, 103L, 0)).subsetOf(pairs))
    assert(pairs.forall { case (a, b, _) => a <= 103 && b <= 103 })

    val errs = Media.imageAHash(mixed).toDF().filter(!col("ok"))
      .select($"media_id").collect().map(_.getLong(0)).toSet
    assert(errs === Set(201L, 202L, 203L, 301L, 302L, 303L))

    // dedup-apply over the clusters keeps ONE member per twin pair
    // (min id = the PPM copy) and every non-image row untouched
    val clusters = Dedup.connectedComponents(
      Media.imageNearDupPairs(mixed, maxHamming = 0), "id_a", "id_b")
    val ids = mixed.toDF().select($"media_id".as("doc_id"))
    val kept = Dedup.removeDuplicates(ids, "doc_id", clusters)
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept))
    assert(Set(101L, 102L, 103L).intersect(kept).isEmpty)
    assert(Set(201L, 202L, 203L, 301L, 302L, 303L).subsetOf(kept))
  }

}
