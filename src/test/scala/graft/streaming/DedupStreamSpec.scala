package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The streaming twin of the incremental-dedup daily-drop loop:
  * incrementalDedupStream over micro-batches must agree EXACTLY with
  * the batch fold (dedupIncrementWithIndex + index += indexDelta) that
  * DedupPropertySpec pins and the q101 oracle hash-gates — survivors
  * AND final index state, including the load-bearing semantic that a
  * doc dropped in batch N never drops a doc in batch N+1.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // the DedupPropertySpec chain fixture: A (corpus) ~ B, B ~ C, A !~ C
  private val chainA = "one two three four five six seven eight nine ten eleven twelve"
  private val chainB = "four five six seven eight nine ten eleven twelve alpha beta gamma"
  private val chainC = "seven eight nine ten eleven twelve alpha beta gamma delta epsilon zeta"

  test("stream fold == batch fold: survivors, final index, and the dropped-doc-never-drops rule") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("dds")
    val corpusDir = s"$base/corpus"
    val indexDir = s"$base/index"
    // pre-seed day-0 state: an existing corpus and its band index
    // (16 bands of 2 rows — the chain test's recall-safe banding)
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, chainA)).toDF("doc_id", "text")
    existing.withColumn("batch_id", lit(-1L)).write.parquet(corpusDir)
    Dedup.minhashBandIndex(existing, "doc_id", "text", 32, 16).write.parquet(indexDir)
    // pre-seeded indexes must declare their scheme (the loop refuses
    // unstamped state — see the scheme-stamp tests below)
    Dedup.writeSchemeStamp(indexDir, spark.sessionState.newHadoopConf(),
      Dedup.signatureScheme(32, 16))

    val b1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // == corpus 1 -> drop
      (11L, "red orange yellow green blue indigo violet ultraviolet"), // novel -> keep
      (12L, "red orange yellow green blue indigo violet ultraviolet"), // == 11 -> drop
      (20L, chainB)) // ~ corpus 2 -> drop
    val b2 = Seq(
      (30L, chainC), // ~ DROPPED 20 only -> must SURVIVE (20 never entered the index)
      (31L, "red orange yellow green blue indigo violet ultraviolet"), // == b1 SURVIVOR 11 -> drop
      (32L, "fresh novel text that matches nothing at all anywhere")) // keep

    val input = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir, indexDir, tmpDir("dds-chk"), numHashes = 32, bands = 16)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpusOut = spark.read.parquet(corpusDir)
    val got = corpusOut.filter($"batch_id" >= 0)
      .select($"batch_id", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // semantic pin: 30 survives BECAUSE dropped docs never enter the
    // index; 31 drops against batch-1 survivor 11
    assert(got === Seq((0L, 11L), (1L, 30L), (1L, 32L)))

    // differential pin: the batch fold over the same day boundaries
    // must produce the same survivors AND the same final index rows
    var index: DataFrame = Dedup.minhashBandIndex(existing, "doc_id", "text", 32, 16)
      .localCheckpoint(true)
    var corpus = existing
    val batchSurvivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    Seq(b1, b2).foreach { b =>
      val r = Dedup.dedupIncrementWithIndex(
        corpus, index, b.toDF("doc_id", "text"), "doc_id", "text", 32, 16)
      batchSurvivors ++= r.survivors.select($"doc_id").collect().map(_.getLong(0))
      val newIndex = index.union(r.indexDelta).localCheckpoint(true)
      val newCorpus = corpus.union(r.survivors).localCheckpoint(true)
      graft.Checkpoints.release(r.indexDelta)
      graft.Checkpoints.release(index)
      index = newIndex
      corpus = newCorpus
    }
    assert(got.map(_._2) === batchSurvivors.sorted.toSeq)
    val streamIndex = spark.read.parquet(indexDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val batchIndex = index
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(streamIndex === batchIndex)
    graft.Checkpoints.release(index)
    graft.Checkpoints.release(corpus)
  }

  test("bootstrap without pre-seeded state: first batch dedups only within itself") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmpDir("dds2")
    val corpusDir = s"$base/corpus"
    val indexDir = s"$base/index"
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir, indexDir, tmpDir("dds2-chk"), numHashes = 32, bands = 16)
    try {
      input.addData(
        (5L, "only one of these two identical docs survives today"),
        (6L, "only one of these two identical docs survives today"),
        (7L, chainA))
      q.processAllAvailable()
      input.addData((8L, chainA)) // == survivor 7 -> drop
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(corpusDir)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(5L, 7L))
    // the index holds exactly the survivors' bands (16 per survivor)
    val idx = spark.read.parquet(indexDir)
    assert(idx.select($"doc").distinct().collect().map(_.getLong(0)).sorted.toSeq
      === Seq(5L, 7L))
    assert(idx.count() === 32L)
    // bootstrap stamped the index it created
    Dedup.requireSchemeStamp(indexDir, spark.sessionState.newHadoopConf(),
      Dedup.signatureScheme(32, 16))
  }

  test("scheme stamp: mismatched or missing stamp fails loudly, never silently merges") {
    implicit val sqlCtx = spark.sqlContext
    val hconf = spark.sessionState.newHadoopConf()
    val existing = Seq((1L, chainA)).toDF("doc_id", "text")

    // 1) an index stored under a DIFFERENT scheme (other banding shape
    // here; the r12 md5->poly_hash base switch is the historical case)
    val base1 = tmpDir("dds-scheme1")
    val indexDir1 = s"$base1/index"
    existing.withColumn("batch_id", lit(-1L)).write.parquet(s"$base1/corpus")
    Dedup.minhashBandIndex(existing, "doc_id", "text", 32, 8).write.parquet(indexDir1)
    Dedup.writeSchemeStamp(indexDir1, hconf, Dedup.signatureScheme(32, 8))
    val input1 = MemoryStream[(Long, String)]
    val q1 = EventStreams.incrementalDedupStream(
      input1.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base1/corpus", indexDir1, tmpDir("dds-s1-chk"), numHashes = 32, bands = 16)
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input1.addData((2L, chainA)); q1.processAllAvailable() } finally q1.stop()
    }
    assert(e1.getMessage.contains("incompatible band keys")
      || Option(e1.getCause).exists(_.getMessage.contains("incompatible band keys")))

    // 2) an UNSTAMPED pre-existing index: scheme unknowable -> refuse
    val base2 = tmpDir("dds-scheme2")
    val indexDir2 = s"$base2/index"
    existing.withColumn("batch_id", lit(-1L)).write.parquet(s"$base2/corpus")
    Dedup.minhashBandIndex(existing, "doc_id", "text", 32, 16).write.parquet(indexDir2)
    val input2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.incrementalDedupStream(
      input2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base2/corpus", indexDir2, tmpDir("dds-s2-chk"), numHashes = 32, bands = 16)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input2.addData((2L, chainA)); q2.processAllAvailable() } finally q2.stop()
    }
    assert(e2.getMessage.contains("no _signature_scheme.json stamp")
      || Option(e2.getCause).exists(_.getMessage.contains("no _signature_scheme.json stamp")))
  }
}
