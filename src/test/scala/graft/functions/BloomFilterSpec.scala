package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

/** Bloom-filter build/probe (functions.BloomFilter) and the
  * bloom-prefiltered decontamination built on it
  * (Quality.decontaminateBloomKeep — oracle-gated end-to-end by q116).
  * Pins the properties the exactness argument rests on: NO false
  * negatives (every inserted key passes mightContain), bounded false
  * positives at the design point, and prefiltered ≡ exact on
  * adversarial corpora (empty bench, fully-contaminated corpus).
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val numBits = 1 << 16
  private val k = 4

  private def withHashes(df: org.apache.spark.sql.DataFrame) = {
    val (g1, g2) = BloomFilter.baseHashes(col("key"))
    df.withColumn("g1", g1).withColumn("g2", g2)
  }

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (0 until 2000).map(i => s"key-$i").toDF("key")
    val bloom = withHashes(keys)
      .agg(BloomFilter.bloomAgg(numBits, k)(col("g1"), col("g2")).as("bits"))
    val misses = withHashes(keys).crossJoin(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bits"), col("g1"), col("g2"), numBits, k))
      .count()
    assert(misses === 0L, "a Bloom filter must never miss an inserted key")
  }

  test("false-positive rate stays near the design point") {
    val inserted = (0 until 2000).map(i => s"in-$i").toDF("key")
    val probes = (0 until 10000).map(i => s"out-$i").toDF("key")
    val bloom = withHashes(inserted)
      .agg(BloomFilter.bloomAgg(numBits, k)(col("g1"), col("g2")).as("bits"))
    val fp = withHashes(probes).crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bits"), col("g1"), col("g2"), numBits, k))
      .count()
    // n=2000, m=2^16, k=4 -> theoretical fpr ~ (1-e^{-kn/m})^k ~ 1.2e-3;
    // allow a generous factor for hash non-ideality before failing
    assert(fp <= 100L, s"false-positive count $fp / 10000 far above design point")
  }

  test("g2 stride is odd (never a degenerate 0 stride)") {
    val bad = withHashes(Seq("a", "b", "", "x y z").toDF("key"))
      .filter(col("g2") % 2 === 0).count()
    assert(bad === 0L)
  }

  private def corpus = Seq[(Long, String)](
    (1L, "alpha bravo charlie delta echo foxtrot"),
    (2L, "alpha bravo charlie delta echo golf"),      // shares 5-gram with 100
    (3L, "totally different words in this document here"),
    (4L, "short doc"),                                 // < n tokens: whole-doc gram
    (5L, "")
  ).toDF("doc_id", "text")

  private def bench = Seq[(Long, String)](
    (100L, "alpha bravo charlie delta echo"),
    (101L, "short doc")
  ).toDF("doc_id", "text")

  test("bloom-prefiltered keep equals the exact no-shared-gram anti-join") {
    val kept = Quality.decontaminateBloomKeep(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    // 1 and 2 share the 5-gram "alpha bravo charlie delta echo";
    // 4 collides via the whole-doc gram of bench 101; 3 and 5 survive
    assert(kept === Set(3L, 5L))
  }

  test("empty bench keeps everything; bench ⊇ corpus keeps nothing") {
    val none = bench.filter(col("doc_id") < 0)
    val keptAll = Quality.decontaminateBloomKeep(corpus, none, "doc_id", "text", n = 5)
      .count()
    assert(keptAll === corpus.count())
    val keptNone = Quality.decontaminateBloomKeep(corpus, corpus, "doc_id", "text", n = 5)
      .count()
    assert(keptNone === 0L)
  }

  test("incremental index across batches equals the one-shot bloom keep") {
    val oneShot = Quality.decontaminateBloomKeep(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    for (batches <- Seq(
        Seq(bench.filter(col("doc_id") === 100), bench.filter(col("doc_id") === 101)),
        Seq(bench.filter(col("doc_id") === 101), bench.filter(col("doc_id") === 100)),
        Seq(bench, bench))) { // re-absorbing a suite is idempotent (OR + semi-join)
      val idx = tmpDir("bloom-idx")
      batches.foreach(b =>
        Quality.decontaminationIndexIncrement(b, "doc_id", "text", idx))
      val viaIndex = Quality.decontaminateWithIndex(corpus, "doc_id", "text", idx)
        .select("doc_id").as[Long].collect().toSet
      assert(viaIndex === oneShot)
    }
  }

  test("an index persisted under a different scheme is refused") {
    val idx = tmpDir("bloom-idx")
    Quality.decontaminationIndexIncrement(bench, "doc_id", "text", idx, n = 5)
    val e1 = intercept[IllegalStateException] {
      Quality.decontaminationIndexIncrement(bench, "doc_id", "text", idx, n = 4)
    }
    assert(e1.getMessage.contains("scheme"))
    val e2 = intercept[IllegalStateException] {
      Quality.decontaminateWithIndex(corpus, "doc_id", "text", idx, numBits = 1 << 16)
    }
    assert(e2.getMessage.contains("scheme"))
  }

  test("confirm join is a broadcast semi-join and the corpus side never shuffles") {
    val plan = Quality.decontaminateBloomKeep(corpus, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast bloom attach in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side sort-merge shuffle leaked into the decontamination plan:\n$plan")
  }
}
