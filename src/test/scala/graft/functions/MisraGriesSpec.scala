package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Quality

/** Misra–Gries candidate sketch + the exact heavy-hitters operator on
  * top of it (Quality.heavyHittersExact — oracle-gated end-to-end by
  * q119). The load-bearing property: the final output equals the
  * brute-force GROUP BY answer on every corpus shape tried, including
  * adversarial partitionings — the sketch can vary, the answer cannot.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame, support: Int): Set[(String, Long)] = {
    val terms = df.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val total = terms.count()
    terms.groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * support > total }.toSet
  }

  private def viaSketch(df: org.apache.spark.sql.DataFrame, support: Int, capacity: Int) =
    Quality.heavyHittersExact(df, "text", support, capacity)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("sketch path equals brute force on a skewed corpus") {
    // "hot" ~ 40%, "warm" ~ 20%, a long tail of singletons
    val docs = (
      Seq.fill(40)("hot") ++ Seq.fill(20)("warm") ++ (0 until 40).map(i => s"tail$i")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    for (support <- Seq(3, 4, 10); capacity <- Seq(support, 16)) {
      assert(viaSketch(docs, support, capacity) === bruteForce(docs, support),
        s"mismatch at support=$support capacity=$capacity")
    }
  }

  test("answer is invariant under adversarial partitioning") {
    // all hot tokens clustered in one partition vs spread out
    val rows = (Seq.fill(30)("popular") ++ (0 until 70).map(i => s"rare$i"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val spread = rows.toDF("doc_id", "text").repartition(8, col("doc_id"))
    val clustered = rows.sortBy(_._2).toDF("doc_id", "text").coalesce(1)
    val expected = Set(("popular", 30L))
    assert(viaSketch(spread, 5, 8) === expected)
    assert(viaSketch(clustered, 5, 8) === expected)
  }

  test("boundary: frequency exactly total/support is NOT a heavy hitter") {
    val docs = (Seq.fill(25)("edge") ++ Seq.fill(75)("filler"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    // edge = 25 of 100 = exactly total/4 -> strict > excludes it
    assert(viaSketch(docs, 4, 8) === Set(("filler", 75L)))
  }

  test("empty corpus yields an empty report") {
    val docs = Seq((0L, "x")).toDF("doc_id", "text").filter(col("doc_id") < 0)
    assert(viaSketch(docs, 4, 8) === Set.empty)
  }

  test("capacity below support is refused (containment bound would break)") {
    val docs = Seq((0L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Quality.heavyHittersExact(docs, "text", support = 8, capacity = 4)
    }
  }

  // ------------------------------------------------- incremental sketch

  private def incrementRun(batches: Seq[org.apache.spark.sql.DataFrame],
      capacity: Int, support: Int): Set[(String, Long)] = {
    val state = tmpDir("mg-state")
    val corpus = tmpDir("mg-corpus") + "/data"
    batches.foreach(b => Quality.heavyHittersIncrement(b, "text", state, corpus, capacity))
    Quality.heavyHittersFromSketch(
        spark.read.parquet(corpus), "text", spark.read.parquet(state), support)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("incremental sketch across batches equals single-pass exact output") {
    // adversarial split: ALL the heavy term's mass lands in batch 1,
    // batch 2 is pure tail — the merge must keep batch 1's candidate
    val b1 = (Seq.fill(30)("hot") ++ Seq.fill(10)("warm"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val b2 = (0 until 60).map(i => (1000L + i, s"tail$i")).toDF("doc_id", "text")
    val whole = b1.unionAll(b2)
    assert(incrementRun(Seq(b1, b2), capacity = 16, support = 3) ===
      viaSketch(whole, 3, 16))
    assert(incrementRun(Seq(b2, b1), capacity = 16, support = 3) ===
      viaSketch(whole, 3, 16), "batch arrival order must not change the answer")
  }

  test("a sketch persisted under a different scheme is refused") {
    val b = Seq((0L, "a b c")).toDF("doc_id", "text")
    val state = tmpDir("mg-state")
    val corpus = tmpDir("mg-corpus") + "/data"
    Quality.heavyHittersIncrement(b, "text", state, corpus, capacity = 16)
    val e = intercept[IllegalStateException] {
      Quality.heavyHittersIncrement(b, "text", state, corpus, capacity = 32)
    }
    assert(e.getMessage.contains("scheme"))
  }
}
