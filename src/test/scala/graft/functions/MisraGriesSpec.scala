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
    Quality.heavyHittersFromState(spark.read.parquet(corpus), "text", state, support)
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

  test("replayed batch ids are idempotent: sketch and corpus state unchanged") {
    // foreachBatch is at-least-once — a crash after the head commit
    // replays the same (batchId, data); the increment must converge
    // to exactly-once observable state, not double-count
    val state = tmpDir("mg-replay-state")
    val corpus = tmpDir("mg-replay-corpus") + "/data"
    val b0 = (Seq.fill(10)("hot") ++ Seq.fill(5)("warm"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val b1 = (0 until 8).map(i => (100L + i, s"tail$i")).toDF("doc_id", "text")
    Quality.heavyHittersIncrement(b0, "text", state, corpus, 16, batchId = Some(0L))
    Quality.heavyHittersIncrement(b1, "text", state, corpus, 16, batchId = Some(1L))
    val sketchBefore = Quality.readSketch(spark, state)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val corpusBefore = spark.read.parquet(corpus).count()
    // full replay of both batches (e.g. checkpoint rolled back)
    Quality.heavyHittersIncrement(b0, "text", state, corpus, 16, batchId = Some(0L))
    Quality.heavyHittersIncrement(b1, "text", state, corpus, 16, batchId = Some(1L))
    val sketchAfter = Quality.readSketch(spark, state)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sketchAfter === sketchBefore, "replay changed the sketch (double-count)")
    assert(spark.read.parquet(corpus).count() === corpusBefore,
      "replay appended duplicate corpus rows")
  }

  test("a half-committed batch (corpus landed, head not flipped) replays cleanly") {
    // simulate a crash between the corpus partition write and the head
    // commit: replaying the SAME batch id must overwrite the partition
    // in place and absorb the batch into the sketch exactly once
    val state = tmpDir("mg-crash-state")
    val corpus = tmpDir("mg-crash-corpus") + "/data"
    val b0 = Seq((0L, "alpha alpha beta")).toDF("doc_id", "text")
    Quality.heavyHittersIncrement(b0, "text", state, corpus, 16, batchId = Some(0L))
    val b1 = Seq((1L, "alpha gamma")).toDF("doc_id", "text")
    // crash simulation: batch 1's corpus partition lands but the
    // sketch/head never commit
    b1.write.mode("overwrite").parquet(s"$corpus/batch_id=1")
    // replay of batch 1 end-to-end
    Quality.heavyHittersIncrement(b1, "text", state, corpus, 16, batchId = Some(1L))
    val viaState = Quality.heavyHittersFromState(
        spark.read.parquet(corpus), "text", state, support = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val whole = b0.unionAll(b1)
    val oneShot = Quality.heavyHittersExact(whole, "text", support = 2, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaState === oneShot)
    assert(spark.read.parquet(corpus).count() === 2L, "partition overwrite duplicated rows")
  }

  test("read path refuses a support finer than the persisted capacity") {
    val state = tmpDir("mg-cap-state")
    val corpus = tmpDir("mg-cap-corpus") + "/data"
    val b = Seq((0L, "a b c")).toDF("doc_id", "text")
    Quality.heavyHittersIncrement(b, "text", state, corpus, capacity = 8)
    val e = intercept[IllegalArgumentException] {
      Quality.heavyHittersFromState(spark.read.parquet(corpus), "text", state, support = 16)
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("sketch generations are swapped, not overwritten in place") {
    // the previous generation must survive the commit of the next one
    // (crash mid-write of gen N+1 cannot lose gen N), and older gens
    // are retired
    val state = tmpDir("mg-gen-state")
    val corpus = tmpDir("mg-gen-corpus") + "/data"
    def gens(): Set[String] = {
      val d = new java.io.File(state)
      d.listFiles().map(_.getName).filter(_.startsWith("gen-")).toSet
    }
    Quality.heavyHittersIncrement(Seq((0L, "a")).toDF("doc_id", "text"), "text", state, corpus, 8)
    assert(gens() === Set("gen-0"))
    Quality.heavyHittersIncrement(Seq((1L, "b")).toDF("doc_id", "text"), "text", state, corpus, 8)
    assert(gens() === Set("gen-0", "gen-1"), "previous generation must be retained")
    Quality.heavyHittersIncrement(Seq((2L, "c")).toDF("doc_id", "text"), "text", state, corpus, 8)
    assert(gens() === Set("gen-1", "gen-2"), "older generations must be retired")
  }
}
