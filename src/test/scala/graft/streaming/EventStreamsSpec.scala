package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, java.sql.Timestamp, Double)]) =
    rows.toDF("user_id", "event_id", "ts", "value")

  // realistic base: event times at/near epoch 0 sit below Spark's
  // INITIAL stream watermark (0) and interval-join state math drops
  // them — a real pipeline never has 1970 event times, tests shouldn't
  private val baseMs = 1700000400000L // multiple of 10 min: window-aligned
  private def ts(min: Int) = new java.sql.Timestamp(baseMs + min * 60000L)

  test("sessionizeBatch splits on the inactivity gap") {
    val ev = mkEvents(Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 1.0), // session 1
      (1L, 3L, ts(50), 1.0), // gap 40 > 30 => session 2
      (2L, 4L, ts(0), 1.0))) // separate user
    val got = EventStreams.sessionizeBatch(ev, gapMin = 30)
      .orderBy($"user_id", $"session_no")
      .select($"user_id", $"session_no", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("windowedCounts works identically on batch input") {
    val ev = mkEvents(Seq(
      (1L, 1L, ts(1), 2.0), (1L, 2L, ts(8), 3.0), // window [0,10)
      (2L, 3L, ts(12), 4.0))) // window [10,20)
      .withColumn("event_type", lit("click"))
    val got = EventStreams.windowedCounts(ev, "10 minutes", "1 hour")
      .orderBy($"window_start").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_events") === 2)
    assert(got(0).getAs[Double]("total_value") === 5.0)
    assert(got(1).getAs[Long]("n_events") === 1)
  }

  /** With ProcessingTimeTimeout the engine always schedules another
    * micro-batch (any group could time out), so noNewData is never
    * set and processAllAvailable would hang — poll the sink instead.
    */
  private def awaitRows(table: String, n: Long, timeoutMs: Long = 30000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n) {
      assert(System.currentTimeMillis() < deadline,
        s"$table did not reach $n rows in ${timeoutMs}ms")
      Thread.sleep(100L)
    }
  }

  test("sessionizeStream (flatMapGroupsWithState) matches sessionizeBatch on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = EventStreams.sessionizeStream(input.toDS(), gapMin = 30)
    val q = sessions.writeStream.format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .queryName("sessions_out").outputMode("append").start()
    try {
      val us = 60L * 1000000L
      // batch 1: two events 10min apart (one open session)
      input.addData((1L, 0L * us), (1L, 10L * us))
      // batch 2: event 60min later => closes session 1, opens session 2
      input.addData((1L, 70L * us))
      awaitRows("sessions_out", 1L)
      val got = spark.table("sessions_out")
        .orderBy($"user_id", $"session_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === Seq((1L, 0L, 10L * us, 2L)))

      // the same prefix through the batch path agrees on the closed session
      val batchEv = mkEvents(Seq(
        (1L, 1L, ts(0), 0.0), (1L, 2L, ts(10), 0.0), (1L, 3L, ts(70), 0.0)))
      val batch = EventStreams.sessionizeBatch(batchEv, gapMin = 30)
        .orderBy($"session_no").collect()
      assert(batch.length === 2)
      assert(unixMicros(batch(0).getTimestamp(2)) === baseMs * 1000L)
      assert(unixMicros(batch(0).getTimestamp(3)) === baseMs * 1000L + 10L * us)
      assert(batch(0).getAs[Long]("n_events") === 2L)
    } finally q.stop()
  }

  test("sessionizeStream flushes the open session on processing-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = EventStreams.sessionizeStreamMs(input.toDS(), gapMs = 300L)
    val q = sessions.writeStream.format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .queryName("sessions_timeout_out").outputMode("append").start()
    try {
      // the session stays open after its events arrive; once the gap
      // elapses in processing time, the timeout alone must flush it —
      // no further event for ANY user is fed
      input.addData((1L, 1000L), (1L, 2000L))
      awaitRows("sessions_timeout_out", 1L)
      val got = spark.table("sessions_timeout_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === Seq((1L, 1000L, 2000L, 2L)))
    } finally q.stop()
  }

  test("enrichStream attaches dimension attrs; unmatched keys survive with nulls") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = EventStreams.enrichStream(
      input.toDS().toDF("user_id", "event_type"), dim, "user_id")
    val q = enriched.writeStream.format("memory")
      .queryName("enriched_out").outputMode("append").start()
    try {
      input.addData((1L, "click"), (3L, "click"))
      q.processAllAvailable()
      val got = spark.table("enriched_out").orderBy($"user_id")
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      assert(got.toSeq === Seq((1L, "click", Some("gold")), (3L, "click", None)))
    } finally q.stop()
  }

  test("fileStream + Trigger.AvailableNow drains a parquet drop directory") {
    val dir = tmpDir("stream-in")
    val out = tmpDir("stream-chk")
    val ev = mkEvents(Seq((1L, 1L, ts(0), 1.0), (2L, 2L, ts(5), 2.0)))
      .withColumn("event_type", lit("click"))
    ev.write.mode("overwrite").parquet(dir)
    val stream = EventStreams.fileStream(spark, dir, ev.schema)
    val agg = EventStreams.windowedCounts(stream, "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("drain_out")
      .outputMode("complete")
      .option("checkpointLocation", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("drain_out").collect()
    assert(got.map(_.getAs[Long]("n_events")).sum === 2)
  }

  private def unixMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  test("publishByDay lands date-partitioned parquet and batch queries prune partitions") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("publish-out")
    val chk = tmpDir("publish-chk")
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.publishByDay(
      input.toDF().toDF("user_id", "event_id", "ts"), out, chk)
    try {
      input.addData((1L, 1L, ts(0)), (2L, 2L, ts(24 * 60))) // two days
      q.processAllAvailable()
    } finally q.stop()

    val published = spark.read.parquet(out)
    assert(published.count() === 2)
    // a day filter must reach the scan as a PartitionFilter, not a data filter
    val day1 = published.filter(org.apache.spark.sql.functions.col("day") ===
      new java.sql.Date(baseMs))
    day1.collect()
    val plan = day1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter not applied as partition filter:\n$plan")
    assert(day1.count() === 1)
  }

  test("dedupEvents drops within-watermark repeats on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val deduped = EventStreams.dedupEvents(
      input.toDF().toDF("user_id", "event_id", "ts"), "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((1L, 100L, ts(0)), (1L, 100L, ts(1)), (1L, 101L, ts(2)))
      q.processAllAvailable()
      input.addData((1L, 100L, ts(3))) // still a dup within horizon
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 100L), (1L, 101L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDur = "1 hour", windowDur = "10 MINUTES")
    val q = joined.writeStream.format("memory")
      .queryName("attr_out").outputMode("append").start()
    try {
      clicks.addData((1L, 1L, ts(0)), (2L, 2L, ts(0)))
      purchases.addData((1L, 10L, ts(5)),  // within 10 min of click 1
        (1L, 11L, ts(30)),                 // too late
        (2L, 12L, ts(9)))                  // within, other user
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      assert(got.toSet === Set((1L, 1L, 10L), (2L, 2L, 12L)))
    } finally q.stop()
  }

  test("left-outer interval join emits abandoned clicks with nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      watermarkDur = "10 minutes", windowDur = "10 MINUTES", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("outer_attr_out").outputMode("append").start()
    try {
      clicks.addData((1L, 1L, ts(0)), (2L, 2L, ts(0)))
      purchases.addData((1L, 10L, ts(5))) // user 1 converts; user 2 never does
      q.processAllAvailable()
      // advance both watermarks far past click+window so the engine can
      // PROVE click 2 is unmatched (outer rows only emit then)
      clicks.addData((9L, 99L, ts(120)))
      purchases.addData((9L, 98L, ts(120)))
      q.processAllAvailable()
      clicks.addData((9L, 97L, ts(180))) // one more batch to flush state
      purchases.addData((9L, 96L, ts(180)))
      q.processAllAvailable()
      val got = spark.table("outer_attr_out").collect()
        .map(r => (r.getAs[Long]("click_id"),
          if (r.isNullAt(r.fieldIndex("purchase_id"))) None
          else Some(r.getAs[Long]("purchase_id"))))
        .toMap
      assert(got(1L) === Some(10L))
      assert(got.contains(2L) && got(2L) === None,
        s"abandoned click should have emitted with null purchase: $got")
    } finally q.stop()
  }

  test("runningCountsBatch: cumulative per-user counts in (ts, event_id) order") {
    val ev = mkEvents(Seq(
      (1L, 3L, ts(2), 1.0), (1L, 1L, ts(0), 1.0), (1L, 2L, ts(1), 1.0),
      (2L, 4L, ts(0), 1.0),
      // same-timestamp tie: event_id must break it deterministically
      (3L, 6L, ts(5), 1.0), (3L, 5L, ts(5), 1.0)))
    val got = EventStreams.runningCountsBatch(ev)
      .orderBy($"user_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L),
      (2L, 4L, 1L),
      (3L, 5L, 1L), (3L, 6L, 2L)))
  }

  test("runningCountsBatch final count per user matches the streaming processor's latest emit") {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = Seq((1L, 10L), (1L, 11L), (2L, 20L), (1L, 12L), (3L, 30L))
      val input = MemoryStream[(Long, Long)]
      val q = EventStreams.runningCounts(input.toDS()).writeStream.format("memory")
        .queryName("rc_equiv_out").outputMode("update").start()
      try {
        input.addData(rows: _*)
        q.processAllAvailable()
        val streamFinal = spark.table("rc_equiv_out")
          .groupBy($"user_id").agg(max($"running_count").as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // batch twin over the same rows (synthetic distinct ts/event ids)
        val ev = mkEvents(rows.zipWithIndex.map { case ((u, e), i) => (u, e, ts(i), 1.0) })
        val batchFinal = EventStreams.runningCountsBatch(ev)
          .groupBy($"user_id").agg(max($"running_count").as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(batchFinal === streamFinal)
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedupEvents on batch input collapses key repeats to distinct-on-keys") {
    val ev = mkEvents(Seq(
      (1L, 100L, ts(0), 1.0), (1L, 100L, ts(1), 2.0), // repeat delivery
      (1L, 101L, ts(2), 3.0),
      (2L, 100L, ts(0), 4.0))) // same event_id, other user: kept
    val got = EventStreams.dedupEvents(ev, "1 hour")
      .select($"user_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((1L, 100L), (1L, 101L), (2L, 100L)))
  }

  test("runningCounts (transformWithState + RocksDB state store) accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long)]
      val counts = EventStreams.runningCounts(input.toDS())
      val q = counts.writeStream.format("memory")
        .queryName("running_counts_out").outputMode("update").start()
      try {
        input.addData((1L, 10L), (1L, 11L), (2L, 20L))
        q.processAllAvailable()
        input.addData((1L, 12L), (3L, 30L))
        q.processAllAvailable()
        // per-key LATEST emitted count must equal the total seen
        val got = spark.table("running_counts_out")
          .groupBy($"user_id").agg(org.apache.spark.sql.functions.max($"running_count"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
