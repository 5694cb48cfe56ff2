package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream.
  *
  * Design: every transform is written against a plain DataFrame so the
  * SAME function runs in batch (testdata parquet) and streaming
  * (readStream) — the streaming test harness pins batch/stream
  * equivalence, which is the property that matters when a 100 TB
  * backfill (batch) and the live pipeline (stream) must agree.
  *
  * The reference's only "streaming" is a daily file-level poll
  * (reference .github/workflows/process-changesets-r2.yml:35-65); its
  * Spark-native analog is a file-source stream with
  * Trigger.AvailableNow — covered by `fileStream` below. Event-time
  * windows/watermarks/sessionization are the engine-growth surface on
  * top (SURVEY.md §7 phase 5).
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark for state
    * eviction. Works on batch input too (watermark is a no-op there).
    */
  def windowedCounts(events: DataFrame, windowDur: String, watermarkDur: String): DataFrame =
    events
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("double")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Batch sessionization: sessions split on inactivity gaps > gapMin
    * minutes per user. One shuffle on user_id; two window passes over
    * the same partitioning (Catalyst reuses the sort).
    */
  def sessionizeBatch(events: DataFrame, gapMin: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMin.toLong * 60L * 1000000L
    val withNew = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withNew.groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Public (not private) so the state Encoder's generated code can
    * construct it on executors.
    */
  case class SessionState(start: Long, end: Long, n: Long)

  /** Streaming sessionization with explicit state: same semantics as
    * sessionizeBatch when the input arrives in event-time order —
    * flatMapGroupsWithState with a processing-time timeout emits a
    * session once its inactivity gap passes.
    *
    * Emits (user_id, session_start_us, session_end_us, n_events).
    */
  def sessionizeStream(
      events: Dataset[(Long, Long)], // (user_id, ts_us), pre-sorted per micro-batch
      gapMin: Int): DataFrame =
    sessionizeStreamMs(events, gapMin.toLong * 60L * 1000L)

  /** Millisecond-gap form (the minute form delegates here; ms
    * granularity keeps the processing-time timeout testable).
    */
  def sessionizeStreamMs(
      events: Dataset[(Long, Long)],
      gapMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[List[SessionState], (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (user, rows, state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // inactivity gap elapsed in processing time: flush the
            // open session (otherwise a user's final session would
            // only ever surface on their next event)
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            open.iterator.map(s => (user, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            val init = state.getOption.getOrElse(Nil)
            // fold events into the open session; close on gap
            val (closed, open) = sorted.foldLeft((List.empty[SessionState], init.headOption)) {
              case ((done, None), t) => (done, Some(SessionState(t, t, 1)))
              case ((done, Some(s)), t) if t - s.end > gapUs =>
                (s :: done, Some(SessionState(t, t, 1)))
              case ((done, Some(s)), t) =>
                (done, Some(s.copy(end = t, n = s.n + 1)))
            }
            state.update(open.toList)
            state.setTimeoutDuration(gapUs / 1000L)
            closed.reverseIterator.map(s => (user, s.start, s.end, s.n))
          }
      }
      .toDF("user_id", "session_start_us", "session_end_us", "n_events")
  }

  /** Running per-user event counter on the transformWithState API —
    * Spark 4's arbitrary-state evolution of mapGroupsWithState (typed
    * state handles, TTL support, timers decoupled from output mode).
    * Emits (user_id, running_count) on every update. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`), which is also the provider
    * a production deployment wants: state spills to disk instead of
    * executor heap, so per-key state survives 100 TB-scale key
    * cardinalities.
    */
  def runningCounts(events: Dataset[(Long, Long)]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "running_count")
  }

  /** Batch twin of runningCounts: the cumulative per-user event count
    * each event would observe if it arrived alone, in event-time order
    * (ties broken on event_id — the order a single-event-per-batch
    * stream delivers). One shuffle on user_id; the running count is a
    * frame-bounded window aggregate, no state store needed in batch.
    * The batch/stream equivalence spec pins this against the
    * transformWithState processor; the SQL oracle gates it exactly.
    */
  def runningCountsBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("running_count", count(lit(1)).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Exactly-once event dedup for at-least-once sources: drops repeats
    * of (user_id, event_id) arriving within the watermark horizon.
    * State is bounded by the watermark (the unbounded-state footgun of
    * plain dropDuplicates on a stream). Batch behavior: plain
    * distinct-on-keys — Spark rejects dropDuplicatesWithinWatermark on
    * batch plans outright, so the batch twin branches explicitly (the
    * horizon is vacuous when the whole input is present at once; a
    * backfill and the live stream agree on any input the stream
    * dedups, which is what the q81 oracle row pins).
    */
  def dedupEvents(events: DataFrame, watermarkDur: String): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermarkDur)
        .dropDuplicatesWithinWatermark("user_id", "event_id")
    else events.dropDuplicates("user_id", "event_id")

  /** Stream-stream interval join: purchases attributed to the click
    * that preceded them by at most `windowDur` per user (the streaming
    * twin of q17's banded range join). Both sides carry watermarks so
    * join state evicts; the time-bound predicate is what makes the
    * state finite.
    */
  def clickPurchaseJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      watermarkDur: String,
      windowDur: String,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDur)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDur)
    // left_outer: a click with no purchase in its window EMITS with
    // nulls — but only once the watermark proves no match can still
    // arrive (correct abandonment semantics, not a timeout guess)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowDur"),
      joinType)
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** Stream-static enrichment: attach dimension attributes to a
    * stream by key. STATELESS — the static side is broadcast to every
    * task, so no join state accumulates and no watermark is needed
    * (unlike stream-stream joins). Left outer keeps events whose key
    * is missing from the dimension (nulls, not drops): an enrichment
    * gap must not silently lose fact rows. At scale the dimension is
    * re-broadcast per micro-batch, picking up slowly-changing updates
    * batch-granularly.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** foreachBatch publish sink: lands each micro-batch as date-
    * partitioned parquet (append), giving the lakehouse layout
    * downstream batch queries prune on — the streaming half of the
    * Pipeline publish contract. Batch id is recorded per row so
    * replayed batches are idempotently identifiable.
    */
  def publishByDay(stream: DataFrame, outDir: String, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .withColumn("day", to_date(col("ts")))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append")
          .partitionBy("day")
          .parquet(outDir)
      }
      .start()

  /** The daily-drop dedup loop as an ACTUAL stream — the streaming
    * twin of q101's two-batch fold. Each micro-batch runs
    * [[graft.operators.Dedup.dedupIncrementWithIndex]] against the
    * accumulated state and then ADVANCES it: the survivor corpus and
    * the LSH band index live as evolving parquet tables (`corpusDir`,
    * `indexDir`), and each batch appends its survivors and its
    * `indexDelta` — dropped docs never enter the index, so a later
    * batch is deduped against survivors only, exactly the per-arrival
    * rule DedupPropertySpec pins for the batch fold.
    *
    * Scale shape (unchanged from the batch operator): only the
    * micro-batch is signatured; the corpus state is touched by an
    * id-only equi-join on the prebuilt index plus a left-semi
    * candidate re-shingle — per-batch cost scales with batch size and
    * near-dup density, never corpus size. State on disk (not in the
    * state store) is deliberate: a 100 TB survivor corpus belongs in
    * the lakehouse where downstream batch queries read it, not in
    * RocksDB.
    *
    * Bootstrap: missing dirs mean an empty corpus — or pre-seed them
    * with an existing corpus and its [[graft.operators.Dedup.minhashBandIndex]]
    * to dedup the stream against history (pre-seeded indexes MUST be
    * stamped with [[graft.operators.Dedup.writeSchemeStamp]]; the loop
    * refuses an index whose signature scheme is unknown or differs —
    * mismatched band keys would silently pass every near-dup).
    * Delivery: appends are
    * at-least-once on failure/replay (`batch_id` is recorded per
    * survivor row, publishByDay's idempotence convention); a
    * transactional table format would make them exactly-once without
    * changing this loop.
    */
  def incrementalDedupStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpusDir: String,
      indexDir: String,
      checkpoint: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val hconf = s.sessionState.newHadoopConf()
        // bootstrap = missing OR empty dir (a created-but-unwritten
        // state dir has no parquet footers to infer a schema from)
        def exists(dir: String): Boolean = {
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(hconf)
          fs.exists(p) && fs.listStatus(p).nonEmpty
        }
        val corpus =
          if (exists(corpusDir)) s.read.parquet(corpusDir).select(col(idCol), col(textCol))
          else batch.limit(0).select(col(idCol), col(textCol))
        // an index persisted under a DIFFERENT signature scheme (e.g.
        // built before a base-hash change) would share no band keys
        // with this loop's bands and silently pass every near-dup —
        // the stamp check turns that into a loud failure
        val scheme = graft.operators.Dedup.signatureScheme(numHashes, bands)
        val index =
          if (exists(indexDir)) {
            graft.operators.Dedup.requireSchemeStamp(indexDir, hconf, scheme)
            s.read.parquet(indexDir)
          } else graft.operators.Dedup.minhashBandIndex(
            batch.limit(0), idCol, textCol, numHashes, bands)
        val r = graft.operators.Dedup.dedupIncrementWithIndex(
          corpus, index, batch, idCol, textCol, numHashes, bands, threshold)
        // materialize the day-boundary state once, free the
        // increment's internals, THEN append — the writes must not
        // re-execute the candidate+verify pipeline per sink
        val surv = r.survivors.localCheckpoint(true)
        val delta = r.indexDelta.localCheckpoint(true)
        graft.Checkpoints.release(r.indexDelta)
        surv.withColumn("batch_id", lit(batchId)).write.mode("append").parquet(corpusDir)
        delta.write.mode("append").parquet(indexDir)
        // (re-)stamp after every append: idempotent, and the first
        // append is what creates the dir on bootstrap
        graft.operators.Dedup.writeSchemeStamp(indexDir, hconf, scheme)
        graft.Checkpoints.release(surv)
        graft.Checkpoints.release(delta)
      }
      .start()

  /** Streaming heavy-hitter monitor: each micro-batch folds into the
    * persisted scheme-stamped Misra–Gries sketch and lands in the
    * corpus store ([[graft.operators.Quality.heavyHittersIncrement]])
    * — per-batch work is one bounded-state aggregation over the batch
    * plus a ≤2·capacity-row merge; history is NEVER re-tokenized. Read
    * side: [[graft.operators.Quality.heavyHittersFromState]] at any
    * time, exact by the mergeable-summaries containment bound
    * (HeavyHitterStreamSpec pins stream ≡ batch ≡ one-shot; q124
    * hash-gates the same fold at the batch boundary). Same lakehouse-
    * state rationale as [[incrementalDedupStream]]: the corpus belongs
    * in parquet where confirm passes and downstream batch queries read
    * it, not in the streaming state store.
    *
    * Delivery: foreachBatch is at-least-once, so the batch id is
    * threaded into the increment — a replayed id at or below the
    * committed head is skipped and the corpus write is a per-batch
    * partition overwrite, making the observable state exactly-once
    * (the increment's head pointer is the commit point).
    */
  def heavyHittersStream(
      docs: DataFrame,
      textCol: String,
      stateDir: String,
      corpusDir: String,
      checkpoint: String,
      capacity: Int = 256): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Quality.heavyHittersIncrement(
          batch.toDF(), textCol, stateDir, corpusDir, capacity, batchId = Some(batchId))
      }
      .start()

  /** Streaming count-min monitor — the CMS sibling of
    * [[heavyHittersStream]]: each micro-batch's token stream folds
    * into the persisted linear sketch
    * ([[graft.operators.Quality.countMinIncrement]]). Per-batch work
    * is one bounded-state aggregation over the batch plus a one-row
    * d*w cell add; history is never revisited, and because CMS is
    * linear the resulting state is BIT-IDENTICAL to a one-shot build
    * over everything streamed (CountMinStreamSpec pins stream ≡
    * batch; q155 hash-gates the same fold at the batch boundary).
    * At-least-once replays are skipped via the committed head's batch
    * id, exactly as in the MG stream.
    */
  /** Streaming export absorb — the daily-drop loop for the TRAINING
    * artifact composed from gated parts: each micro-batch of curated
    * documents appends into the committed sharded export
    * ([[graft.sources.Export.appendShardsWithManifest]] — its own
    * seeded permutation taking the next positions, partial-shard
    * completion in place, O(batch) writes, untouched shards
    * byte-identical). Delivery is at-least-once: the manifest's
    * last_batch_id makes a committed replay a no-op and a
    * half-committed replay converges (the append contract). The
    * per-batch seed is baseSeed + batchId + 1, a pure function of the
    * batch id — the whole growing artifact stays replayable from
    * manifest recipes alone, and [[graft.sources.Export.verifyShards]]
    * read-back-gates it at any point. Bootstrap:
    * [[graft.sources.Export.writeShardsWithManifest]] must have
    * committed the base export (the weekly full re-shuffle); the
    * stream pays only per-batch shuffle-rank + delta writes after.
    */
  def exportAppendStream(
      docs: DataFrame,
      idCol: String,
      outDir: String,
      baseSeed: Long,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.Export.appendShardsWithManifest(
            batch.toDF(), idCol, outDir,
            deltaSeed = baseSeed + batchId + 1, batchId = batchId): Unit
      }
      .start()

  def countMinStream(
      docs: DataFrame,
      textCol: String,
      stateDir: String,
      checkpoint: String,
      d: Int = 4,
      w: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Quality.countMinIncrement(
          batch.sparkSession, stateDir, batch.toDF(), textCol, d, w, batchId)
      }
      .start()

  /** Streaming ANN ingest — the full production loop composed from
    * gated parts: each micro-batch of documents is ENCODED through the
    * batched model boundary ([[graft.operators.Encode.encodeWithModel]])
    * and ABSORBED into the versioned segmented index
    * ([[graft.changesets.Pipeline.absorbAnnBatch]] → one O(batch)
    * delta segment + manifest under the live pair's FROZEN model).
    * Delivery: at-least-once replay absorbs a batch once (the segment
    * ref is the commit record — absorbAnnBatch skips ids the live
    * manifest already references). Bootstrap: [[graft.changesets.Pipeline.publishAnn]]
    * must have published a pair (the weekly retrain); the stream pays
    * only per-batch encode + delta writes forever after.
    */
  def annIngestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      encoder: graft.operators.Encode.BatchEncoder,
      publishDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val vecs = graft.operators.Encode.encodeWithModel(
            batch.toDF(), idCol, textCol, encoder)
          graft.changesets.Pipeline.absorbAnnBatch(
            batch.sparkSession, publishDir, batchId, vecs, idCol, "embedding"): Unit
        }
      }
      .start()

  /** Streaming CHUNK-level ANN ingest (r19, verdict #8) — the q232
    * chunk-index lifecycle driven by the same daily-drop loop the
    * doc-level index rides: each micro-batch of documents is sliding-
    * window CHUNKED, encoded through the frozen model boundary, and
    * absorbed as one O(batch) delta segment
    * ([[graft.changesets.Pipeline.absorbChunkAnnBatch]] — the shared
    * per-batch body, so the q255 query gate and this stream exercise
    * one code path; [[graft.operators.Retrieval.chunkVid]] keeps the
    * vid rule identical to every batch build). Delivery and
    * bootstrap semantics are [[annIngestStream]]'s: at-least-once
    * replay absorbs a batch once, publishAnn must have published the
    * day-1 pair.
    */
  def chunkAnnIngestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      encoder: graft.operators.Encode.BatchEncoder,
      winTokens: Int,
      stride: Int,
      publishDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.changesets.Pipeline.absorbChunkAnnBatch(
            batch.sparkSession, publishDir, batchId, batch.toDF(), idCol, textCol,
            encoder, winTokens, stride): Unit
        }
      }
      .start()

  /** Streaming retrieval-index ingest — the postings twin of
    * [[annIngestStream]]: each micro-batch of documents tokenizes into
    * one O(batch) delta segment absorbed batch-id-idempotently into
    * the versioned postings index
    * ([[graft.changesets.Pipeline.absorbPostingsBatch]]); BM25/tf-idf
    * statistics stay exact because df/dl/avgdl are additive over
    * disjoint-doc segments (the q148 invariant). Bootstrap:
    * [[graft.changesets.Pipeline.publishPostings]] must have published
    * a version; the stream pays per-batch tokenize + delta writes
    * forever after, with the weekly [[graft.changesets.Pipeline.compactPostings]]
    * bounding manifest fan-in.
    */
  def postingsIngestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      publishDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.changesets.Pipeline.absorbPostingsBatch(
            batch.sparkSession, publishDir, batchId, batch.toDF(), idCol, textCol): Unit
        }
      }
      .start()

  /** Streaming URL-level dedup — the frontier-facing twin of q134's
    * batch canonicalize + keep-min ([[graft.sources.Warc.urlCanonical]]):
    * each micro-batch canonicalizes its URLs, keeps the min id per
    * canonical WITHIN the batch, and publishes only canonical forms
    * never published before. The PUBLISHED OUTPUT IS the seen-set
    * state — one store, one write per batch, so the append is the
    * single commit point: an at-least-once replay re-derives `seen`
    * from what actually landed, already-written survivors skip (no
    * duplicates) and unwritten ones re-emit (no loss) — observably
    * exactly-once without a transaction log, even across a crash
    * mid-append (partially visible rows skip, the rest re-emit).
    * Across batches first-publication-wins, which equals the batch
    * keep-min rule whenever drops arrive in id order
    * (UrlDedupStreamSpec pins stream ≡ batch on ordered drops).
    * Per-batch cost: one map-only canonicalization + one batch-sized
    * groupBy + one anti join against the seen canonicals — the
    * corpus-side store is read, never shuffled.
    */
  def urlDedupStream(
      pages: DataFrame,
      idCol: String,
      urlCol: String,
      outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val hconf = s.sessionState.newHadoopConf()
        def exists(dir: String): Boolean = {
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(hconf)
          fs.exists(p) && fs.listStatus(p).nonEmpty
        }
        val canon = batch.toDF()
          .select(col(idCol).as("id"),
            graft.sources.Warc.urlCanonical(col(urlCol)).as("canonical_url"))
          .groupBy(col("canonical_url")).agg(min(col("id")).as("id"))
        val seen =
          if (exists(outDir)) s.read.parquet(outDir).select(col("canonical_url"))
          else canon.limit(0).select(col("canonical_url"))
        canon.join(seen, Seq("canonical_url"), "left_anti")
          .select(col("id"), col("canonical_url"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .start()

  /** Streaming change-data-capture over corpus snapshot drops — each
    * micro-batch is one FULL snapshot version; the foreachBatch body
    * is [[graft.operators.Quality.cdcAbsorb]] verbatim, so the
    * crash/replay story is the operator's own (immutable gen dirs,
    * pointer flips last, committed batch ids skipped, half-committed
    * ones overwrite their own dirs) — at-least-once delivery
    * converges to an exactly-once log with no transaction manager.
    * CdcStreamSpec pins stream ≡ the one-shot absorb sequence and
    * that a re-delivered batch is a no-op.
    */
  def cdcStream(
      snapshots: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      logDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Quality.cdcAbsorb(batch.sparkSession, stateDir, logDir,
          batch.toDF(), idCol, textCol, batchId)
      }
      .start()

  /** Streaming recrawl estimation — each micro-batch is one crawl
    * cycle's snapshot; the foreachBatch body is
    * [[graft.sources.Robots.recrawlIncrement]] verbatim, so the
    * crash/replay story is the operator's own (immutable gen dirs,
    * head flips last, committed batch ids skipped, half-committed
    * generations overwritten) — at-least-once delivery converges to
    * the exactly-once per-page change statistics the scheduler reads.
    * RecrawlStreamSpec pins stream ≡ the one-shot fold sequence and
    * that a re-delivered cycle is a no-op.
    */
  def recrawlStream(
      snapshots: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.Robots.recrawlIncrement(batch.sparkSession, stateDir,
          batch.toDF(), idCol, textCol, batchId)
      }
      .start()

  /** File-source stream over a directory of parquet drops — the
    * Spark-native version of the reference's poll-and-reprocess loop
    * (checkpointed, exactly-once, Trigger.AvailableNow for batch-like
    * runs).
    */
  def fileStream(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}

/** Typed state processor for EventStreams.runningCounts: one
  * ValueState[Long] per user key, no TTL (counts are cumulative for
  * the stream's lifetime; pass a TTLConfig to age keys out in
  * deployments where the key space churns).
  */
class RunningCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), (Long, Long)] {
  @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}
