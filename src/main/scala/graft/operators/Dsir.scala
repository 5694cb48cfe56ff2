package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed n-gram
  * feature profile looks like a TARGET corpus, by importance weights
  * under two bag-of-hashed-ngrams models.
  *
  *   1. Features: unigrams + bigrams of the lowercased token stream,
  *      hashed into `numBuckets` buckets (the paper's hashed n-gram
  *      generative model — the hash collision is part of the model,
  *      not an approximation of a bigger one).
  *   2. Two bucket models with add-one smoothing:
  *        p_b = (t_b + 1) / (T + B)   from the target corpus
  *        q_b = (r_b + 1) / (R + B)   from the raw corpus
  *   3. Per-document importance: how much more likely the doc's
  *      feature bag is under p than under q.
  *   4. Resampling: keep document i with probability ∝ its weight,
  *      calibrated so the expected sample size is k.
  *
  * Two scoring surfaces, mirroring the q108 discipline:
  *
  *   - [[importancePpm]] — the ORACLE-GATED form. Per-feature
  *     importance RATIO floored to integer parts-per-million,
  *     ratio_ppm(b) = (10⁶·(t_b+1)·(R+B)) div ((r_b+1)·(T+B)) — one
  *     truncated division of two exact BIGINT products — and the
  *     per-doc score is the feature-frequency-weighted integer mean
  *     Σ n_b·ratio_ppm(b) div Σ n_b. This is the linear-domain
  *     surrogate of the paper's log-weight (an arithmetic mean of
  *     per-feature ratios instead of their geometric mean): same
  *     orientation — >10⁶ means "more target-like than raw-average" —
  *     and exact BIGINT end-to-end, so it hash-matches DuckDB under
  *     any shuffle order. Headroom: the ratio numerator is bounded by
  *     10⁶·(T+B)·(R+B); exact while that product stays under 2⁶³
  *     (≈ corpora of 10⁵ target × 10⁶ raw feature occurrences at ppm
  *     scale — past that, promote the two products to DECIMAL(38,0),
  *     one-line change, same semantics).
  *   - [[logImportance]] — the paper's actual estimator,
  *     avg log₂(p_b/q_b) per feature occurrence. Float, so per-doc
  *     sums fold over a SORTED collected list (deterministic per
  *     plan) and it is spec-gated (DsirSpec, driver-reference
  *     tolerance), not oracle-gated.
  *
  * Resampling is the q82 deterministic threshold-keep discipline
  * extended from static per-source rates to per-document importance:
  * draw u_i = hash60("dsir|" ++ id) mod 10⁶ (replayable across
  * retries, engines, speculative re-execution — rand() is not), and
  * keep iff u_i · Σw < k · 10⁶ · w_i, the cross-multiplied exact
  * integer form of u_i/10⁶ < k·w_i/Σw — i.e. acceptance probability
  * min(1, k·w_i/Σw), expected sample size ≤ k with exactly the
  * paper's ∝-importance shape. No division, no float, no coupling
  * between documents beyond the one exact scalar Σw.
  *
  * Scale shape: both bucket models are ≤ numBuckets rows (KBs) and
  * BROADCAST; the corpus-side work is one token explode with map-side
  * combine into (doc, bucket) partials, one broadcast join against
  * the ratio table, one per-doc aggregate — linear in corpus tokens,
  * the corpus never shuffles except keyed by its own doc id.
  * Everything whole-stage codegen.
  */
object Dsir {

  /** Default hashed-feature space size. Small enough to broadcast at
    * any corpus scale, large enough that the testdata vocabulary does
    * not alias every gram together.
    */
  val DefaultBuckets = 1024

  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ",
          element_at(toks, i.cast("int")),
          element_at(toks, (i + 1).cast("int")))))
      .otherwise(array().cast("array<string>"))

  /** Hashed unigram+bigram feature counts: (doc, bucket, n).
    * poly_hash is the distinctness-only base hash (TextFunctions
    * boundary doc) — bucketing needs no bit uniformity beyond spread,
    * and the DuckDB mirror is exact.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = DefaultBuckets): DataFrame =
    docs
      // toks materialized as an ATTRIBUTE before the bigram transform
      // lambda — the lambda-capture rule (SURVEY §8.4, Dedup
      // .shinglesFromToks): a captured `tokens(text)` subtree would
      // re-tokenize the document once per gram element
      .select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc"),
        explode(concat(col("toks"), bigrams(col("toks")))).as("g"))
      .select(col("doc"),
        pmod(TextFunctions.polyHash(col("g")), lit(numBuckets.toLong)).as("bucket"))
      .groupBy(col("doc"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** The two smoothed bucket models joined into one broadcast-able
    * ratio table: (bucket, r, t, ratio_ppm) for every bucket present
    * in the RAW corpus (a bucket absent from raw cannot occur in any
    * raw doc, so the scoring join never misses). Carries the exact
    * integer ratio and the raw counts the float surface needs.
    */
  def ratioTable(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = DefaultBuckets): DataFrame =
    ratioFromFeatures(features(raw, idCol, textCol, numBuckets),
      features(target, idCol, textCol, numBuckets), numBuckets)

  private def ratioFromFeatures(rawFeats: DataFrame, targetFeats: DataFrame,
      numBuckets: Int): DataFrame = {
    val rcnt = rawFeats.groupBy(col("bucket")).agg(sum(col("n")).as("r"))
    val tcnt = targetFeats.groupBy(col("bucket")).agg(sum(col("n")).as("t"))
    val totals = rcnt.agg(sum(col("r")).as("rtot"))
      .crossJoin(tcnt.agg(coalesce(sum(col("t")), lit(0L)).as("ttot")))
    rcnt.join(tcnt, Seq("bucket"), "left")
      .select(col("bucket"), col("r"), coalesce(col("t"), lit(0L)).as("t"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("r"), col("t"), col("rtot"), col("ttot"),
        expr(s"(1000000 * (t + 1) * (rtot + $numBuckets)) DIV " +
          s"((r + 1) * (ttot + $numBuckets))").as("ratio_ppm"))
  }

  /** Oracle-gated integer importance score per raw document:
    * (doc_id, n_feat, score_ppm) — n_feat = total feature
    * occurrences, score_ppm = Σ n_b·ratio_ppm(b) div n_feat. Docs
    * with zero tokens have no feature bag and no defined importance;
    * they are absent from the output (callers wanting them keep/drop
    * them by policy, not by a fabricated score).
    */
  def importancePpm(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = DefaultBuckets): DataFrame = {
    // the raw feature table feeds BOTH the q-model aggregate and the
    // scoring join (and, via resample, the Σw scalar + the kept-row
    // filter): without materialization Spark re-runs the tokenize +
    // explode + hash + combine pass once per consumer — measured 4x on
    // the first bench cut (q109 9.7 s -> the explode pass dominated).
    // Checkpoint it once, release before returning (its consumers are
    // inside the eager `scored` below); the returned frame is itself
    // checkpoint-backed and carries the Checkpoints.release contract.
    val feats = features(raw, idCol, textCol, numBuckets).localCheckpoint(true)
    val ratios = ratioFromFeatures(
        feats, features(target, idCol, textCol, numBuckets), numBuckets)
      .select(col("bucket"), col("ratio_ppm"))
    val scored = feats
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc"))
      .agg(sum(col("n")).as("n_feat"),
        sum(col("n") * col("ratio_ppm")).as("w_sum"))
      .select(col("doc").as("doc_id"), col("n_feat"),
        expr("w_sum DIV n_feat").as("score_ppm"))
      .localCheckpoint(true)
    graft.Checkpoints.release(feats)
    scored
  }

  /** The paper's log estimator: avg log₂(p_b/q_b) per feature
    * occurrence — (doc_id, n_feat, avg_log2_ratio). Float; per-doc
    * fold over a sorted collect so the sum is order-deterministic;
    * spec-gated, not oracle-gated.
    */
  def logImportance(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = DefaultBuckets): DataFrame = {
    // same two-consumer shape as importancePpm: one materialized
    // feature pass feeds the q-model and the scoring join; released
    // before return, result checkpoint-backed (release contract)
    val feats = features(raw, idCol, textCol, numBuckets).localCheckpoint(true)
    val ratios = ratioFromFeatures(
      feats, features(target, idCol, textCol, numBuckets), numBuckets)
    val lg = (log2(col("t").cast("double") + 1.0)
      - log2(col("ttot").cast("double") + numBuckets.toDouble)
      - log2(col("r").cast("double") + 1.0)
      + log2(col("rtot").cast("double") + numBuckets.toDouble)).as("lg")
    val out = feats
      .join(broadcast(ratios.select(col("bucket"), lg)), Seq("bucket"))
      .groupBy(col("doc"))
      .agg(sum(col("n")).as("n_feat"),
        aggregate(sort_array(collect_list(struct(col("bucket"), col("n"), col("lg")))),
          lit(0.0),
          (acc, x) => acc + x.getField("n").cast("double") * x.getField("lg"))
          .as("lg_sum"))
      .select(col("doc").as("doc_id"), col("n_feat"),
        (col("lg_sum") / col("n_feat").cast("double")).as("avg_log2_ratio"))
      .localCheckpoint(true)
    graft.Checkpoints.release(feats)
    out
  }

  /** Sidecar file name inside a persisted DSIR model dir. */
  val SchemeStampName = "_dsir_scheme.json"

  /** Full identity of the DSIR feature/model scheme — ANY change to
    * the tokenizer, gram orders, hash, bucket count, or smoothing
    * must change this string (the [[ArtifactStamp]] discipline: a
    * frozen model only scores future batches correctly if both sides
    * bucket identically).
    */
  def scheme(numBuckets: Int): String =
    s"dsir/v1 tokens=lower-alnum grams=uni+bi hash=poly_hash " +
      s"buckets=$numBuckets smoothing=add-one"

  /** Train on (raw, target) and PERSIST the ratio model — the
    * production shape: a curation fleet trains the two bucket models
    * once (against this quarter's target sample) and scores every
    * incoming crawl batch with the FROZEN model via
    * [[scoreWithModel]], never recomputing corpus statistics per
    * batch. The artifact is the ≤numBuckets-row ratio table (KBs) +
    * the scheme stamp.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, dir: String,
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    ratioTable(raw, target, idCol, textCol, numBuckets)
      .write.mode("overwrite").parquet(s"$dir/ratios.parquet")
    ArtifactStamp.write(dir, spark.sessionState.newHadoopConf(),
      SchemeStampName, scheme(numBuckets))
  }

  /** Load a persisted model, failing loudly on a missing or
    * mismatched scheme stamp (an unstamped or differently-bucketed
    * model would score every batch silently wrong).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String,
      numBuckets: Int = DefaultBuckets): DataFrame = {
    ArtifactStamp.require(dir, spark.sessionState.newHadoopConf(),
      SchemeStampName, scheme(numBuckets), "DSIR model",
      "scoring batches with it would bucket features differently than training did")
    spark.read.parquet(s"$dir/ratios.parquet")
  }

  /** Score a NEW batch with a FROZEN model (the output of
    * [[ratioTable]]/[[loadModel]]): identical integer arithmetic to
    * [[importancePpm]], so for batch ⊆ training-raw the scores are
    * bit-equal; buckets the training raw corpus never saw take the
    * add-one floor ratio 10⁶·(rtot+B)/(ttot+B) — exactly what the
    * smoothed models assign an unseen event (r=t=0), so novel
    * vocabulary degrades gracefully instead of dropping rows. The
    * model broadcasts; the batch pays one feature pass and one
    * per-doc aggregate — no corpus statistics are touched.
    */
  def scoreWithModel(batch: DataFrame, idCol: String, textCol: String,
      model: DataFrame, numBuckets: Int = DefaultBuckets): DataFrame = {
    // the unseen-bucket ratio from the model's own totals (any row
    // carries them; ≤B-row aggregate, broadcast)
    val defRatio = model
      .agg(max(col("rtot")).as("rtot"), max(col("ttot")).as("ttot"))
      .select(expr(s"coalesce((1000000 * (rtot + $numBuckets)) DIV " +
        s"(ttot + $numBuckets), 1000000)").as("def_ppm"))
    features(batch, idCol, textCol, numBuckets)
      .join(broadcast(model.select(col("bucket"), col("ratio_ppm"))),
        Seq("bucket"), "left")
      .crossJoin(broadcast(defRatio))
      .withColumn("ratio_eff", coalesce(col("ratio_ppm"), col("def_ppm")))
      .groupBy(col("doc"))
      .agg(sum(col("n")).as("n_feat"),
        sum(col("n") * col("ratio_eff")).as("w_sum"))
      .select(col("doc").as("doc_id"), col("n_feat"),
        expr("w_sum DIV n_feat").as("score_ppm"))
  }

  /** Deterministic importance resampling: raw docs kept with
    * probability min(1, k·w_i/Σw) via the exact integer
    * threshold-keep rule above. Returns (doc_id, n_feat, score_ppm)
    * for the kept docs. Expected sample size ≤ k (equality when no
    * weight is clamped); the REALIZED size varies like any Bernoulli
    * sample — that is the resampling semantics, not noise to fix.
    * Replayable: same corpus + target + k ⇒ the identical set, on
    * any partitioning, any engine, any retry.
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int,
      numBuckets: Int = DefaultBuckets): DataFrame = {
    val scored = importancePpm(raw, target, idCol, textCol, numBuckets)
    val wsum = scored.agg(sum(col("score_ppm")).as("wsum"))
    scored.crossJoin(broadcast(wsum))
      .filter(
        pmod(TextFunctions.hash60(concat(lit("dsir|"), col("doc_id"))), lit(1000000L))
          * col("wsum") < lit(k.toLong) * lit(1000000L) * col("score_ppm"))
      .select(col("doc_id"), col("n_feat"), col("score_ppm"))
  }
}
