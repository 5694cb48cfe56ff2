package graft.changesets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The analytics surface the reference delegates to downstream SQL
  * engines ("Query directly with DuckDB!", reference
  * .github/workflows/process-changesets-r2.yml:198-215 and
  * scripts/manage-r2.sh:130-152) — rebuilt as first-class operators
  * over the converted changesets table (SURVEY.md §2.3, §7 phase 3).
  *
  * Every query is a declarative plan over the 13-column schema
  * (ChangesetSchema.output): filters and column prunes reach the
  * parquet scan, aggregates combine map-side, top-k uses a unique
  * tiebreak. A user of the reference's published parquet can point
  * these at the same file.
  */
object ChangesetAnalytics {

  /** The reference's canonical smoke query:
    * `SELECT COUNT(*) FROM 'changesets.parquet'`
    * (manage-r2.sh:150-151).
    */
  def totalCount(cs: DataFrame): Long = cs.count()

  /** Top-k editors by changeset count (ties broken by uid for
    * determinism). Null uid (anonymous) excluded.
    */
  def topEditors(cs: DataFrame, k: Int): DataFrame =
    cs.filter(col("uid").isNotNull)
      .groupBy(col("uid"), col("user"))
      .agg(count(lit(1)).as("n_changesets"),
        sum(col("num_changes")).as("n_changes"))
      .orderBy(col("n_changesets").desc, col("uid"))
      .limit(k)

  /** Monthly activity: changesets opened per calendar month, plus how
    * many remain open and the total edit count.
    */
  def monthlyActivity(cs: DataFrame): DataFrame =
    cs.filter(col("created_at").isNotNull)
      .groupBy(date_trunc("month", col("created_at")).as("month"))
      .agg(count(lit(1)).as("n_changesets"),
        sum(when(col("open"), 1L).otherwise(0L)).as("n_open"),
        sum(col("num_changes")).as("n_changes"))
      .orderBy(col("month"))

  /** Bounding-box area in square degrees (null when any corner is
    * absent — the reference leaves bbox columns nullable,
    * src/main.rs:400-403).
    */
  def bboxAreaDeg2: Column =
    (col("max_lon") - col("min_lon")) * (col("max_lat") - col("min_lat"))

  /** Changesets whose bbox exceeds `minAreaDeg2` — the classic
    * "suspiciously large edit" audit query.
    */
  def largeBboxes(cs: DataFrame, minAreaDeg2: Double, k: Int): DataFrame =
    cs.withColumn("area_deg2", bboxAreaDeg2)
      .filter(col("area_deg2") > minAreaDeg2)
      .select(col("id"), col("user"), col("created_at"), col("area_deg2"),
        col("num_changes"))
      .orderBy(col("area_deg2").desc, col("id"))
      .limit(k)

  /** Currently-open changesets, oldest first. */
  def openChangesets(cs: DataFrame): DataFrame =
    cs.filter(col("open"))
      .select(col("id"), col("user"), col("created_at"), col("num_changes"))
      .orderBy(col("created_at").asc_nulls_last, col("id"))

  /** Case-insensitive comment-text search over the extracted
    * description column (the only tag the reference keeps,
    * src/main.rs:240-244).
    */
  def searchComments(cs: DataFrame, needle: String): DataFrame =
    cs.filter(col("description").isNotNull &&
        lower(col("description")).contains(needle.toLowerCase))
      .select(col("id"), col("user"), col("created_at"), col("description"))
      .orderBy(col("id"))

  /** Changesets-per-user percentile rank — who produces the long tail.
    * One shuffle (user agg), then the blocked prefix-count rank
    * (Curriculum.globalRank) instead of an unpartitioned rank window:
    * the ordering key (n_changesets, uid) is tie-free because uid is
    * unique, so percent_rank == (row_number - 1) / (N - 1) exactly and
    * no single-partition sort ever sees the per-editor table.
    */
  def editorPercentiles(cs: DataFrame): DataFrame = {
    val perUser = cs.filter(col("uid").isNotNull)
      .groupBy(col("uid")).agg(count(lit(1)).as("n_changesets"))
    val ranked = graft.operators.Curriculum.globalRank(
      perUser, keyCol = "n_changesets", idCol = "uid", blockWidth = 1024L)
    val total = perUser.agg(count(lit(1)).as("__n_editors"))
    ranked.crossJoin(broadcast(total))
      .withColumn("pct_rank",
        when(col("__n_editors") <= 1L, lit(0.0))
          .otherwise((col("global_rank") - 1).cast("double") /
            (col("__n_editors") - 1).cast("double")))
      .select(col("uid"), col("n_changesets"), col("pct_rank"))
  }

  /** Mean time-to-close in seconds per month, closed changesets only. */
  def closeLatency(cs: DataFrame): DataFrame =
    cs.filter(col("closed_at").isNotNull && col("created_at").isNotNull)
      .groupBy(date_trunc("month", col("created_at")).as("month"))
      .agg(avg(unix_timestamp(col("closed_at")) - unix_timestamp(col("created_at")))
        .as("mean_close_seconds"),
        count(lit(1)).as("n_closed"))
      .orderBy(col("month"))
}
