package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-behavior analytics over an (user, timestamp, type) event log:
  * ordered funnels and cohort retention — the product-analytics
  * operators a clickstream warehouse runs daily.
  *
  * Scale design: each funnel stage is one groupBy(user) aggregate over
  * a type-filtered scan plus an equi-join on the user id against the
  * (strictly shrinking) previous stage; cohort retention is two
  * user-keyed aggregates. Nothing is ever collected or windowed over
  * the full log.
  */
object Behavior {

  /** Ordered funnel with a per-step conversion deadline: a user counts
    * for stage i+1 when they have an event of that type STRICTLY after
    * their stage-i conversion time and within `stepWindowHours` of it.
    * Conversion time per stage = the EARLIEST qualifying event (the
    * standard first-touch semantics, deterministic).
    *
    * Returns (stage_idx, stage, n_users), one row per stage.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      stepWindowHours: Int = 24): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val converted = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(col(userCol).as("u"), col(tsCol).as("ts2"))
        .join(prev.select(col("u"), col("t").as("tprev")), Seq("u"))
        .filter(col("ts2") > col("tprev") &&
          col("ts2") <= col("tprev") + expr(s"INTERVAL $stepWindowHours HOURS"))
        .groupBy(col("u")).agg(min(col("ts2")).as("t"))
    }
    converted.zip(stages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("stage_idx"), lit(stage).as("stage"), col("n_users"))
      }
      .reduce(_ union _)
  }

  /** First-order Markov transition counts over each user's
    * time-ordered event sequence: one row per (src, dst) event-type
    * pair with the transition count and its probability given src
    * (floor-truncated rational — engine-portable). `tieCol` breaks
    * equal timestamps deterministically.
    *
    * One window pass (lead over user-partitioned, time-ordered events)
    * + one aggregate; per-source totals come from a second small
    * window over the aggregated pairs, not the raw log.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("dst", lead(col(typeCol), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    pairs
      .withColumn("src_total", sum(col("n")).over(bySrc))
      .select(col("src"), col("dst"), col("n"),
        (floor(col("n").cast("double") / col("src_total").cast("double") * lit(1e6)) / lit(1e6)).as("p"))
  }

  /** Cohort retention matrix: users bucketed by the calendar day of
    * their first event (the cohort), counted on each later day-offset
    * they were active. Returns (cohort_day: date, day_offset: int,
    * n_users), one row per non-empty cell.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .join(firstDay, Seq("u"))
      .select(col("u"), col("cohort_day"), datediff(col("d"), col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
