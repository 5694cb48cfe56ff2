package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
  }

  test("funnel: strict ordering, first-touch anchors, 24h step deadline") {
    val events = ev(Seq(
      // u1 completes: view 10:00 -> click 11:00 -> purchase 12:00
      (1L, "2024-01-01T10:00:00Z", "view"),
      (1L, "2024-01-01T11:00:00Z", "click"),
      (1L, "2024-01-01T12:00:00Z", "purchase"),
      // u2: click BEFORE first view -> no click conversion
      (2L, "2024-01-01T09:00:00Z", "click"),
      (2L, "2024-01-01T10:00:00Z", "view"),
      // u3: click exactly at the +24h boundary (inclusive), no purchase
      (3L, "2024-01-01T00:00:00Z", "view"),
      (3L, "2024-01-02T00:00:00Z", "click"),
      // u4: click past the deadline -> only the view stage
      (4L, "2024-01-01T00:00:00Z", "view"),
      (4L, "2024-01-02T00:00:01Z", "click"),
      // u5: purchase within 24h of the FIRST click, though a later
      // click would also qualify (first-touch anchor is the contract)
      (5L, "2024-01-01T00:00:00Z", "view"),
      (5L, "2024-01-01T01:00:00Z", "click"),
      (5L, "2024-01-01T20:00:00Z", "click"),
      (5L, "2024-01-02T00:30:00Z", "purchase"))) // 23.5h after first click
    val got = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), stepWindowHours = 24)
      .orderBy("stage_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0, "view", 5L), (1, "click", 3L), (2, "purchase", 2L)))
  }

  test("cohortRetention: day-0 anchoring and distinct user-days") {
    val events = ev(Seq(
      (1L, "2024-01-01T08:00:00Z", "view"),
      (1L, "2024-01-01T22:00:00Z", "view"),  // same day: counted once
      (1L, "2024-01-03T01:00:00Z", "view"),  // offset 2
      (2L, "2024-01-01T23:59:59Z", "view"),
      (2L, "2024-01-02T00:00:01Z", "view"),  // offset 1
      (3L, "2024-01-02T12:00:00Z", "view"))) // later cohort, day 0 only
    val got = Behavior.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 1, 1L),
      ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("transitionMatrix: per-user ordered lead pairs, conditional p by source") {
    import spark.implicits._
    val events = Seq(
      // u1: a -> b -> a   u2: a -> b (cross-user pairs must not appear)
      (1L, 1L, "2024-01-01T00:00:00Z", "a"),
      (1L, 2L, "2024-01-01T00:01:00Z", "b"),
      (1L, 3L, "2024-01-01T00:02:00Z", "a"),
      (2L, 4L, "2024-01-01T00:00:00Z", "a"),
      (2L, 5L, "2024-01-01T00:05:00Z", "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Behavior.transitionMatrix(events, "user_id", "ts", "event_type", "event_id")
      .orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // a->b twice (p=1 given a), b->a once (p=1 given b)
    assert(got === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("semanticNearDupPairs only reports same-cluster pairs above threshold") {
    import spark.implicits._
    // two tight clusters around orthogonal axes + one lone vector
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(0.99f, 0.1f, 0.0f)),   // near axis-x
      (11L, Array(0.98f, 0.15f, 0.0f)),  // near axis-x
      (20L, Array(0.1f, 0.99f, 0.0f)),   // near axis-y
      (30L, Array(0.0f, 0.0f, 1.0f)))    // alone on axis-z
      .toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id") < 2)
    val got = Similarity.semanticNearDupPairs(vecs, cents, "vec_id", "embedding", 0.9)
      .orderBy("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // x-cluster: (0,10),(0,11),(10,11); y-cluster: (1,20); z vector is
    // assigned somewhere but pairs with nothing; cross-cluster pairs
    // (e.g. 10 vs 20, cosine ~0.2) never even get scored
    assert(got === Seq((0L, 10L), (0L, 11L), (1L, 20L), (10L, 11L)))
  }
}
