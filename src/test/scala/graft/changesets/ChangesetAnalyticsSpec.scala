package graft.changesets

import java.nio.file.Files

import graft.SparkSpec

/** The delegated query surface (SURVEY.md §2.3) over a converted
  * fixture: each query's result checked against hand-computed values.
  */
class ChangesetAnalyticsSpec extends SparkSpec {

  private lazy val cs = {
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<osm version="0.6">
         |<changeset id="1" created_at="2024-01-10T00:00:00Z" closed_at="2024-01-10T01:00:00Z" open="false" user="alice" uid="1" min_lat="0.0" min_lon="0.0" max_lat="2.0" max_lon="3.0" num_changes="10" comments_count="0">
         |  <tag k="comment" v="Fixed roads in town"/>
         |</changeset>
         |<changeset id="2" created_at="2024-01-20T00:00:00Z" open="true" user="alice" uid="1" num_changes="5" comments_count="0"/>
         |<changeset id="3" created_at="2024-02-05T00:00:00Z" closed_at="2024-02-05T00:30:00Z" open="false" user="bob" uid="2" min_lat="1.0" min_lon="1.0" max_lat="1.1" max_lon="1.1" num_changes="2" comments_count="1">
         |  <tag k="comment" v="added ROADS and houses"/>
         |</changeset>
         |<changeset id="4" created_at="2024-02-06T00:00:00Z" open="true" user="carol" uid="3" num_changes="1" comments_count="0"/>
         |</osm>""".stripMargin
    val f = Files.createTempFile("cs-analytics", ".osm")
    Files.writeString(f, xml)
    ChangesetConverter.parse(spark, f.toString, ChangesetConverter.Options())
  }

  test("totalCount matches the canonical COUNT(*) smoke query") {
    assert(ChangesetAnalytics.totalCount(cs) === 4L)
  }

  test("topEditors ranks by changeset count with edit sums") {
    val rows = ChangesetAnalytics.topEditors(cs, 2).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("user") === "alice")
    assert(rows(0).getAs[Long]("n_changesets") === 2L)
    assert(rows(0).getAs[Long]("n_changes") === 15L)
    assert(rows(1).getAs[String]("user") === "bob")
  }

  test("monthlyActivity buckets by calendar month with open counts") {
    val rows = ChangesetAnalytics.monthlyActivity(cs).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n_changesets") === 2L) // Jan: 1, 2
    assert(rows(0).getAs[Long]("n_open") === 1L)
    assert(rows(1).getAs[Long]("n_changesets") === 2L) // Feb: 3, 4
  }

  test("largeBboxes computes areas and filters") {
    val rows = ChangesetAnalytics.largeBboxes(cs, minAreaDeg2 = 0.1, k = 10).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("id") === 1L)
    assert(math.abs(rows(0).getAs[Double]("area_deg2") - 6.0) < 1e-12)
  }

  test("openChangesets returns only open ones oldest-first") {
    val rows = ChangesetAnalytics.openChangesets(cs).collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq === Seq(2L, 4L))
  }

  test("searchComments is case-insensitive over description") {
    val rows = ChangesetAnalytics.searchComments(cs, "roads").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq === Seq(1L, 3L))
  }

  test("closeLatency averages per month over closed changesets") {
    val rows = ChangesetAnalytics.closeLatency(cs).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("mean_close_seconds") === 3600.0)
    assert(rows(1).getAs[Double]("mean_close_seconds") === 1800.0)
  }

  test("editorPercentiles spans [0,1] over editors") {
    val rows = ChangesetAnalytics.editorPercentiles(cs)
      .orderBy(org.apache.spark.sql.functions.col("pct_rank")).collect()
    assert(rows.length === 3)
    assert(rows.head.getAs[Double]("pct_rank") === 0.0)
    assert(rows.last.getAs[Double]("pct_rank") === 1.0)
    assert(rows.last.getAs[Long]("uid") === 1L)
  }

  test("editorPercentiles is bit-identical to percent_rank, with tied counts") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 500 editors, counts drawn from a small range so ties in
    // n_changesets are dense — the uid tiebreak must match exactly
    val perCs = spark.range(0, 5000).toDF("i")
      .select((col("i") % 500).as("uid"),
        (col("i") * 2654435761L % 97).as("salt"))
      .filter(col("salt") % 7 =!= 0) // uneven per-uid counts
      .select(col("uid"), lit("u").as("user"), lit(1L).as("id"),
        current_timestamp().as("created_at"))
    val got = ChangesetAnalytics.editorPercentiles(perCs)
      .orderBy(col("uid")).collect()
    val perUser = perCs.groupBy(col("uid")).agg(count(lit(1)).as("n_changesets"))
    val want = perUser.withColumn("pct_rank",
        percent_rank().over(Window.orderBy(col("n_changesets"), col("uid"))))
      .orderBy(col("uid")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("uid") === w.getAs[Long]("uid"))
      assert(g.getAs[Long]("n_changesets") === w.getAs[Long]("n_changesets"))
      assert(g.getAs[Double]("pct_rank") === w.getAs[Double]("pct_rank"))
    }
    // and the plan never sorts the per-editor table in one partition:
    // every data-row window is partitioned (the bounded prefix windows
    // inside globalRank run over count rows only)
    val plan = ChangesetAnalytics.editorPercentiles(perCs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percent_rank"))
  }
}
