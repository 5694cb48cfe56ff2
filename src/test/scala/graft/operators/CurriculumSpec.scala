package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level curriculum ranking (Curriculum.globalRank — oracle-gated
  * end-to-end by q120): the blocked prefix-count rank must equal the
  * naive single-window row_number on every shape, and the heavy window
  * must stay partitioned (the whole point of the operator).
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("doc_id"), col("n"),
        row_number().over(Window.orderBy(col("n"), col("doc_id"))).cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  private def blocked(df: org.apache.spark.sql.DataFrame, w: Long): Seq[(Long, Long, Long)] =
    Curriculum.globalRank(df, "n", "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  test("blocked rank equals the naive global window, ties on id") {
    val df = Seq(
      (1L, 50L), (2L, 10L), (3L, 50L), (4L, 0L), (5L, 250L),
      (6L, 120L), (7L, 10L), (8L, 99L), (9L, 100L), (10L, 101L)
    ).toDF("doc_id", "n")
    for (w <- Seq(1L, 7L, 100L, 1000L))
      assert(blocked(df, w) === naive(df), s"mismatch at blockWidth=$w")
  }

  test("rank is contiguous 1..N and invariant under repartitioning") {
    val df = (1L to 500L).map(i => (i, (i * 37) % 90)).toDF("doc_id", "n")
    val a = blocked(df.repartition(1), 10L)
    val b = blocked(df.repartition(13, col("doc_id")), 10L)
    assert(a === b)
    assert(a.map(_._3).sorted === (1L to 500L))
  }

  test("heavy window is partitioned by block — never a global sort of the data") {
    val df = (1L to 100L).map(i => (i, i % 9)).toDF("doc_id", "n")
    val plan = Curriculum.globalRank(df, "n", "doc_id", 3L)
      .queryExecution.optimizedPlan.toString
    // the only empty-partitionBy window must be over the per-block
    // counts (bcnt), not over the data rows
    val globalWindows = plan.split("\n").filter(l =>
      l.contains("windowspecdefinition") && !l.contains("partitionbyblk") &&
        !l.contains("blk#"))
    assert(globalWindows.forall(_.contains("bcnt")),
      s"global window over data rows leaked into:\n$plan")
  }
}
