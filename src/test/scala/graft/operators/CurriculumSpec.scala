package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Three-level curriculum ranking (Curriculum.globalRank — oracle-
  * gated end-to-end by q120): the blocked prefix-count rank must equal
  * the naive single-window row_number on every shape INCLUDING a
  * hot-key-dominated corpus, and every data-row window partition must
  * stay bounded by idSubWidth (the whole point of the operator: no key
  * distribution can force one task to sort the corpus).
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("doc_id"), col("n"),
        row_number().over(Window.orderBy(col("n"), col("doc_id"))).cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  private def blocked(df: org.apache.spark.sql.DataFrame, w: Long,
      sub: Long = 1L << 20): Seq[(Long, Long, Long)] =
    Curriculum.globalRank(df, "n", "doc_id", w, sub)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  test("blocked rank equals the naive global window, ties on id") {
    val df = Seq(
      (1L, 50L), (2L, 10L), (3L, 50L), (4L, 0L), (5L, 250L),
      (6L, 120L), (7L, 10L), (8L, 99L), (9L, 100L), (10L, 101L)
    ).toDF("doc_id", "n")
    for (w <- Seq(1L, 7L, 100L, 1000L); sub <- Seq(1L, 3L, 1000L))
      assert(blocked(df, w, sub) === naive(df), s"mismatch at blockWidth=$w idSubWidth=$sub")
  }

  test("rank is contiguous 1..N and invariant under repartitioning") {
    val df = (1L to 500L).map(i => (i, (i * 37) % 90)).toDF("doc_id", "n")
    val a = blocked(df.repartition(1), 10L, 32L)
    val b = blocked(df.repartition(13, col("doc_id")), 10L, 32L)
    assert(a === b)
    assert(a.map(_._3).sorted === (1L to 500L))
  }

  test("hot-key corpus: correct rank AND no data window partition exceeds idSubWidth") {
    // >= 90% of rows share ONE key value — the shape that collapses a
    // key-blocked rank into a single window partition. ids are
    // NON-contiguous (stride 3) to exercise sparse id buckets.
    val hot = (1L to 900L).map(i => (i * 3, 42L))
    val tail = (1L to 100L).map(i => (2701L * 3 + i * 3, 42L + (i % 7) + 1))
    val df = (hot ++ tail).toDF("doc_id", "n").repartition(8, col("doc_id"))
    val sub = 64L
    assert(blocked(df, 100L, sub) === naive(df))
    // the hard bound the refinement guarantees: a (key, id-bucket)
    // partition can never hold more than idSubWidth rows, because ids
    // are unique and a bucket spans idSubWidth consecutive id values
    val maxPart = df
      .groupBy(col("n"), expr(s"doc_id div $sub"))
      .count().agg(max(col("count"))).head.getLong(0)
    assert(maxPart <= sub,
      s"a data window partition holds $maxPart rows > idSubWidth=$sub")
    // and the dominant key really was the skew case: without the
    // refinement its block would hold >= 90% of the corpus
    val hotShare = df.filter(col("n") === 42L).count().toDouble / df.count()
    assert(hotShare >= 0.9)
  }

  test("heavy window is partitioned — never a global sort of the data") {
    val df = (1L to 100L).map(i => (i, i % 9)).toDF("doc_id", "n")
    val plan = Curriculum.globalRank(df, "n", "doc_id", 3L, 16L)
      .queryExecution.optimizedPlan.toString
    // Window nodes print as `Window [fns], [partitionSpec], [orderSpec]`
    // when partitioned and `Window [fns], [orderSpec]` (one fewer
    // bracket group) when GLOBAL — a single-task window. The ONLY
    // global window allowed is the per-block-total prefix sum over
    // bcnt (corpus/blockWidth count rows, never data rows).
    val globalWindows = plan.split("\n").filter(l =>
      l.contains("Window [") && "\\], \\[".r.findAllIn(l).size == 1)
    assert(globalWindows.nonEmpty, s"expected the bcnt prefix window in:\n$plan")
    assert(globalWindows.forall(_.contains("bcnt")),
      s"global window over non-count rows leaked into:\n$plan")
    // the data-row window must be partitioned by BOTH key and id-bucket
    assert(plan.contains("idb"), s"id-bucket refinement missing from:\n$plan")
  }
}
