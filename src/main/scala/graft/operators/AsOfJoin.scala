package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, attach the latest right row whose
  * time is <= the left row's time, per key.
  *
  * Implemented as union + last-value window rather than the naive
  * join-then-filter-then-rank plan: the naive plan materializes
  * |left| x |right-per-key| intermediate rows before pruning — at the
  * 100 TB design point that intermediate blowup is the bottleneck. The
  * union form costs exactly ONE shuffle (by key) and a per-partition
  * sort; state per key is O(1) during the scan. This mirrors how
  * streaming engines do temporal joins (sorted merge with a
  * last-seen-value register).
  *
  * Tie semantics: a right row at exactly t == left.t IS visible
  * (<=, right-before-left within a timestamp), and among right rows
  * with identical (key, time) the one with the greatest tiebreak column
  * wins — callers pass a unique `rightTiebreak` so results are
  * deterministic.
  */
object AsOfJoin {

  /** Native sorted-merge form: plans graft.plans.AsOfJoinExec via the
    * injected strategy (spark.sql.extensions=graft.GraftExtensions
    * required). Same semantics as apply() — differential-tested in
    * AsOfJoinSpec — but executes as one linear merge per co-partition
    * with a single-row register instead of union + window state over
    * |L|+|R| null-padded rows.
    */
  def native(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    val lPlan = left.queryExecution.analyzed
    // both sides often derive from one lineage (self-as-of), sharing
    // exprIds; the analyzer's DeduplicateRelations does not know this
    // node, so re-alias the right side with fresh ids unconditionally
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan: LogicalPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    val rOut = rPlan.asInstanceOf[Project].projectList.map(_.toAttribute)
    def attrIn(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute], name: String) =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      attrIn(lPlan.output, key), attrIn(rOut, key),
      attrIn(lPlan.output, leftTime), attrIn(rOut, rightTime),
      attrIn(rOut, rightTiebreak), rightValues.map(attrIn(rOut, _)),
      lPlan, rPlan)
    org.apache.spark.sql.GraftSqlBridge.ofRows(left.sparkSession, node)
  }

  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val sideCol = "__asof_side"
    val timeCol = "__asof_t"
    val tbCol = "__asof_tb"
    val rvCol = "__asof_rv"

    // right side sorts before left at equal timestamps => right row at
    // the same instant is visible to the left row. The right value
    // columns travel as ONE struct so the fill below attaches a whole
    // right row atomically — per-column last(ignoreNulls) would mix
    // columns from different right rows when a value is legitimately
    // NULL (an older row's non-null cell would survive).
    // NULL keys never match (SQL join semantics, as DuckDB ASOF JOIN
    // and pandas merge_asof behave): drop null-key right rows — they
    // could attach nowhere — and null the attach for null-key left
    // rows below. Window.partitionBy alone would group NULLs as equal.
    val taggedRight = right.filter(col(key).isNotNull).select(
      (col(key) +:
        col(rightTime).as(timeCol) +:
        lit(0).as(sideCol) +:
        col(rightTiebreak).as(tbCol) +:
        struct(rightValues.map(col): _*).as(rvCol) +:
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val taggedLeft = left.select(
      (col(key) +:
        col(leftTime).as(timeCol) +:
        lit(1).as(sideCol) +:
        lit(null).cast(taggedRight.schema(tbCol).dataType).as(tbCol) +:
        lit(null).cast(taggedRight.schema(rvCol).dataType).as(rvCol) +:
        leftCols.filterNot(_ == key).map(col)): _*)

    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col(sideCol), col(tbCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(rvCol, when(col(key).isNull, lit(null))
        .otherwise(last(col(rvCol), ignoreNulls = true).over(w)))
      .filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++
        rightValues.map(c => col(rvCol).getField(c).as(c)): _*)
  }
}
