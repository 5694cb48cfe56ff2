package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum scheduling: assign every row a CONTIGUOUS global rank
  * 1..N in (key ASC, id ASC) order — "shortest/easiest first" training
  * order — without ever sorting the corpus through one task.
  *
  * The naive form is `row_number() OVER (ORDER BY key, id)`: a
  * single-partition window that serializes the whole corpus. Here the
  * rank is a two-level prefix count over data-derived key blocks (the
  * q87 packing discipline, applied to ranking): block = key div
  * `blockWidth`; a parallel per-block row_number (hash-shuffled on the
  * block value, NOT spark_partition_id, so the result is independent
  * of executor layout); then one tiny serial window over per-block
  * counts (corpus/blockWidth rows) broadcast back as exclusive
  * offsets. global_rank = block offset + local rank.
  *
  * At 100 TB: pick blockWidth so the block-count table stays
  * driver-friendly; every heavy stage is parallel and the only serial
  * structure is the per-block count cumsum. Keys must be non-negative
  * integers (`div` truncates toward zero — negative keys would order
  * blocks inconsistently with the within-block order).
  */
object Curriculum {

  def globalRank(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      blockWidth: Long): DataFrame = {
    require(blockWidth >= 1, s"blockWidth must be >= 1: $blockWidth")
    val base = df.select(col(keyCol).as("key"), col(idCol).as("id"))
      .withColumn("blk", expr(s"key div $blockWidth"))
    val local = base.withColumn("local_rank",
      row_number().over(Window.partitionBy(col("blk")).orderBy(col("key"), col("id"))))
    val offsets = local.groupBy(col("blk")).agg(count(lit(1)).as("bcnt"))
      .withColumn("offset",
        coalesce(sum(col("bcnt")).over(Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("offset"))
    local.join(broadcast(offsets), Seq("blk"))
      .select(col("id").as(idCol), col("key").as(keyCol),
        (col("offset") + col("local_rank")).cast("long").as("global_rank"))
  }
}
