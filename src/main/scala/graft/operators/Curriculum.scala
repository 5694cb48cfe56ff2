package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum scheduling: assign every row a CONTIGUOUS global rank
  * 1..N in (key ASC, id ASC) order — "shortest/easiest first" training
  * order — without ever sorting the corpus through one task.
  *
  * The naive form is `row_number() OVER (ORDER BY key, id)`: a
  * single-partition window that serializes the whole corpus. The
  * two-level form (rank within key-derived blocks + a serial prefix
  * over per-block counts) fixes that for diverse keys but is
  * skew-fragile: a corpus where ONE key value dominates (curriculum
  * key = doc length, billions of equal-length docs) lands that key's
  * whole mass in one block → one window partition sorts it in a
  * single task.
  *
  * So the rank here is a THREE-level prefix count whose data-row
  * window is provably bounded under ANY key distribution:
  *
  *   - sub-partition = (key, idb) with idb = id div `idSubWidth`.
  *     Ids are unique, so a (key, idb) partition holds AT MOST
  *     `idSubWidth` rows — a hard bound no hot key can break. And
  *     because idb is monotone in id within a key, ordering by
  *     (key, idb, then id inside the partition) IS the (key, id)
  *     order — the refinement changes the plan, never the output
  *     (a hash salt here would reorder ties and break the rank).
  *   - level 2: per-block exclusive prefix over the (key, idb) COUNT
  *     rows (a window partitioned by blk = key div `blockWidth`,
  *     ordered by (key, idb)) — count rows are constant-size; a
  *     10⁹-row hot key at the default idSubWidth is ~10³ of them.
  *   - level 1: the global exclusive prefix over per-block totals
  *     (corpus/blockWidth rows), broadcast back.
  *
  * global_rank = block offset + within-block sub offset + sub rank.
  *
  * At 100 TB: every data-row stage is parallel with bounded
  * partitions; the serial structures see only count rows (one per
  * (key, idb) group and one per block — pick blockWidth/idSubWidth so
  * both stay small). Keys and ids must be non-negative integers
  * (`div` truncates toward zero — negative values would order blocks
  * inconsistently with the within-block order).
  */
object Curriculum {

  def globalRank(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      blockWidth: Long,
      idSubWidth: Long = 1L << 20): DataFrame = {
    require(blockWidth >= 1, s"blockWidth must be >= 1: $blockWidth")
    require(idSubWidth >= 1, s"idSubWidth must be >= 1: $idSubWidth")
    val base = df.select(col(keyCol).as("key"), col(idCol).as("id"))
      .withColumn("blk", expr(s"key div $blockWidth"))
      .withColumn("idb", expr(s"id div $idSubWidth"))
    // bounded data window: <= idSubWidth unique ids per partition
    val local = base.withColumn("sub_rank",
      row_number().over(Window.partitionBy(col("key"), col("idb")).orderBy(col("id"))))
    val subCounts = base.groupBy(col("blk"), col("key"), col("idb"))
      .agg(count(lit(1)).as("scnt"))
    // per-block serial prefix over COUNT rows (never data rows)
    val subOffsets = subCounts
      .withColumn("sub_off",
        coalesce(sum(col("scnt")).over(Window.partitionBy(col("blk"))
          .orderBy(col("key"), col("idb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("key"), col("idb"), col("blk"), col("sub_off"))
    // global serial prefix over per-block totals (corpus/blockWidth rows)
    val offsets = subCounts.groupBy(col("blk")).agg(sum(col("scnt")).as("bcnt"))
      .withColumn("offset",
        coalesce(sum(col("bcnt")).over(Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("offset"))
    // the (key, idb) join is left unhinted: the data side is already
    // hash-partitioned on those keys by the sub_rank window, and at
    // scale the count table can exceed broadcast size; the per-block
    // totals are blockWidth-bounded and ride a broadcast
    local.join(subOffsets.drop("blk"), Seq("key", "idb"))
      .join(broadcast(offsets), Seq("blk"))
      .select(col("id").as(idCol), col("key").as(keyCol),
        (col("offset") + col("sub_off") + col("sub_rank")).cast("long").as("global_rank"))
  }
}
