package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle for eagerly-checkpointed DataFrames.
  *
  * The iterative operators (Dedup.connectedComponents,
  * Dedup.ngramJaccardPairs, Similarity.trainKMeans/pqTrain) truncate
  * lineage with eager `localCheckpoint(true)` — correct for iteration,
  * but the materialized blocks live in the block manager until the
  * backing RDD is explicitly unpersisted. In a long-lived session
  * (a curation pipeline, the bench harness) un-released checkpoints
  * accumulate until memory pressure throttles every later job, so
  * every internal checkpoint an operator no longer needs is released
  * before it returns, and checkpoint-BACKED results carry a release
  * contract: consume the result (write/collect/count), then call
  * [[Checkpoints.release]] on it.
  *
  * Releasing is safe only once the frame's consumers have run — a
  * local checkpoint has no lineage to recompute from, so an action
  * after release fails with a missing-block error (by design: the
  * contract is explicit release, not GC hope).
  */
object Checkpoints {

  /** Unpersist every checkpoint-backed RDD referenced by `df`'s plan
    * (no-op for plans without one). Non-blocking; idempotent.
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Total bytes currently held by persisted/checkpointed RDD blocks —
    * the leak detector the bench records per query (a growing number
    * across unrelated queries means someone skipped release()).
    */
  def storageBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
}
