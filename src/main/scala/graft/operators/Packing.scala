package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy NO-SPLIT sequence packing — the SFT-style counterpart of
  * q87/q182's concat-and-chunk packing: documents are never split
  * across packed sequences; a doc that would overflow the window
  * closes the bin and starts the next one, and a doc longer than the
  * window sits alone in its own bin (flagged, never silently
  * truncated). This is the batch-construction rule instruction-tuning
  * loaders use, where example boundaries must align with document
  * boundaries.
  *
  * Greedy packing is a sequential recurrence (each bin decision
  * depends on the running fill), so it cannot be a window function at
  * scale. The scale contract mirrors the repo's blocked-prefix
  * discipline: docs pack within BLOCKS of `blockDocs` consecutive ids
  * (block = id div blockDocs — a data value, partition-independent),
  * one shuffle on the block key, and the per-group sequential fold
  * touches at most `blockDocs` rows in memory. Bins never cross
  * blocks (the only divergence from a fully-serial pack, and the one
  * that makes the operator embarrassingly parallel — the production
  * shape: packing is shard-local anyway); bin ids are globally unique
  * by construction (block * blockDocs + local ordinal, local bins <=
  * docs in block).
  *
  * Deterministic under any executor layout; integer-exact; the q234
  * oracle replays the same recurrence as a recursive CTE.
  */
object Packing {

  /** Per doc: its token count, the global bin it packs into, its
    * position within the bin, the bin's running fill after it, and
    * the overflow flag (n_tok > windowTokens: the doc owns the bin).
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Long,
      blockDocs: Long = 128L): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1: $windowTokens")
    require(blockDocs >= 1, s"blockDocs must be >= 1: $blockDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(graft.functions.TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_tok"))
      .withColumn("blk", expr(s"doc_id div $blockDocs"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (blk, it) =>
        // bounded by the blockDocs contract: one block sorts in memory
        val ds = it.toArray.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        var pos = 0
        val out = new scala.collection.mutable.ArrayBuffer[
          (Long, Long, Long, Int, Long, Boolean)](ds.length)
        ds.foreach { case (id, n, _) =>
          val overflow = n > windowTokens
          if (fill > 0 && (overflow || fill + n > windowTokens)) {
            bin += 1; fill = 0L; pos = 0
          }
          fill += n
          out += ((id, n, blk * blockDocs + bin, pos, fill, overflow))
          pos += 1
          if (overflow) { bin += 1; fill = 0L; pos = 0 }
        }
        out.iterator
      }
      .toDF("doc_id", "n_tok", "bin_id", "bin_pos", "bin_fill", "overflow")
  }
}
