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

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective example constructor: masked spans are
    * replaced by incrementing sentinels in the INPUT, and the TARGET
    * is the sentinel-prefixed concatenation of the masked spans. The
    * span placement here is a DETERMINISTIC stand-in for the seeded
    * RNG a trainer injects (position p masks iff
    * (doc_id + p) mod 7 < 3 — 3-token spans at ~43% density, merged
    * runs impossible by period): the CONSTRUCTION — span grouping,
    * sentinel numbering, input/target assembly — is the operator; the
    * q247 oracle replays every step. A span START is a masked
    * position whose predecessor is unmasked: the mod-0 hits, PLUS
    * position 0 when the document head lands mid-run (doc_id mod 7
    * in {1,2}) — that head span is CLIPPED to the 3 - mod tokens the
    * rule actually masks, so no masked token is ever dropped without
    * a sentinel (T5's invariant: input sentinels and target spans
    * partition the masked set). Map-only (higher-order array
    * expressions over each doc's own token array), no shuffle, no UDF.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")))
      // 0-based positions where a masked span STARTS: masked (mod < 3)
      // with an unmasked predecessor — mod-0 hits, plus a clipped head
      // span when position 0 itself lands mid-run (mod 1 or 2)
      .withColumn("starts",
        filter(sequence(lit(0), col("n") - 1), p => {
          val m = pmod(col(idCol) + p, lit(7))
          m === 0 || (p === 0 && m < 3)
        }))
      .withColumn("input_text",
        array_join(
          filter(
            transform(sequence(lit(0), col("n") - 1), p => {
              val m = pmod(col(idCol) + p, lit(7))
              when(m === 0 || (p === 0 && m < 3),
                concat(lit("<extra_id_"),
                  (size(filter(col("starts"), x => x <= p)) - 1).cast("string"),
                  lit(">")))
                .when(m < 3, lit(null).cast("string"))
                .otherwise(element_at(col("toks"), p + 1))
            }),
            x => x.isNotNull),
          " "))
      // each span covers 3 - mod(start) tokens (3 for a mod-0 start;
      // 2 or 1 for the clipped head), clipped to the document end
      .withColumn("target_text",
        array_join(
          transform(col("starts"), (s, k) =>
            concat(lit("<extra_id_"), k.cast("string"), lit("> "),
              array_join(
                transform(
                  // cast back to int: pmod against the bigint id col
                  // widens the bound, and element_at needs an INT index
                  sequence(s,
                    least(s + lit(2) - pmod(col(idCol) + s, lit(7)),
                      col("n") - 1).cast("int")),
                  p => element_at(col("toks"), p + 1)),
                " "))),
          " "))
      .select(col(idCol), col("n").cast("long").as("n_tok"),
        size(col("starts")).cast("long").as("n_spans"),
        col("input_text"), col("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022) — the
    * code-model pretraining rewrite: each document splits at the
    * n/3 and 2n/3 token boundaries (deterministic stand-ins for the
    * sampled split points) and is re-serialized in PSM order
    * (<PRE> prefix <SUF> suffix <MID> middle) and SPM order. Map-only.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")))
      .withColumn("c1", expr("n div 3"))
      .withColumn("c2", expr("(2 * n) div 3"))
      .withColumn("pre", array_join(slice(col("toks"), lit(1), col("c1")), " "))
      .withColumn("mid",
        array_join(slice(col("toks"), col("c1") + 1, col("c2") - col("c1")), " "))
      .withColumn("suf",
        array_join(slice(col("toks"), col("c2") + 1, col("n") - col("c2")), " "))
      .select(col(idCol),
        col("n").cast("long").as("n_tok"),
        concat(lit("<PRE> "), col("pre"), lit(" <SUF> "), col("suf"),
          lit(" <MID> "), col("mid")).as("psm"),
        concat(lit("<SUF> "), col("suf"), lit(" <PRE> "), col("pre"),
          lit(" <MID> "), col("mid")).as("spm"))
  }
}
