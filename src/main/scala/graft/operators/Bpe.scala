package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. ACL'16) as a
  * driver-coordinated iterative DataFrame algorithm — the same shape as
  * Lloyd's in [[Similarity.trainKMeans]]: per iteration ONE distributed
  * aggregate (pair counts over the word-frequency table) and one
  * map-only rewrite; driver state is the learned merge list (numMerges
  * rows — KBs).
  *
  * The key scale property is classical: BPE trains on the DISTINCT-word
  * frequency table, not the corpus. At 100 TB of text the distinct-word
  * table is millions of rows (it is the q72-style counting pass that
  * produces it — one shuffle), and every merge iteration touches only
  * that table: pair counting is a map-side-combined aggregate over
  * symbols-per-word (bounded by word length), and applying the winning
  * merge is a per-row left-to-right fold (`aggregate` higher-order
  * function — sequential per word, parallel across words, exactly the
  * non-overlapping greedy rule single-node trainers use).
  *
  * Determinism: the winning pair per iteration is (count DESC, left
  * ASC, right ASC) — a total order, so training is reproducible and
  * differentially testable against a single-machine reference fold
  * (BpeSpec).
  */
object Bpe {

  /** End-of-word marker (Sennrich): lets merges distinguish suffixes
    * ("est</w>" in "newest") from infixes without crossing word
    * boundaries.
    */
  val EndOfWord = "</w>"

  /** The distinct-word frequency table: (word, freq). One shuffle on
    * word; map-side combined.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** word -> initial symbol array: characters + the end-of-word marker.
    * (`split(w, "")` keeps a trailing "" under Java's limit=-1 split —
    * stripped before the marker is appended.)
    */
  private def initialSymbols(word: Column): Column =
    concat(array_remove(split(word, ""), ""), array(lit(EndOfWord)))

  /** Learned merge table row. */
  final case class Merge(rank: Int, left: String, right: String, merged: String, freq: Long)

  /** Train `numMerges` BPE merges on the corpus' word-frequency table.
    * Stops early when no pair reaches `minFreq`. Driver state: the
    * returned merge list only.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minFreq: Long = 2L): Seq[Merge] = {
    var words = wordCounts(df, textCol)
      .select(initialSymbols(col("word")).as("sym"), col("freq"))
      .localCheckpoint(true)
    if (words.isEmpty) { graft.Checkpoints.release(words); return Seq.empty }

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // ONE distributed aggregate: weighted adjacent-pair counts
      val best = words
        .filter(size(col("sym")) >= 2)
        .select(explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getAs[Long]("cnt") < minFreq) done = true
      else {
        val (a, b, cnt) = (best(0).getAs[String]("a"), best(0).getAs[String]("b"),
          best(0).getAs[Long]("cnt"))
        merges += Merge(rank, a, b, a + b, cnt)
        // map-only rewrite; eager checkpoint keeps the plan flat across
        // iterations (the table is distinct words, not the corpus);
        // the superseded iteration's blocks are released immediately
        val next = words.select(applyMergeOn(col("sym"), a, b).as("sym"), col("freq"))
          .localCheckpoint(true)
        graft.Checkpoints.release(words)
        words = next
        rank += 1
      }
    }
    // driver state (the merge list) is all that survives training
    graft.Checkpoints.release(words)
    merges.result()
  }

  /** Segment a token column with a trained merge list: the same fold,
    * applied in merge-rank order (how a trained BPE tokenizer encodes
    * NEW text). Map-only — no shuffle. One projection per merge (each
    * step references the PREVIOUS step by attribute name, so the plan
    * grows linearly in numMerges; a single nested Column would
    * duplicate the fold expression ~4x per level — exponential).
    */
  def segment(df: DataFrame, tokenCol: String, merges: Seq[Merge], outCol: String): DataFrame = {
    val init = df.withColumn(outCol, initialSymbols(col(tokenCol)))
    merges.foldLeft(init) { (d, m) =>
      d.withColumn(outCol, applyMergeOn(col(outCol), m.left, m.right))
    }
  }

  /** Non-overlapping left-to-right application of ONE merge (a, b) ->
    * a+b over a symbol array, as a fold: carry the previous unmerged
    * symbol; on (prev==a, cur==b) emit the merged symbol and clear the
    * carry (so "aaa" under (a,a) becomes ["aa","a"], the greedy rule).
    */
  private def applyMergeOn(sym: Column, a: String, b: String): Column = {
    val ab = a + b
    val tail = slice(sym, lit(2), size(sym) - 1)
    val zero = struct(
      expr("CAST(array() AS array<string>)").as("acc"),
      element_at(sym, 1).as("prev"))
    val folded = aggregate(tail, zero,
      (st, x) =>
        when(st.getField("prev") === lit(a) && x === lit(b),
          struct(array_append(st.getField("acc"), lit(ab)).as("acc"),
            lit(null).cast("string").as("prev")))
          .when(st.getField("prev").isNull,
            struct(st.getField("acc").as("acc"), x.as("prev")))
          .otherwise(
            struct(array_append(st.getField("acc"), st.getField("prev")).as("acc"),
              x.as("prev"))),
      st =>
        when(st.getField("prev").isNull, st.getField("acc"))
          .otherwise(array_append(st.getField("acc"), st.getField("prev"))))
    when(size(sym) < 2, sym).otherwise(folded)
  }
}
