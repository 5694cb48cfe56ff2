package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis over a crawl — the quality signal crawl
  * curation ranks domains and pages by (frontier prioritization,
  * per-page quality weighting a la harmonic centrality over Common
  * Crawl's host graph; Page et al. 1999 for the recurrence itself).
  *
  * Exact-integer discipline (the q84/q108 ppm rule): ranks live in
  * ppm of the per-node mass (rank₀ = 10⁶), every contribution is a
  * truncating BIGINT division (`rank DIV out_degree`, then
  * `(damping · Σ) DIV 10⁶`), so iterations are bit-reproducible
  * across engines and the q135 DuckDB oracle can unroll them as CTE
  * levels and hash-match exactly — no float drift, ever. Semantics
  * pinned by that choice, both deliberately simple and documented:
  * dangling nodes contribute no mass (truncation PageRank) and the
  * teleport term is per-node (10⁶ − damping), so total mass is not
  * conserved — rank ORDER, the signal curation actually uses, is
  * unaffected.
  *
  * 100 TB shape: per iteration, one shuffle joining ranks to edges on
  * src (production layouts bucket BOTH by src, making it co-located)
  * and one map-side-combined groupBy dst, then a left join back onto
  * the node list so zero-in-link nodes keep their teleport rank. The
  * edge table is read every iteration — at fleet scale persist it
  * once, partitioned by src. Lineage grows linearly in `iters`;
  * checkpoint every few iterations when iters is large (quality
  * signals converge in handfuls — q135 runs 3).
  */
object LinkGraph {

  /** `(id, rank_ppm)` after `iters` truncating-integer PageRank
    * steps. `nodes` must list EVERY node id (isolated pages still
    * earn teleport rank); `edges(src, dst)` may carry duplicates —
    * they are collapsed first (a page linking twice votes once).
    */
  def pageRankInt(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be a ppm fraction, got $dampingPpm")
    val e = edges.select(col(srcCol).as("__pr_src"), col(dstCol).as("__pr_dst")).distinct()
    val deg = e.groupBy(col("__pr_src")).agg(count(lit(1)).as("__pr_deg"))
    val ed = e.join(deg, "__pr_src")
    val ids = nodes.select(col(idCol).cast("long").as("__pr_id"))
    var ranks = ids.select(col("__pr_id"), lit(1000000L).as("__pr_rank"))
    for (_ <- 1 to iters) {
      // contribution = rank DIV out_degree (SQL string: Spark exposes
      // integer division only as the DIV operator, and double-divide
      // + cast loses exactness past 2^53 — a real hub's summed mass)
      val contribs = ed.join(ranks, col("__pr_src") === col("__pr_id"))
        .selectExpr("__pr_dst", "__pr_rank DIV __pr_deg AS __pr_c")
        .groupBy(col("__pr_dst")).agg(sum(col("__pr_c")).as("__pr_s"))
      ranks = ids
        .join(contribs, ids("__pr_id") === contribs("__pr_dst"), "left")
        .selectExpr("__pr_id",
          s"${1000000L - dampingPpm}L + ($dampingPpm" +
            "L * coalesce(__pr_s, 0L)) DIV 1000000 AS __pr_rank")
    }
    ranks.select(col("__pr_id").as(idCol), col("__pr_rank").as("rank_ppm"))
  }

  /** Weighted variant for CONDENSED graphs — the shape link analysis
    * actually runs at corpus scale: pages condense to domains
    * (groupBy both endpoints), the page-link multiplicity becomes the
    * edge weight, and the node count drops by orders of magnitude
    * while no information the rank uses is lost. Contribution =
    * `(rank · w) DIV W_src` (W_src = Σ out-weights), same teleport
    * and damping arithmetic as [[pageRankInt]] — all truncating
    * BIGINT, oracle-unrollable. Duplicate (src, dst) edge rows are
    * summed into one weighted edge. Overflow bound (documented, not
    * checked — checking Σw needs its own action): `rank · w` must
    * stay under 2⁶³; with ppm masses that allows per-edge weights to
    * ~10¹¹ even on a graph whose whole mass concentrates in one node.
    */
  /** Largest-remainder (Hamilton) budget apportionment — turn a
    * weight column into INTEGER allocation slots that sum to EXACTLY
    * `budget`: the crawl scheduler's "N fetch slots across domains ∝
    * link rank", the mixture builder's "N training examples across
    * sources ∝ quota" — any place a float `weight/total · budget`
    * would round to N±k and silently break the invariant downstream
    * consumers count on. Each key gets floor(budget · w ÷ Σw); the
    * leftover slots (< number of keys by construction) go one each to
    * the largest division remainders, ties to the smaller key.
    *
    * Shape: two one-row broadcast aggregates (total weight, leftover)
    * and ONE global rank over the KEY table — the frame is key
    * cardinality (domains, sources), orders of magnitude below the
    * corpus, the q147 "per-host window" class of deliberate small
    * sort, never a corpus-sized one.
    *
    * Contract: weights non-negative with Σw > 0 (Σslots ≡ budget is
    * then exact — ApportionSpec pins it); a zero-weight key can still
    * draw a remainder bonus only after every positive remainder, i.e.
    * practically never unless budget ≥ the key count.
    */
  def apportionBudget(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    import org.apache.spark.sql.expressions.Window
    val tot = df.agg(sum(col(weightCol)).cast("long").as("_ab_tot"))
    val based = df.crossJoin(broadcast(tot))
      .withColumn("_ab_base", expr(s"($budget * $weightCol) div _ab_tot"))
      .withColumn("_ab_rem", expr(s"($budget * $weightCol) % _ab_tot"))
    val left = based.agg((lit(budget) - sum(col("_ab_base"))).cast("long").as("_ab_left"))
    based.crossJoin(broadcast(left))
      .withColumn("_ab_rn", row_number().over(
        Window.orderBy(col("_ab_rem").desc, col(keyCol))))
      .withColumn("slots", (col("_ab_base") +
        when(col("_ab_rn") <= col("_ab_left"), 1L).otherwise(0L)).cast("long"))
      .drop("_ab_tot", "_ab_base", "_ab_rem", "_ab_left", "_ab_rn")
  }

  def pageRankWeightedInt(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int,
      dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be a ppm fraction, got $dampingPpm")
    val e = edges
      .select(col(srcCol).as("__pr_src"), col(dstCol).as("__pr_dst"),
        col(weightCol).cast("long").as("__pr_w"))
      .groupBy(col("__pr_src"), col("__pr_dst"))
      .agg(sum(col("__pr_w")).as("__pr_w"))
    val wTot = e.groupBy(col("__pr_src")).agg(sum(col("__pr_w")).as("__pr_wt"))
    val ed = e.join(wTot, "__pr_src")
    val ids = nodes.select(col(idCol).cast("long").as("__pr_id")).distinct()
    var ranks = ids.select(col("__pr_id"), lit(1000000L).as("__pr_rank"))
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, col("__pr_src") === col("__pr_id"))
        .selectExpr("__pr_dst", "(__pr_rank * __pr_w) DIV __pr_wt AS __pr_c")
        .groupBy(col("__pr_dst")).agg(sum(col("__pr_c")).as("__pr_s"))
      ranks = ids
        .join(contribs, ids("__pr_id") === contribs("__pr_dst"), "left")
        .selectExpr("__pr_id",
          s"${1000000L - dampingPpm}L + ($dampingPpm" +
            "L * coalesce(__pr_s, 0L)) DIV 1000000 AS __pr_rank")
    }
    ranks.select(col("__pr_id").as(idCol), col("__pr_rank").as("rank_ppm"))
  }
}
