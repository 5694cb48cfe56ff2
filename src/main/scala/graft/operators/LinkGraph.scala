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
  * quality signals converge in handfuls (q135 runs 3), but every
  * iterative op here takes `checkpointEvery` for larger runs: on that
  * cadence the state table is eagerly localCheckpoint'ed and the
  * PREVIOUS checkpoint released (the connectedComponents discipline —
  * at most one superseded state stays materialized), so plan depth is
  * bounded by the cadence instead of growing with `iters`. The bound
  * matters BEFORE execution: every `.join` in a loop eagerly analyzes
  * the whole accumulated plan, so unchunked construction cost grows
  * super-linearly with `iters` (and [[crawlDepth]]'s state tree
  * doubles per level — exponential without truncation); after a
  * checkpoint the next iteration analyzes a LogicalRDD leaf. Results
  * are bit-identical to the unchunked path (checkpointing only
  * materializes); with a cadence set, the RETURNED frame may be
  * checkpoint-backed — consume it, then [[graft.Checkpoints.release]].
  */
object LinkGraph {

  /** Rolling lineage truncation for the iterative loops: on the
    * cadence, eagerly checkpoint the new state table(s) and release
    * the previously held checkpoint(s). Returns (state to iterate on,
    * new held list).
    */
  private def roll(
      state: Seq[DataFrame],
      held: Seq[DataFrame],
      it: Int,
      every: Int): (Seq[DataFrame], Seq[DataFrame]) =
    if (every > 0 && it % every == 0) {
      val cp = state.map(_.localCheckpoint(true))
      held.foreach(graft.Checkpoints.release)
      (cp, cp)
    } else (state, held)

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
      dampingPpm: Long = 850000L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be a ppm fraction, got $dampingPpm")
    val e = edges.select(col(srcCol).as("__pr_src"), col(dstCol).as("__pr_dst")).distinct()
    val deg = e.groupBy(col("__pr_src")).agg(count(lit(1)).as("__pr_deg"))
    val ed = e.join(deg, "__pr_src")
    val ids = nodes.select(col(idCol).cast("long").as("__pr_id"))
    var ranks = ids.select(col("__pr_id"), lit(1000000L).as("__pr_rank"))
    var held: Seq[DataFrame] = Nil
    for (it <- 1 to iters) {
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
      val (st, h) = roll(Seq(ranks), held, it, checkpointEvery)
      ranks = st.head; held = h
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
      dampingPpm: Long = 850000L,
      checkpointEvery: Int = 0): DataFrame = {
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
    var held: Seq[DataFrame] = Nil
    for (it <- 1 to iters) {
      val contribs = ed.join(ranks, col("__pr_src") === col("__pr_id"))
        .selectExpr("__pr_dst", "(__pr_rank * __pr_w) DIV __pr_wt AS __pr_c")
        .groupBy(col("__pr_dst")).agg(sum(col("__pr_c")).as("__pr_s"))
      ranks = ids
        .join(contribs, ids("__pr_id") === contribs("__pr_dst"), "left")
        .selectExpr("__pr_id",
          s"${1000000L - dampingPpm}L + ($dampingPpm" +
            "L * coalesce(__pr_s, 0L)) DIV 1000000 AS __pr_rank")
      val (st, h) = roll(Seq(ranks), held, it, checkpointEvery)
      ranks = st.head; held = h
    }
    ranks.select(col("__pr_id").as(idCol), col("__pr_rank").as("rank_ppm"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) in the same
    * exact-integer ppm discipline as [[pageRankInt]] — the SECOND
    * link-quality axis a crawl curator ranks by: PageRank finds
    * globally endorsed pages; HITS separates directories/link hubs
    * (high hub) from endorsed content (high authority), the signal
    * that demotes link farms whose PageRank looks healthy.
    *
    * Recurrence, exactly as both engines compute it: per iteration
    * auth'(v) = Σ_{u→v} hub(u), then max-normalized back to the ppm
    * scale `auth = (auth' · 10⁶) DIV max(auth')`; hub'(u) =
    * Σ_{u→v} auth(v) over the FRESH authorities, normalized the same
    * way. Max-normalization replaces the float L2 norm of the
    * textbook formulation — it is order-invariant, exactly
    * aggregatable, and preserves the ranking (scores are scale-free);
    * every step is BIGINT, so the q174 oracle unrolls iterations as
    * CTE levels and hash-matches bit-for-bit. Nodes with no in-links
    * converge to authority 0, no out-links to hub 0; both stay in the
    * output via the node-list left joins (isolated ≠ dropped).
    *
    * 100 TB shape: per iteration two blocked equi-joins (edges⋈hub on
    * src, edges⋈auth on dst) each followed by a map-side-combined
    * groupBy, plus two ONE-ROW max aggregates broadcast back — never
    * a corpus-wide window or cartesian. Same production notes as
    * [[pageRankInt]]: bucket edges by src (and a dst-keyed copy for
    * the hub step — HITS reads the graph both ways, the transpose is
    * the one extra artifact), persist edges across iterations,
    * checkpoint lineage on large `iters`. Overflow bound (documented,
    * as in [[pageRankWeightedInt]]): Σ hub ≤ n·10⁶ and the normalize
    * multiplies by 10⁶, so n must stay under ~9·10⁶ per connected
    * bucket at ppm scale — at larger n, pre-divide the sums by a
    * documented 10^k before normalizing.
    */
  def hitsInt(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).cast("long").as("__h_src"),
      col(dstCol).cast("long").as("__h_dst")).distinct()
    val ids = nodes.select(col(idCol).cast("long").as("__h_id")).distinct()
    var hub = ids.select(col("__h_id"), lit(1000000L).as("__h_hub"))
    var auth = ids.select(col("__h_id"), lit(1000000L).as("__h_auth"))
    var held: Seq[DataFrame] = Nil
    for (it <- 1 to iters) {
      val aRaw = e.join(hub, col("__h_src") === col("__h_id"))
        .groupBy(col("__h_dst")).agg(sum(col("__h_hub")).as("__h_s"))
      val aMax = aRaw.agg(coalesce(max(col("__h_s")), lit(1L)).as("__h_m"))
      auth = ids.join(aRaw, ids("__h_id") === aRaw("__h_dst"), "left")
        .crossJoin(broadcast(aMax))
        .selectExpr("__h_id",
          "(coalesce(__h_s, 0L) * 1000000L) DIV __h_m AS __h_auth")
      val hRaw = e.join(auth, col("__h_dst") === col("__h_id"))
        .groupBy(col("__h_src")).agg(sum(col("__h_auth")).as("__h_s"))
      val hMax = hRaw.agg(coalesce(max(col("__h_s")), lit(1L)).as("__h_m"))
      hub = ids.join(hRaw, ids("__h_id") === hRaw("__h_src"), "left")
        .crossJoin(broadcast(hMax))
        .selectExpr("__h_id",
          "(coalesce(__h_s, 0L) * 1000000L) DIV __h_m AS __h_hub")
      val (st, h) = roll(Seq(hub, auth), held, it, checkpointEvery)
      hub = st(0); auth = st(1); held = h
    }
    hub.join(auth, "__h_id")
      .select(col("__h_id").as(idCol), col("__h_hub").as("hub_ppm"),
        col("__h_auth").as("auth_ppm"))
  }

  /** Redirect-chain resolution by POINTER DOUBLING — collapse the
    * 3xx chains a crawl actually contains (http→https, slash
    * canonicalization, moved pages) to each URL's FINAL target in
    * O(log maxHops) rounds instead of O(maxHops): per round the map
    * m(u) = (target, hops) composes with itself — if m(u)'s target is
    * itself a redirect source, u jumps to its target's target and the
    * hop counts ADD. After ⌈log₂ maxHops⌉ rounds every chain of
    * length ≤ maxHops has fully collapsed; what hasn't is a cycle or
    * an over-long chain, both reported `resolved = false` exactly as
    * a fetcher would give up on them (RFC-style redirect caps).
    *
    * Output: one row per redirect SOURCE — (url, final_url, hops,
    * resolved); `resolved` ⇔ final_url is not itself a redirect
    * source AND hops ≤ maxHops. Deterministic pure-integer hop
    * arithmetic ⇒ the q175 oracle re-derives it with a bounded
    * recursive CTE and hash-matches exactly.
    *
    * 100 TB shape: each round is ONE self equi-join of the map on
    * (target = source) — no corpus scan, no window; the map never
    * grows (one row per original source). log₂ rounds beats the
    * naive hop-at-a-time walk the same way prefix doubling beat it
    * for suffix arrays (q107). Production: bucket the map by source
    * and target symmetrically so rounds are co-located.
    */
  def resolveRedirects(
      redirects: DataFrame,
      srcCol: String,
      dstCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(
      (maxHops - 1).max(1).toLong).toInt // ceil(log2(maxHops))
    var m = redirects
      .select(col(srcCol).cast("string").as("__rd_u"),
        col(dstCol).cast("string").as("__rd_t"))
      .distinct()
      .withColumn("__rd_h", lit(1L))
    for (_ <- 1 to rounds) {
      val nxt = m.select(col("__rd_u").as("__rd_u2"),
        col("__rd_t").as("__rd_t2"), col("__rd_h").as("__rd_h2"))
      m = m.join(nxt, m("__rd_t") === nxt("__rd_u2"), "left")
        .select(col("__rd_u"),
          coalesce(col("__rd_t2"), col("__rd_t")).as("__rd_t"),
          (col("__rd_h") + coalesce(col("__rd_h2"), lit(0L))).as("__rd_h"))
    }
    val srcs = m.select(col("__rd_u").as("__rd_s")).distinct()
    m.join(srcs, m("__rd_t") === srcs("__rd_s"), "left")
      .select(col("__rd_u").as("url"), col("__rd_t").as("final_url"),
        col("__rd_h").as("hops"),
        (col("__rd_s").isNull && col("__rd_h") <= maxHops).as("resolved"))
  }

  /** Co-citation pairs (Small 1973) — link-structure document
    * similarity: two pages are related in proportion to how many
    * DISTINCT sources link both. The "related pages" signal that
    * needs no text at all — it finds translations, mirrors, and
    * topical siblings that lexical similarity misses, and it is the
    * link-side member of the near-dup candidate family (q28/q31).
    *
    * Scale discipline: pairs explode as deg² per source, so sources
    * above `maxSrcDegree` are DROPPED before pairing — the standard
    * co-citation hygiene (a directory page linking 10⁴ pages
    * co-cites everything and carries no signal, exactly a stopword;
    * same role as the PPJoin prefix bound in q30). With the cap, the
    * self-join on src is a blocked equi-join producing ≤ cap²/2 rows
    * per source — never corpus×corpus. Returns (doc_a, doc_b,
    * n_common) with doc_a < doc_b, duplicate edges collapsed first.
    */
  def coCitation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxSrcDegree: Int = 64): DataFrame = {
    require(maxSrcDegree >= 2, s"maxSrcDegree must be >= 2: $maxSrcDegree")
    val e = edges.select(col(srcCol).cast("long").as("__cc_s"),
      col(dstCol).cast("long").as("__cc_d")).distinct()
    val keep = e.groupBy(col("__cc_s")).agg(count(lit(1)).as("__cc_dg"))
      .filter(col("__cc_dg") <= maxSrcDegree)
      .select(col("__cc_s"))
    val ek = e.join(keep, Seq("__cc_s"), "left_semi")
    val right = ek.select(col("__cc_s").as("__cc_s2"), col("__cc_d").as("__cc_d2"))
    ek.join(right,
        col("__cc_s") === col("__cc_s2") && col("__cc_d") < col("__cc_d2"))
      .groupBy(col("__cc_d").as("doc_a"), col("__cc_d2").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** Bibliographic coupling (Kessler 1963) — the DUAL of
    * [[coCitation]]: two SOURCES are related in proportion to how
    * many distinct targets they both link. Where co-citation finds
    * related CONTENT (endorsed by the same pages), coupling finds
    * related PUBLISHERS — template families and mirror shells share
    * outlink sets long before their text matches. Same machinery with
    * the edge roles swapped; the cap now drops high IN-degree targets
    * (a page everyone links — a home page, a license page — couples
    * everything, the stopword rule again). Returns (src_a, src_b,
    * n_common), src_a < src_b.
    */
  def bibliographicCoupling(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDstInDegree: Int = 64): DataFrame =
    coCitation(
      edges.select(col(dstCol).as("__bc_s"), col(srcCol).as("__bc_d")),
      "__bc_s", "__bc_d", maxDstInDegree)
      .withColumnRenamed("doc_a", "src_a")
      .withColumnRenamed("doc_b", "src_b")

  /** Per-node degree and reciprocity statistics — the structural
    * link-graph report next to the rank queries: out/in degree and
    * the fraction of a node's out-links that are RECIPROCATED
    * (dst links back), in exact ppm. High reciprocity at domain
    * scale is the classic link-exchange/spam-ring signature (the
    * Becchetti et al. 2008 web-spam feature family); near-zero
    * reciprocity marks genuine editorial endorsement. Self-loops are
    * dropped (trivially reciprocal — pure noise for the signal).
    *
    * Plan shape: duplicate edges collapse once; reciprocity is ONE
    * self equi-join of the edge list on the swapped pair key — never
    * node×node — and the three counts are map-side-combined groupBys
    * joined back onto the node list (isolated nodes report zeros).
    * At 100 TB: the same src/dst symmetric bucketing as
    * [[resolveRedirects]] makes the swap join co-located.
    */
  def degreeStats(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("__dg_s"),
        col(dstCol).cast("long").as("__dg_d"))
      .filter(col("__dg_s") =!= col("__dg_d"))
      .distinct()
    val outD = e.groupBy(col("__dg_s")).agg(count(lit(1)).as("__dg_o"))
    val inD = e.groupBy(col("__dg_d")).agg(count(lit(1)).as("__dg_i"))
    val sw = e.select(col("__dg_d").as("__dg_s2"), col("__dg_s").as("__dg_d2"))
    val rec = e.join(sw,
        col("__dg_s") === col("__dg_s2") && col("__dg_d") === col("__dg_d2"),
        "left_semi")
      .groupBy(col("__dg_s")).agg(count(lit(1)).as("__dg_r"))
    nodes.select(col(idCol).cast("long").as("__dg_id")).distinct()
      .join(outD, col("__dg_id") === outD("__dg_s"), "left").drop("__dg_s")
      .join(inD, col("__dg_id") === inD("__dg_d"), "left").drop("__dg_d")
      .join(rec, col("__dg_id") === rec("__dg_s"), "left").drop("__dg_s")
      .selectExpr("__dg_id",
        "coalesce(__dg_o, 0L) AS __o", "coalesce(__dg_i, 0L) AS __i",
        "coalesce(__dg_r, 0L) AS __r")
      .selectExpr(s"__dg_id AS $idCol", "__o AS out_deg", "__i AS in_deg",
        "__r AS n_reciprocal",
        "CASE WHEN __o > 0 THEN (__r * 1000000L) DIV __o ELSE 0L END AS recip_ppm")
  }

  /** Seeded ("personalized") PageRank — TrustRank (Gyöngyi,
    * Garcia-Molina & Pedersen 2004; Haveliwala 2002's topic-sensitive
    * form): identical recurrence to [[pageRankInt]] except the
    * teleport term lands ONLY on a trusted seed set, so rank mass can
    * reach a page exclusively through link paths from the seeds. The
    * signal crawl curation uses to demote link farms that
    * self-endorse: uniform PageRank pays every page a teleport
    * stipend a spam ring can amplify; TrustRank pays only the
    * human-vetted seeds, and a page unreachable from them converges
    * to exactly 0 — the integer arithmetic makes that a true zero,
    * not an epsilon.
    *
    * rank₀ = 10⁶ on seeds, 0 elsewhere; per iteration
    * rank'(v) = [v ∈ seeds]·(10⁶ − d) + (d · Σ_{u→v} rank(u) DIV
    * deg(u)) DIV 10⁶ — all truncating BIGINT, so the q188 oracle
    * unrolls iterations as CTE levels and hash-matches bit-for-bit.
    *
    * 100 TB shape: identical to [[pageRankInt]] (one src-keyed edge
    * join + one map-side-combined groupBy per iteration) plus ONE
    * extra left join onto the seed list per iteration — seeds are a
    * curated handful, so that join broadcasts. Same production notes:
    * bucket edges by src, persist across iterations, checkpoint on
    * large `iters`.
    */
  def personalizedPageRankInt(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iters: Int,
      dampingPpm: Long = 850000L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be a ppm fraction, got $dampingPpm")
    val e = edges.select(col(srcCol).cast("long").as("__pp_src"),
      col(dstCol).cast("long").as("__pp_dst")).distinct()
    val deg = e.groupBy(col("__pp_src")).agg(count(lit(1)).as("__pp_deg"))
    val ed = e.join(deg, "__pp_src")
    val sd = seeds.select(col(seedCol).cast("long").as("__pp_id")).distinct()
      .withColumn("__pp_seed", lit(true))
    val ids = nodes.select(col(idCol).cast("long").as("__pp_id")).distinct()
      .join(sd, Seq("__pp_id"), "left")
      .select(col("__pp_id"),
        coalesce(col("__pp_seed"), lit(false)).as("__pp_seed"))
    var ranks = ids.selectExpr("__pp_id",
      "CASE WHEN __pp_seed THEN 1000000L ELSE 0L END AS __pp_rank")
    var held: Seq[DataFrame] = Nil
    for (it <- 1 to iters) {
      val contribs = ed.join(ranks, col("__pp_src") === col("__pp_id"))
        .selectExpr("__pp_dst", "__pp_rank DIV __pp_deg AS __pp_c")
        .groupBy(col("__pp_dst")).agg(sum(col("__pp_c")).as("__pp_s"))
      ranks = ids
        .join(contribs, ids("__pp_id") === contribs("__pp_dst"), "left")
        .selectExpr("__pp_id",
          s"CASE WHEN __pp_seed THEN ${1000000L - dampingPpm}L ELSE 0L END" +
            s" + ($dampingPpm" +
            "L * coalesce(__pp_s, 0L)) DIV 1000000 AS __pp_rank")
      val (st, h) = roll(Seq(ranks), held, it, checkpointEvery)
      ranks = st.head; held = h
    }
    ranks.join(ids, "__pp_id")
      .select(col("__pp_id").as(idCol), col("__pp_rank").as("trust_ppm"),
        col("__pp_seed").as("is_seed"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007)
    * over the UNDIRECTED link graph — community detection, the graph
    * signal dedup/mirror analysis reads that components can't give:
    * connected components merge everything reachable (one bridge link
    * fuses two mirror farms); label propagation converges to locally
    * DENSE groups, splitting a sparse bridge while keeping each clique
    * together — the shape of mirror clusters, spam rings, and template
    * families in a real crawl.
    *
    * Deterministic semantics (the paper's random tie-break replaced by
    * a total order, the same determinism discipline as every q-gated
    * operator): labels₀(v) = v; per SYNCHRONOUS round every node with
    * ≥ 1 neighbor adopts the most frequent label among its neighbors'
    * PREVIOUS labels, ties to the smallest label; isolated nodes keep
    * their own. Self-loops are dropped (a self-vote for your current
    * label is a fixed-point bias, not information). Pure counting ⇒
    * the q187 oracle unrolls rounds as CTE levels and hash-matches.
    *
    * 100 TB shape: per round ONE equi-join of the symmetrized edge
    * list to the label table on the neighbor key, one map-side-
    * combined count per (node, label), and one argmax groupBy per
    * node — candidate rows per node are bounded by its degree, so the
    * argmax is a bounded merge, never a corpus window. Symmetrized
    * edges are built once; persist them bucketed by the join key in
    * production and checkpoint labels every few rounds (LPA converges
    * in single digits on web graphs — the paper reports ~5).
    */
  def labelPropagationInt(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val dir = edges.select(col(srcCol).cast("long").as("__lp_a"),
        col(dstCol).cast("long").as("__lp_b"))
      .filter(col("__lp_a") =!= col("__lp_b"))
    // UNION (not UNION ALL) of both directions: undirected neighbor
    // set, one vote per neighbor regardless of link direction/count
    val eu = dir.union(dir.select(col("__lp_b").as("__lp_a"),
      col("__lp_a").as("__lp_b"))).distinct()
    val ids = nodes.select(col(idCol).cast("long").as("__lp_id")).distinct()
    var lbl = ids.select(col("__lp_id"), col("__lp_id").as("__lp_lbl"))
    var held: Seq[DataFrame] = Nil
    for (it <- 1 to iters) {
      val cnt = eu.join(lbl, eu("__lp_b") === lbl("__lp_id"))
        .groupBy(col("__lp_a"), col("__lp_lbl"))
        .agg(count(lit(1)).as("__lp_c"))
      // argmax by (count DESC, label ASC) as a single min(struct):
      // bounded by degree, no window
      val best = cnt.groupBy(col("__lp_a"))
        .agg(min(struct((-col("__lp_c")).as("nc"),
          col("__lp_lbl").as("l"))).as("__lp_b"))
        .select(col("__lp_a"), col("__lp_b.l").as("__lp_new"))
      lbl = lbl.join(best, lbl("__lp_id") === best("__lp_a"), "left")
        .select(col("__lp_id"),
          coalesce(col("__lp_new"), col("__lp_lbl")).as("__lp_lbl"))
      val (st, h) = roll(Seq(lbl), held, it, checkpointEvery)
      lbl = st.head; held = h
    }
    lbl.select(col("__lp_id").as(idCol), col("__lp_lbl").as("community"))
  }

  /** Minimum-hop crawl depth from a seed set by FRONTIER expansion —
    * the "how far from the quality seeds is this page" signal seeded
    * crawls (and seeded-quality corpus filters a la common
    * seed-distance heuristics) key on. BFS semantics: depth(v) = min
    * hops from ANY seed, seeds at 0; nodes unreached within
    * `maxDepth` report −1 (distinguishable from every real depth).
    *
    * Per level: the CURRENT frontier (rows at depth d−1) joins edges
    * on src — one blocked equi-join costing |frontier-out-edges|,
    * never |graph| — then a LEFT ANTI join against the visited set
    * drops re-reached nodes (their first reach was their min, the BFS
    * invariant), and survivors append at depth d. The visited set
    * grows monotonically and is the only state; no window, no
    * cartesian, all integer ⇒ the q176 oracle re-derives depths with
    * a bounded recursive CTE + min() and hash-matches. Production:
    * persist edges bucketed by src; checkpoint the visited set every
    * few levels (lineage grows linearly in depth).
    */
  def crawlDepth(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int,
      checkpointEvery: Int = 0): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0: $maxDepth")
    val e = edges.select(col(srcCol).cast("long").as("__bd_src"),
      col(dstCol).cast("long").as("__bd_dst")).distinct()
    val ids = nodes.select(col(idCol).cast("long").as("__bd_id")).distinct()
    var visited = seeds.select(col(seedCol).cast("long").as("__bd_id")).distinct()
      .withColumn("__bd_d", lit(0L))
    var frontier = visited
    var held: Seq[DataFrame] = Nil
    for (d <- 1 to maxDepth) {
      val reached = frontier.join(e, frontier("__bd_id") === e("__bd_src"))
        .select(col("__bd_dst").as("__bd_id")).distinct()
      frontier = reached.join(visited.select("__bd_id"),
          Seq("__bd_id"), "left_anti")
        .withColumn("__bd_d", lit(d.toLong))
      visited = visited.union(frontier)
      val (st, h) = roll(Seq(visited, frontier), held, d, checkpointEvery)
      visited = st(0); frontier = st(1); held = h
    }
    ids.join(visited, Seq("__bd_id"), "left")
      .select(col("__bd_id").as(idCol),
        coalesce(col("__bd_d"), lit(-1L)).as("depth"))
  }
}
