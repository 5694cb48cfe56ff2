package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus n-gram language-model quality scoring — the CCNet/KenLM-
  * shaped signal (Wenzek et al. LREC'20 filter CommonCrawl by LM
  * perplexity): score each document by how well a corpus-trained
  * n-gram model predicts its tokens, with BACKOFF to shorter contexts
  * for unseen n-grams.
  *
  * The smoothing is stupid backoff (Brants et al. EMNLP'07 §4 — the
  * published scheme FOR distributed MapReduce-counted models, chosen
  * there for exactly the property we need: no held-out normalization
  * pass, every term a ratio of two raw counts):
  *
  *   S(w | w1 w2) = c3(w1 w2 w) / c2(w1 w2)          if c3 > 0
  *                = α · c2(w2 w) / c1(w2)            elif c2 > 0
  *                = α² · c1(w) / C                   otherwise
  *
  * with α = 0.4 = 2/5 (the paper's constant), over LEAVE-ONE-DOCUMENT-
  * OUT counts: every count is the corpus total MINUS the scored doc's
  * own occurrences. CCNet scores text with a model trained on a
  * held-out reference corpus; when the model is trained on the scored
  * corpus itself (the self-curation setting), the held-out subtraction
  * is what preserves the signal — otherwise every singleton trigram
  * "predicts itself" with probability 1 and unique gibberish scores as
  * maximally familiar.
  *
  * Two scoring surfaces:
  *   - [[scoreDocsPpm]] — the ORACLE-GATED form: every per-token score
  *     is floored to integer parts-per-million BEFORE aggregation,
  *     floor(1e6·αᵇ·num/den) = (1e6·2ᵇ·num) div (5ᵇ·den), so the whole
  *     pipeline is exact BIGINT arithmetic (the q84 discipline
  *     generalized to order-3-with-backoff: integer counts, integer
  *     divisions, zero float folds anywhere). A float log-prob sum
  *     would hash differently per shuffle order; this does not.
  *     BIGINT headroom: numerators are bounded by 4·10⁶·C — exact to
  *     corpus sizes of ~2.3·10¹² tokens; past that, promote the two
  *     scaled products to DECIMAL(38,0) (one-line change, same
  *     semantics).
  *   - [[logProbPerToken]] — the conventional avg-log₂-prob surface
  *     for consumers that want real perplexity units; per-doc sums
  *     fold over a SORTED collected list so the result is
  *     deterministic per plan, but it is float and therefore
  *     spec-gated (NgramLmSpec, driver-reference tolerance), not
  *     oracle-gated.
  *
  * Scale shape (the Brants et al. architecture, re-expressed in
  * DataFrame ops): three n-gram count aggregates over one token
  * explode (map-side partial combine collapses each partition's
  * repeats — gram traffic is per-distinct-gram, not per-occurrence);
  * scoring is five hash EQUI-joins of position rows against the count
  * tables (broadcast when vocab is small, shuffle otherwise — never a
  * cross join), then one per-doc aggregate. Everything whole-stage
  * codegen; cost linear in corpus tokens + vocab.
  */
object NgramLm {

  /** α = alphaNum/alphaDen — stupid backoff's discount per backoff
    * step. 2/5 is Brants et al.'s 0.4, kept rational so the ppm
    * arithmetic stays integer.
    */
  val AlphaNum = 2L
  val AlphaDen = 5L

  /** Space-joined order-n gram rows off a `toks` column, streamed
    * through the native explode_ngrams Generator (r21): the composed
    * `explode(transform(sequence(...), concat_ws(element_at...)))`
    * materialized the full gram array per document under an
    * interpreted lambda; the generator emits the SAME rows (same
    * grams, same ascending-position order, nothing for docs shorter
    * than n — the `when(...).otherwise(empty)` guard folded in) with
    * O(1) state.
    */
  private def gramRows(toks: Column, n: Int): Column = {
    import graft.functions.VectorExpressions
    call_function(VectorExpressions.ngramsFnName, toks, lit(n))
  }

  /** Corpus count table for order-n grams: (gram, cnt). */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(TextFunctions.tokens(col(textCol)).as("toks"))
      .select(gramRows(col("toks"), n).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))

  /** Per-doc + corpus count table for order-n grams over `base`
    * (doc, toks): (doc, gram, dcnt, cnt) — dcnt = occurrences inside
    * the doc, cnt = corpus-wide. One groupBy plus one gram-keyed
    * aggregate+join; per-distinct-(doc, gram) traffic.
    */
  private def dualCounts(base: DataFrame, n: Int): DataFrame = {
    val perDoc = base
      .select(col("doc"),
        (if (n == 1) explode(col("toks"))
         else gramRows(col("toks"), n)).as("gram"))
      .groupBy(col("doc"), col("gram")).agg(count(lit(1)).as("dcnt"))
    val corpus = perDoc.groupBy(col("gram")).agg(sum(col("dcnt")).as("cnt"))
    perDoc.join(corpus, Seq("gram"))
  }

  /** Per-position scored rows (internal): token w at position i >= 3
    * with context (w1, w2), joined against the three count tables
    * with LEAVE-ONE-DOCUMENT-OUT effective counts: cXeff = corpus
    * count MINUS the scored doc's own occurrences. Self-scoring a
    * corpus without this is vacuous — every singleton trigram "hits"
    * itself with probability 1, so unique gibberish would score as
    * maximally familiar; held-out semantics (CCNet trains the LM on a
    * reference corpus, not the scored text) are what makes the score
    * a quality signal. Columns: doc, c3eff, c2ctxeff, c2boeff,
    * c1ctxeff, c1weff, ctoteff (all >= 0 BIGINT).
    */
  private def scoredPositions(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.VectorExpressions
    VectorExpressions.register(docs.sparkSession)
    val base = docs
      .select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
    val toks = base.filter(size(col("toks")) >= 3)
    // position rows stream through the native explode_tri_contexts
    // Generator (r22, the gramRows precedent at order 3 with separate
    // context fields): the composed explode(transform(sequence(...)))
    // materialized a full per-doc struct array under an interpreted
    // lambda — three boxed element_at calls per position — before the
    // explode copied it back out. Same rows, same ascending-position
    // order, O(1) state.
    val pos = toks.select(col("doc"), size(col("toks")).cast("long").as("doclen"),
        call_function(VectorExpressions.triFnName, col("toks")))
      .select(col("doc"), col("doclen"), col("w1"), col("w2"), col("w"))
    val c1 = dualCounts(base, 1)
    val c2 = dualCounts(base, 2)
    val c3 = dualCounts(base, 3)
    val total = base.select(explode(col("toks")).as("t"))
      .agg(count(lit(1)).as("ctotal"))
    def eff(t: DataFrame, as: String, key: Column) = {
      val j = t.select(col("doc"), col("gram"),
        (col("cnt") - col("dcnt")).as(as))
      (j, key)
    }
    val (e3, k3) = eff(c3, "c3eff", concat_ws(" ", col("w1"), col("w2"), col("w")))
    val (e2c, k2c) = eff(c2, "c2ctxeff", concat_ws(" ", col("w1"), col("w2")))
    val (e2b, k2b) = eff(c2, "c2boeff", concat_ws(" ", col("w2"), col("w")))
    val (e1c, k1c) = eff(c1, "c1ctxeff", col("w2"))
    val (e1w, k1w) = eff(c1, "c1weff", col("w"))
    def join1(d: DataFrame, e: DataFrame, key: Column) =
      d.join(e.withColumnRenamed("doc", "edoc"),
          col("doc") === col("edoc") && key === col("gram"), "left")
        .drop("edoc", "gram")
    val joined = Seq((e3, k3), (e2c, k2c), (e2b, k2b), (e1c, k1c), (e1w, k1w))
      .foldLeft(pos) { case (d, (e, k)) => join1(d, e, k) }
    // a gram absent from the doc's own rows means the doc never
    // contains it — impossible for scored positions (every key is
    // drawn from the doc itself), so the left joins always hit and
    // eff values are never null; coalesce is belt-and-braces
    joined
      .select(col("doc"),
        coalesce(col("c3eff"), lit(0L)).as("c3eff"),
        coalesce(col("c2ctxeff"), lit(0L)).as("c2ctxeff"),
        coalesce(col("c2boeff"), lit(0L)).as("c2boeff"),
        coalesce(col("c1ctxeff"), lit(0L)).as("c1ctxeff"),
        coalesce(col("c1weff"), lit(0L)).as("c1weff"),
        col("doclen"))
      .crossJoin(broadcast(total))
      .withColumn("ctoteff", col("ctotal") - col("doclen"))
  }

  /** Integer-exact per-token backoff score in parts-per-million, and
    * its backoff level: (m_ppm, level). level 0 = trigram hit,
    * 1 = bigram backoff, 2 = unigram backoff, 3 = OOV outside the
    * scored doc (score 0). All BIGINT. A level-0 hit guarantees its
    * context bigram also occurs outside the doc (the trigram embeds
    * it), so denominators at the matched level are never zero; same
    * argument one level down.
    */
  private def ppmCols: (Column, Column) = {
    val m = when(col("c3eff") >= 1L,
        expr("(1000000 * c3eff) DIV c2ctxeff"))
      .when(col("c2boeff") >= 1L,
        expr(s"(1000000 * $AlphaNum * c2boeff) DIV ($AlphaDen * c1ctxeff)"))
      .when(col("c1weff") >= 1L,
        expr(s"(1000000 * ${AlphaNum * AlphaNum} * c1weff) DIV " +
          s"(${AlphaDen * AlphaDen} * ctoteff)"))
      .otherwise(lit(0L))
    val level = when(col("c3eff") >= 1L, 0L)
      .when(col("c2boeff") >= 1L, 1L)
      .when(col("c1weff") >= 1L, 2L)
      .otherwise(3L)
    (m, level)
  }

  /** The oracle-gated per-document quality score: arithmetic mean of
    * per-token stupid-backoff scores in ppm (each token's score
    * floor-truncated to integer ppm BEFORE the sum — the step that
    * makes the whole aggregate exact), plus the backoff-level census.
    * Output: (doc_id, n_scored, n_tri, n_bi, n_uni, score_ppm),
    * score_ppm = sum(m_ppm) div n_scored — high means the corpus LM
    * finds the document predictable, low flags gibberish/outliers
    * (the CCNet filtering axis, arithmetic-mean form; for log-space
    * perplexity units use [[logProbPerToken]]).
    */
  def scoreDocsPpm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (m, level) = ppmCols
    scoredPositions(docs, idCol, textCol)
      .select(col("doc"), m.as("m"), level.as("lvl"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("lvl") === 0L, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 1L, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 2L, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("lvl") === 3L, 1L).otherwise(0L)).as("n_oov"),
        sum(col("m")).as("m_sum"))
      .select(col("doc").as("doc_id"), col("n_scored"), col("n_tri"),
        col("n_bi"), col("n_uni"), col("n_oov"),
        expr("m_sum DIV n_scored").as("score_ppm"))
  }

  /** Average log₂ token probability per doc (the conventional
    * perplexity surface: ppl = 2^(-avg_log2p)). Per-doc terms fold
    * over a SORTED collect_list so the float sum is order-
    * deterministic; spec-gated against a driver reference.
    */
  def logProbPerToken(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (m, _) = ppmCols
    // exact rational per token: log2(num/den) with the αᵇ folded in;
    // OOV-outside-the-doc takes an add-one floor (α²/(ctoteff+1)) —
    // log2(0) would sink the whole doc to -inf
    val lp = when(col("c3eff") >= 1L,
        log2(col("c3eff").cast("double")) - log2(col("c2ctxeff").cast("double")))
      .when(col("c2boeff") >= 1L,
        log2(lit(AlphaNum.toDouble) * col("c2boeff").cast("double")) -
          log2(lit(AlphaDen.toDouble) * col("c1ctxeff").cast("double")))
      .when(col("c1weff") >= 1L,
        log2(lit((AlphaNum * AlphaNum).toDouble) * col("c1weff").cast("double")) -
          log2(lit((AlphaDen * AlphaDen).toDouble) * col("ctoteff").cast("double")))
      .otherwise(
        log2(lit((AlphaNum * AlphaNum).toDouble)) -
          log2(lit(AlphaDen.toDouble * AlphaDen) * (col("ctoteff").cast("double") + 1.0)))
    scoredPositions(docs, idCol, textCol)
      .select(col("doc"), m.as("m"), lp.as("lp"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_scored"),
        aggregate(sort_array(collect_list(struct(col("m"), col("lp")))),
          lit(0.0), (acc, x) => acc + x.getField("lp")).as("lp_sum"))
      .select(col("doc").as("doc_id"), col("n_scored"),
        (col("lp_sum") / col("n_scored")).as("avg_log2p"))
  }
}
