package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorExpressions}

/** Deduplication operator suite for corpus curation — exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design (the 100 TB story):
  *   - per-document signature computation runs as explode -> hash ->
  *     codegen'd grouped aggregation (32 mins / 60 bit-sums as flat
  *     aggregate columns), NOT as interpreted higher-order lambda folds:
  *     the hash is computed once per token, partial aggregation combines
  *     map-side, and the whole stage is whole-stage-codegen. (Measured
  *     at sf0.1: the lambda-fold formulation was 4-30x slower.)
  *   - candidate generation is always a *blocked* equi-self-join
  *     (LSH band hash / simhash chunk), never an O(n²) cross join; the
  *     join ships only (block-key, doc-id) — signature/shingle payloads
  *     are re-joined AFTER candidate distinct-ing, so the wide shuffle
  *     carries ids, not arrays.
  *   - verification (true Jaccard / hamming) runs only on candidate
  *     pairs, i.e. cost scales with near-dup density, not corpus size.
  *
  * SimHash chunk blocking is *lossless* for `maxHamming < chunks`
  * (pigeonhole: ≤3 differing bits over 4 chunks leaves one chunk
  * identical) — the blocked plan returns exactly the pairwise result.
  * MinHash+LSH is probabilistic by construction; its oracle mirrors the
  * band logic, so tests pin the algorithm, not a lossy approximation.
  */
object Dedup {

  /** Mersenne prime 2^31-1: the modulus of the universal hash family
    * h_k(x) = (a_k * x + b_k) mod p used for the minhash permutations.
    * Everything stays < 2^62, safe under ANSI BIGINT in both engines.
    */
  val P: Long = 2147483647L

  /** Deterministic per-permutation multipliers/offsets (Knuth's
    * multiplicative constant) — must match the oracle SQL generator.
    */
  def hashA(k: Int): Long = ((k + 1L) * 2654435761L + 1L) % P
  def hashB(k: Int): Long = ((k + 1L) * 40503L) % P

  /** Distinct word 3-shingles; whole doc as one shingle when < 3 tokens
    * (keeps short docs dedupable instead of silently dropped).
    *
    * IMPORTANT lambda-capture rule: `toks` must be a materialized
    * attribute (a real column), not an expression — a non-attribute
    * subtree captured inside the `transform` lambda is RE-EVALUATED on
    * every element (the whole tokenization would run once per shingle;
    * measured ~10x the entire signature stage at sf0.1). Callers
    * project `TextFunctions.tokens(text)` into a column first;
    * CollapseProject keeps expensive producers out of multi-reference
    * consumers, so the two-step projection survives optimization.
    */
  def shinglesFromToks(toks: Column): Column =
    array_distinct(shinglesMultiFromToks(toks))

  /** Multiset variant (duplicates kept): min-hash signatures are
    * invariant under duplicates, so the signature path skips the
    * per-doc distinct (a boxed string hash-set). element_at avoids
    * slice()'s per-shingle array allocation.
    */
  def shinglesMultiFromToks(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Exact duplicate groups after token normalization: documents whose
    * sorted distinct token sets collide. Returns one row per group with
    * more than one member.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.contentFingerprint(col(textCol)).as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .filter(col("n_copies") > 1)

  /** Corpus-wide exact LINE dedup — the C4/RefinedWeb cleaning stage:
    * every distinct line survives only at its FIRST occurrence (the
    * (doc, line_no)-minimal one, within-doc repeats included); all
    * other occurrences are dropped and each document is reassembled
    * from its kept lines in original order. Returns one row per input
    * document: (idCol, n_lines, n_kept, text) — text is '' when every
    * line was claimed elsewhere.
    *
    * Scale shape: the first-occurrence winner per line is a
    * `groupBy(line).agg(min(struct(doc, line_no)))` — partially
    * aggregated map-side, so a hyper-common line (a boilerplate
    * footer repeated across half the corpus) collapses to one row per
    * map partition BEFORE the shuffle; no join ever fans out on the
    * line key (the kept occurrences ARE the aggregate's output, so
    * reassembly needs no explode-side rejoin). Reassembly is a second
    * hash aggregation on the doc key; per-doc line counts ride a
    * map-only `size(split(...))` so the final join's probe side
    * carries no extra shuffle stage beyond its own repartition. Three
    * exchanges total, none skew-prone.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    reassembleKeptLines(df, idCol, textCol, firstLineOccurrences(df, idCol, textCol))

  /** Incremental line dedup — the [[dedupIncrement]] discipline at
    * line granularity: dedup `batch` against an accumulated seen-line
    * state (one `line` column — [[lineState]] builds day zero) AND
    * against itself, keep-first within the batch. Returns the
    * reassembled batch rows; the caller advances state with
    * [[lineState]] over `state union kept` (O(delta): only the
    * batch's new winners append). The state join is a line-keyed
    * ANTI equi-join against the batch's already-aggregated winner set
    * (one row per distinct line, never the exploded occurrences), so
    * state size drives the join, not corpus size.
    */
  def lineDedupAgainst(
      batch: DataFrame, idCol: String, textCol: String, seenLines: DataFrame): DataFrame = {
    val fresh = firstLineOccurrences(batch, idCol, textCol)
      .join(seenLines.select(col("line")), Seq("line"), "left_anti")
    reassembleKeptLines(batch, idCol, textCol, fresh)
  }

  /** Distinct-line state table (`line`) for [[lineDedupAgainst]]. */
  def lineState(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\n")).as("line")).distinct()

  /** (doc, line_no, line) winner per distinct line — the
    * (doc, line_no)-minimal occurrence; map-side combined. */
  private def firstLineOccurrences(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"), posexplode(split(col(textCol), "\n")))
      .toDF("doc", "line_no", "line")
      .groupBy(col("line"))
      .agg(min(struct(col("doc"), col("line_no"))).as("k"))
      .select(col("k.doc").as("doc"), col("k.line_no").as("line_no"), col("line"))

  private def reassembleKeptLines(
      df: DataFrame, idCol: String, textCol: String, keepers: DataFrame): DataFrame = {
    val rebuilt = keepers
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line")),
          "\n").as("text"))
    df.select(col(idCol).as("doc"),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** doc -> distinct shingle set, SORTED ascending (tokens
    * materialized first — see shinglesFromToks). Sorted so the
    * pair-verify Jaccard runs as one SortedIntersectCount merge scan
    * (r21: array_intersect + array_union built two boxed hash sets
    * per PAIR; the sort is once per ROW). Every consumer reduces `sh`
    * to set sizes, so element order is output-invariant.
    */
  private def shingled(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    VectorExpressions.register(df.sparkSession) // sorted_intersect_count below
    df.select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc"), array_sort(shinglesFromToks(col("toks"))).as("sh"))
  }

  /** Exact shingle-set Jaccard |a∩b| / |a∪b| over SORTED DISTINCT
    * string arrays, as one merge scan: for sets,
    * |a∪b| = |a|+|b|−|a∩b|, and the counts are the same integers
    * array_intersect/array_union produce, so the cast-double ratio is
    * bit-identical to the composed form the oracles mirror.
    */
  private def sortedJaccard(a: Column, isect: Column, b: Column): Column =
    isect.cast("double") / (size(a) + size(b) - isect).cast("double")

  private def isectCount(a: Column, b: Column): Column =
    call_function(graft.functions.VectorExpressions.isectFnName, a, b)

  /** MinHash + banded LSH near-duplicate pairs.
    *
    * Signature: explode shingles, hash each once (Karp-Rabin
    * `poly_hash` — the base hash needs only DISTINCTNESS, because the
    * Carter-Wegman affine layer `(a_k h + b_k) mod P` below supplies
    * the pairwise-independent mixing minhash requires; md5 here was
    * pure constant cost, r12), derive `numHashes` universal-hash
    * values arithmetically, take grouped MINs (codegen'd, partially
    * aggregated map-side).
    * Bands of numHashes/bands rows hash to a band key; docs sharing a
    * band key become candidates; candidates are verified with true
    * Jaccard over the distinct shingle sets at `threshold`.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")

    // spread the hash-heavy explode across tasks even when the input is
    // a single small parquet split (see ngramJaccardPairs note)
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    val sigs = minhashSigs(df.repartition(fanout, col(idCol)), idCol, textCol, numHashes)
    val banded = minhashBands(sigs, numHashes, bands)
    val cand = minhashCandidates(banded)
    // verify against the full doc->shingle-set map in the SAME dag: a
    // semi-join prune here would execute the candidate pipeline twice
    // (once for the doc list, once for the result) — with tokens
    // materialized once, full-corpus shingling is the cheaper side
    val sh = shingled(df, idCol, textCol)
    cand
      .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      // threshold test on the EXACT IEEE ratio (correctly-rounded double
      // division is engine-portable), so an at-threshold pair survives
      // for ANY threshold value; the OUTPUT column is floor-truncated —
      // not rounded — because i/u is a small-integer ratio and
      // power-of-two unions land the double exactly on a .5 at the cut
      // digit, where Spark's and DuckDB's round() tie-break differently
      // (see q24 scaladoc). floor has no tie.
      .withColumn("isect", isectCount(col("sh_a"), col("sh_b")))
      .withColumn("jr", sortedJaccard(col("sh_a"), col("isect"), col("sh_b")))
      .filter(col("jr") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        (floor(col("jr") * lit(1e6)) / lit(1e6)).as("jaccard"))
  }

  /** Dedup-quality report — the q127 recall discipline applied to the
    * deduper itself: how much of the TRUE near-dup mass does a given
    * (numHashes, bands) LSH configuration surface, and how much verify
    * work does its candidate set waste? One row:
    * (n_true, n_cand, n_hit, recall_ppm, cand_precision_ppm) where
    * truth = ALL pairs with exact shingle-Jaccard ≥ threshold
    * (unblocked pairwise — ground truth has no shortcut), cand = the
    * LSH band-collision candidates, hit = cand ∩ truth (identical to
    * [[minhashLshPairs]]'s verified output — verify IS the exact
    * test, so pair precision is 1 by construction; what varies with
    * the banding is recall and candidate efficiency, exactly the two
    * numbers you tune bands/hashes against, Broder's S-curve).
    *
    * Scale contract: the truth side is deliberately O(n²) — run it on
    * a ≤10⁴-doc SAMPLE (deterministic hash-order sample upstream), the
    * standard way dedup configs are validated before a corpus run; the
    * candidate side is the production banded plan at any size.
    */
  def minhashLshEval(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingled(df, idCol, textCol).localCheckpoint(true)
    val truth = sh.select(col("doc").as("doc_a"), col("sh").as("sh_a"))
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")),
        col("doc_a") < col("doc_b"))
      .withColumn("isect", isectCount(col("sh_a"), col("sh_b")))
      .filter(sortedJaccard(col("sh_a"), col("isect"), col("sh_b")) >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    // sh's only consumer (truth) is eagerly materialized above, and sh
    // does NOT appear in the returned plan (truth's lineage is
    // truncated) — the caller's release() can't reach it, so release
    // here or its shingle blocks leak into the session (bench
    // storage_mb caught exactly this)
    graft.Checkpoints.release(sh)
    val cand = minhashCandidates(minhashBands(
      minhashSigs(df.repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions, col(idCol)),
        idCol, textCol, numHashes), numHashes, bands)).localCheckpoint(true)
    val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
    val counts = truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
    counts.select(col("n_true"), col("n_cand"), col("n_hit"),
      when(col("n_true") === 0, lit(1000000L))
        .otherwise(expr("(n_hit * 1000000) div n_true")).as("recall_ppm"),
      when(col("n_cand") === 0, lit(1000000L))
        .otherwise(expr("(n_hit * 1000000) div n_cand")).as("cand_precision_ppm"))
  }

  /** Sub-stage 1 of [[minhashLshPairs]]: (doc, sig_0..sig_{n-1}) minhash
    * signature table. Package-private so the stage-timing probe
    * (devtools/Q28Probe.scala) times the REAL stages instead of an
    * inline mirror that could drift.
    */
  private[graft] def minhashSigs(
      base: DataFrame, idCol: String, textCol: String, numHashes: Int): DataFrame = {
    VectorExpressions.register(base.sparkSession)
    // shingle stream via the native explode_ngrams Generator (r21):
    // explode(transform(...)) materialized the full shingle array per
    // doc under an interpreted higher-order lambda; the generator
    // streams grams with O(1) state. The < 3-token whole-doc fallback
    // rides the SAME generator as a (joined, NULL, NULL) 3-array —
    // concat_ws skips nulls, so its one gram is exactly the joined doc
    // (shinglesMultiFromToks semantics, incl. the 0-token "" shingle).
    val gramSrc = when(size(col("toks")) >= 3, col("toks"))
      .otherwise(array(concat_ws(" ", col("toks")),
        lit(null).cast("string"), lit(null).cast("string")))
    base
      .select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc"),
        call_function(VectorExpressions.ngramsFnName, gramSrc, lit(3)).as("x"))
      .withColumn("h", TextFunctions.polyHash(col("x")))
      .groupBy(col("doc"))
      .agg(min(pmod(col("h") * hashA(0) + hashB(0), lit(P))).as("sig_0"),
        (1 until numHashes).map(k =>
          min(pmod(col("h") * hashA(k) + hashB(k), lit(P))).as(s"sig_$k")): _*)
  }

  /** Sub-stage 2: band each signature into (doc, band, bh) keys. */
  private[graft] def minhashBands(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(col("doc"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*)).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc"), col("bk.band"), col("bk.bh"))
  }

  /** Sub-stage 3: slim candidate join — ids only, distinct (doc_a, doc_b)
    * pairs sharing a band key; shingle arrays re-attach in the verify.
    */
  private[graft] def minhashCandidates(banded: DataFrame): DataFrame =
    banded.select(col("band"), col("bh"), col("doc").as("doc_a"))
      .join(banded.select(col("band"), col("bh"), col("doc").as("doc_b")), Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

  /** The persistable LSH band index of a corpus: (doc, band, bh).
    * The incremental-dedup companion table — in production it is built
    * once, stored (partitioned by band), and APPENDED with each
    * accepted batch's bands, so deduping a daily drop never
    * re-signatures the corpus.
    */
  def minhashBandIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    minhashBands(
      minhashSigs(df.repartition(fanout, col(idCol)), idCol, textCol, numHashes),
      numHashes, bands)
  }

  // ------------------------------------------------------------------
  // Signature-scheme stamp for PERSISTED band indexes. The (doc, band,
  // bh) table records nothing about the hash pipeline that produced
  // it, yet a stored index only works if future batches are banded
  // with the IDENTICAL scheme: the r12 md5->poly_hash base-hash switch
  // would have made a pre-switch stored index and post-switch batch
  // bands share no band key — near-duplicates silently pass. The stamp
  // is a `_`-prefixed sidecar (parquet readers skip it, like _SUCCESS)
  // naming every ingredient; loaders fail loudly on mismatch.
  // ------------------------------------------------------------------

  /** Sidecar file name inside a persisted band-index dir. */
  val SchemeStampName = "_signature_scheme.json"

  /** Full identity of the banding signature scheme: shingling, base
    * gram hash, permutation family, band hash, and the (numHashes,
    * bands) shape. ANY change to these ingredients must change this
    * string — it is what protects stored indexes from silent drift.
    */
  def signatureScheme(numHashes: Int, bands: Int): String =
    s"minhash/v2 base=poly_hash affine=cw(P=$P) band=md5 " +
      s"shingle=token-3gram numHashes=$numHashes bands=$bands"

  /** Stamp a persisted band-index dir with its signature scheme
    * (idempotent overwrite — callers re-stamp on every append, which
    * also heals a stamp lost to partial copies). Delegates to
    * [[ArtifactStamp]] — the generic mechanism shared with other
    * persisted derived artifacts (DSIR models).
    */
  def writeSchemeStamp(
      dir: String, conf: org.apache.hadoop.conf.Configuration, scheme: String): Unit =
    ArtifactStamp.write(dir, conf, SchemeStampName, scheme)

  /** Fail loudly unless `dir`'s stamp matches `expected`. A stored
    * index with NO stamp also fails: an unstamped index predates the
    * stamp (or lost it) and its scheme is unknowable — merging batch
    * bands into it risks exactly the silent no-shared-band-key
    * failure the stamp exists to prevent. Stamp it explicitly with
    * [[writeSchemeStamp]] after verifying its provenance.
    */
  def requireSchemeStamp(
      dir: String, conf: org.apache.hadoop.conf.Configuration, expected: String): Unit =
    ArtifactStamp.require(dir, conf, SchemeStampName, expected, "band index",
      "merging them would compare incompatible band keys and silently pass near-duplicates")

  /** INCREMENTAL dedup — the production shape for a curation pipeline:
    * dedup an `incoming` batch against an existing corpus WITHOUT
    * re-processing the corpus. Returns the incoming rows that SURVIVE
    * (the appendable increment).
    *
    * Drop rule (pair-list greedy, deterministic): an incoming doc is
    * dropped iff it verifies at `threshold` Jaccard against ANY
    * existing doc, or against an incoming doc with a SMALLER id —
    * REGARDLESS of whether that smaller doc itself survives. In a
    * chain a-b-c (only adjacent pairs match, a existing, b and c
    * incoming) this drops BOTH b and c; a survivor-index streaming
    * dedup would keep chain-tail c, and batch jobs wanting
    * transitive-canonical clusters run [[connectedComponents]] +
    * [[removeDuplicates]] instead. The pair-list rule is what the
    * q95 oracle and the full-batch differential pin.
    *
    * Scale shape: only the BATCH is signatured (one pass over
    * incoming); candidates come from the batch's bands equi-joined to
    * the prebuilt `existingIndex` (ids only — the corpus never
    * shuffles, and with AQE the batch side broadcasts); only the
    * candidate EXISTING docs are re-shingled for verification
    * (left-semi prune on candidate ids) — so per-batch cost scales
    * with batch size + near-dup density, never corpus size.
    *
    * EAGER like [[connectedComponents]]: the batch's band table, the
    * corpus-candidate list, AND the final drop set are each read by
    * multiple downstream consumers (candE+candN; oldIds+verify;
    * survivors+indexDelta), so all three are checkpoint-materialized
    * once instead of re-executing the signature pipeline per consumer
    * (measured ~2x on the q95 workload; the un-checkpointed drop set
    * was the r9 q95/q101 bench inversion). Release contract: consume
    * the result, then [[graft.Checkpoints.release]] it.
    */
  def dedupIncrement(
      existingDocs: DataFrame,
      existingIndex: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val (bandsN, drops) = incrementCore(
      existingDocs, existingIndex, incoming, idCol, textCol, numHashes, bands, threshold)
    // the band table only matters to the WithIndex variant — its
    // blocks are fully consumed once `drops` is materialized
    graft.Checkpoints.release(bandsN)
    incoming.join(drops, Seq(idCol), "left_anti")
  }

  /** Survivors of one increment plus the band-index DELTA — the rows
    * to APPEND to the stored index so tomorrow's batch dedups against
    * today's accepted docs. The delta (not a unioned full index) is
    * the production write: the corpus index is already on disk, and
    * appending survivors' bands is the only new data. Consume both
    * frames, then [[graft.Checkpoints.release]] `indexDelta` — its
    * plan references every internal checkpoint (band table + drop
    * set); `survivors`' plan holds only the drop set.
    */
  final case class IncrementResult(survivors: DataFrame, indexDelta: DataFrame)

  /** Day-2 of the daily-drop loop: [[dedupIncrement]]'s drop rule,
    * PLUS the appendable band rows of the surviving batch docs (same
    * (doc, band, bh) shape as [[minhashBandIndex]]). Both returned
    * frames are cheap joins over the increment's internal checkpoints
    * (the batch band table and the drop set) — consume both, then
    * release via `indexDelta` (its plan spans every internal
    * checkpoint; releasing `survivors` alone leaves the band table's
    * blocks live). Folding
    * `index += indexDelta` across N arriving batches applies the
    * per-arrival rule to the whole ordered corpus: cross-batch
    * matches are against SURVIVORS only (dropped docs never enter the
    * index), within-batch matches follow the pair-list greedy rule —
    * DedupPropertySpec pins the N-batch fold against that reference
    * rule differentially, and the q101 oracle pins a two-batch fold
    * on the real testdata.
    */
  def dedupIncrementWithIndex(
      existingDocs: DataFrame,
      existingIndex: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): IncrementResult = {
    val (bandsN, drops) = incrementCore(
      existingDocs, existingIndex, incoming, idCol, textCol, numHashes, bands, threshold)
    IncrementResult(
      survivors = incoming.join(drops, Seq(idCol), "left_anti"),
      indexDelta = bandsN
        .join(drops.select(col(idCol).as("doc")), Seq("doc"), "left_anti")
        .select(col("doc"), col("band"), col("bh")))
  }

  /** Shared body of [[dedupIncrement]]/[[dedupIncrementWithIndex]]:
    * returns (checkpointed batch band table, dropped incoming ids).
    */
  private def incrementCore(
      existingDocs: DataFrame,
      existingIndex: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val bandsN = minhashBandIndex(incoming, idCol, textCol, numHashes, bands)
      .localCheckpoint(true)
    val candE = bandsN.select(col("band"), col("bh"), col("doc").as("new_doc"))
      .join(existingIndex.select(col("band"), col("bh"), col("doc").as("old_doc")),
        Seq("band", "bh"))
      .select(col("new_doc"), col("old_doc")).distinct()
      .localCheckpoint(true)
    val candN = bandsN.select(col("band"), col("bh"), col("doc").as("new_doc"))
      .join(bandsN.select(col("band"), col("bh"), col("doc").as("old_doc")),
        Seq("band", "bh"))
      .filter(col("old_doc") < col("new_doc"))
      .select(col("new_doc"), col("old_doc")).distinct()
    val shN = shingled(incoming, idCol, textCol)
    // re-shingle ONLY the existing docs that are candidates
    val oldIds = candE.select(col("old_doc").as(idCol)).distinct()
    val shE = shingled(
      existingDocs.join(oldIds, Seq(idCol), "left_semi"), idCol, textCol)
    // exact-ratio threshold test, same IEEE form as minhashLshPairs
    def dropsFrom(cand: DataFrame, shOld: DataFrame): DataFrame =
      cand.join(shN.select(col("doc").as("new_doc"), col("sh").as("sh_n")), Seq("new_doc"))
        .join(shOld.select(col("doc").as("old_doc"), col("sh").as("sh_o")), Seq("old_doc"))
        .withColumn("isect", isectCount(col("sh_n"), col("sh_o")))
        .filter(sortedJaccard(col("sh_n"), col("isect"), col("sh_o")) >= threshold)
        .select(col("new_doc"))
    // drops has TWO consumers in the WithIndex variant (survivors
    // left-anti + indexDelta left-anti) — materialize once or the
    // whole candidate+verify pipeline re-executes per consumer
    // (the r9 bench read q95/q101 2.3-2.5x SLOWER at sf0.01 than
    // sf0.1 from exactly this re-execution)
    val drops = dropsFrom(candE, shE).union(dropsFrom(candN, shN))
      .distinct().withColumnRenamed("new_doc", idCol)
      .localCheckpoint(true)
    // candE's blocks are only reachable through drops' (now
    // truncated) lineage — release here or they leak
    graft.Checkpoints.release(candE)
    (bandsN, drops)
  }

  /** 60-bit SimHash per document via explode + 60 codegen'd vote sums
    * (bit j set when the ±1 votes of token-hash bit j sum positive).
    * Returns (doc, simhash).
    */
  def simhashByDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tk"))
      .withColumn("h", TextFunctions.hash60(col("tk")))
    val votes = base.groupBy(col("doc"))
      .agg(sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("v_0"),
        (1 until 60).map(j =>
          sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v_$j")): _*)
    votes.select(col("doc"),
      (0 until 60).map(j => when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** Single-row-convenience form (tests / per-row use); the operator
    * path goes through simhashByDoc.
    */
  def simhash60(textCol: String): Column = expr(
    s"""cast(aggregate(sequence(0, 59), 0L, (acc, j) -> acc + if(
       |  aggregate(transform(filter(split(lower($textCol), '[^a-z0-9]+'), tk -> tk != ''),
       |            tk3 -> cast(conv(substring(md5(tk3), 1, 15), 16, 10) as bigint)),
       |            0, (a, h2) -> a + if((shiftright(h2, j) & 1) = 1, 1, -1)) > 0,
       |  shiftleft(1L, j), 0L)) as bigint)""".stripMargin)

  /** SimHash near-dup pairs at hamming distance <= maxHamming, blocked
    * on `chunks` equal bit-slices. Lossless iff maxHamming < chunks.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunks: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < chunks, "chunk blocking only lossless for maxHamming < chunks")
    val bitsPerChunk = 60 / chunks
    val mask = (1L << bitsPerChunk) - 1
    val withSim = simhashByDoc(df, idCol, textCol)
    val chunked = withSim.select(col("doc"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPerChunk).bitwiseAND(lit(mask)).as("cv"))
      }: _*)).as("ck"))
      .select(col("doc"), col("simhash"), col("ck.chunk"), col("ck.cv"))
    val left = chunked.select(col("chunk"), col("cv"), col("doc").as("doc_a"), col("simhash").as("sim_a"))
    val right = chunked.select(col("chunk"), col("cv"), col("doc").as("doc_b"), col("simhash").as("sim_b"))
    left.join(right, Seq("chunk", "cv"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components over near-dup pairs: iterative min-label
    * propagation (each node adopts the smallest label among itself and
    * its neighbors until fixpoint) — the step that turns pairwise
    * near-dup DETECTION into dedup GROUPS. Returns (doc, cluster) where
    * cluster is the component's minimum doc id.
    *
    * Scale: each iteration is one join + one aggregate keyed on the
    * node id; iterations needed = component diameter (near-dup
    * clusters are shallow — single digits). Lineage is truncated per
    * iteration with an eager localCheckpoint, the local[*] stand-in
    * for checkpointing to reliable storage on a cluster.
    *
    * CONTRACT — eager at call time: although a DataFrame is returned,
    * calling this method runs Spark jobs immediately (the pair input
    * is checkpoint-materialized once, then the fixpoint loop runs to
    * convergence). This is deliberate: an iterative algorithm left
    * lazy would re-execute the typically-expensive pair lineage
    * (LSH + verify) on every downstream action AND once per loop
    * iteration. Callers composing large plans should invoke it once
    * and reuse the (cheap, checkpoint-backed) result.
    *
    * RELEASE contract: every internal checkpoint (the pair input, each
    * superseded label iteration) is unpersisted before return; only
    * the blocks backing the RESULT remain. When the result has been
    * consumed, call [[graft.Checkpoints.release]] on it — in a
    * long-lived session un-released checkpoints accumulate in the
    * block manager until memory pressure throttles every later job.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20,
      driverEdgeThreshold: Long = 1L << 20): DataFrame = {
    // materialize the pair list ONCE: the input is typically an
    // expensive similarity pipeline (LSH + verify), and every loop
    // iteration below re-executes the edge lineage otherwise (the
    // union alone would already evaluate it twice per job)
    val basePairs = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint(true)

    // hybrid fast path: near-dup graphs are a tiny fraction of the
    // corpus — when the edge list fits a driver bound, a union-find
    // beats ~5 scheduled jobs PER min-label iteration. Same result
    // (component minimum as label), deterministic regardless of union
    // order; the distributed loop below remains the unbounded path.
    val nEdges = basePairs.count() // checkpointed: a metadata count
    if (nEdges <= driverEdgeThreshold) {
      val out = driverComponents(basePairs) // collects eagerly
      graft.Checkpoints.release(basePairs)
      return out
    }

    val edges = basePairs
      .union(basePairs.select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("dst"), "left_outer")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") < col("old")).count()
      // `next` is checkpoint-materialized and `changed` consumed the
      // old labels — release the superseded iteration's blocks NOW
      // (leaving them leaks one labels table per iteration)
      graft.Checkpoints.release(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    graft.Checkpoints.release(basePairs) // edges no longer re-read
    labels.select(col("node").as("doc"), col("label").as("cluster"))
  }

  /** Apply a dedup decision: drop every non-canonical cluster member
    * (doc != cluster label), keeping canonicals and all untouched
    * documents. left_anti on the (small) drop list — the corpus never
    * shuffles on anything but the id equi-key, and with AQE the drop
    * side broadcasts.
    */
  def removeDuplicates(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    df.join(
      clusters.filter(col("doc") =!= col("cluster")).select(col("doc").as(idCol)),
      Seq(idCol), "left_anti")

  /** Content-defined chunking — boundaries decided by the CONTENT,
    * not by offsets (the FastCDC/LBFS rule, token-level): a chunk
    * ends after any token whose seeded hash ≡ 0 (mod avgSize), so an
    * insertion early in a document shifts only the chunk it lands in
    * — every later chunk re-aligns and deduplicates against the
    * previous version. The substrate of storage-level dedup and of
    * edit-robust RAG chunking (fixed-width chunks shift EVERY
    * boundary after an edit; CDC chunks don't). Expected chunk length
    * = avgSize tokens (geometric); no max-size clamp — a pathological
    * never-boundary stream is one chunk, which the q79 substring
    * machinery handles better anyway (documented trade).
    *
    * Returns one row per chunk: (doc, chunk, n_tokens, chunk_md5) —
    * chunk ids are 0-based in document order, chunk_md5 hashes the
    * space-joined tokens (the dedup key: equal chunks hash equal
    * across documents and corpus versions).
    *
    * Plan shape: one explode, a map-only boundary flag (seeded md5 —
    * engine-portable, the q98/q132 hash family), ONE doc-keyed
    * running-sum window (frames bounded by document length — the
    * q192 window class, never corpus-wide), and a grouped rebuild.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      avgSize: Int = 16): DataFrame = {
    require(avgSize >= 2, s"avgSize must be >= 2: $avgSize")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .withColumn("b", when(pmod(TextFunctions.hash60(
        concat(lit("cdc|"), col("term"))), lit(avgSize.toLong)) === 0, 1L)
        .otherwise(0L))
      // the boundary closes the chunk AFTER its token: a token's chunk
      // counts only boundaries strictly before it
      .withColumn("chunk", sum(col("b")).over(w) - col("b"))
      .groupBy(col("doc"), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")), " ")).as("chunk_md5"))
  }

  /** Apply a dedup decision keeping the BEST cluster member instead
    * of the arbitrary min-id canonical — the selection rule curation
    * pipelines actually ship (RefinedWeb/FineWeb keep the
    * highest-quality or longest member; min-id keeps whichever
    * happened to enumerate first, which on a crawl means "whichever
    * mirror was fetched first", often the worst copy). Per cluster
    * the survivor maximizes `scoreCol` with ties to the SMALLEST id —
    * deterministic, and with score ≡ constant it degenerates to
    * [[removeDuplicates]]' min-id rule exactly. The score compares on
    * its NATIVE numeric type (a fractional 0-1 quality score elects
    * the true max; no silent integer truncation) — callers pass any
    * numeric column; non-numeric scores fail loudly up front.
    *
    * Plan shape: the corpus joins the (small — only clustered docs)
    * cluster frame once on the id equi-key to attach labels and
    * scores, one degree-bounded argmax groupBy over CLUSTERS (not the
    * corpus) elects survivors via min(struct(-score, id)) — no window
    * — and one left_anti drops the losers. The corpus never shuffles
    * on anything but its id; with AQE both the cluster frame and the
    * drop list broadcast.
    */
  def removeDuplicatesKeepBest(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      scoreCol: String): DataFrame = {
    val sc = df.schema(scoreCol).dataType
    require(sc.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"scoreCol must be numeric, got $scoreCol: ${sc.simpleString}")
    val members = df.select(col(idCol).as("__kb_id"),
        col(scoreCol).as("__kb_s"))
      .join(clusters.select(col("doc").as("__kb_id"),
        col("cluster").as("__kb_c")), Seq("__kb_id"))
    val keep = members.groupBy(col("__kb_c"))
      .agg(min(struct((-col("__kb_s")).as("ns"),
        col("__kb_id").as("i"))).as("__kb_b"))
      .select(col("__kb_b.i").as("__kb_keep"))
    val drops = members.join(keep,
        members("__kb_id") === keep("__kb_keep"), "left_anti")
      .select(col("__kb_id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/holdout split — the eval-hygiene rule a
    * per-document split silently breaks: when two NEAR-DUPLICATES
    * straddle the boundary, the model "generalizes" to a paraphrase
    * of its own training data and the eval number inflates (the
    * contamination literature's within-corpus case — Lee et al. 2022
    * measure exactly this). The fix is assignment at CLUSTER
    * granularity: every member of a near-dup component inherits its
    * canonical representative's coin flip, so a cluster lands whole
    * on one side, always.
    *
    * `clusters` is [[connectedComponents]]' (doc, cluster) frame;
    * docs outside any component are their own singleton cluster. The
    * flip is the replayable seeded-md5 rule (the q98/q132 family):
    * holdout ⇔ hash60("clsplit|seed|" ⊕ rep) % 10⁶ < holdoutPpm —
    * deterministic, engine-portable, and a pure function of the
    * representative, which IS the leakage invariant (q181's oracle
    * re-derives it per doc and would catch any member diverging).
    *
    * Plan shape: one left join of the id list onto the (tiny relative
    * to corpus) cluster frame, then a map-only hash — no window, no
    * extra shuffle beyond the components build itself.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      clusters: DataFrame,
      seed: Long,
      holdoutPpm: Long): DataFrame = {
    require(holdoutPpm >= 0 && holdoutPpm <= 1000000L,
      s"holdoutPpm must be a ppm fraction, got $holdoutPpm")
    docs.select(col(idCol))
      .join(clusters.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .withColumn("rep", coalesce(col("cluster"), col(idCol)))
      .withColumn("holdout",
        graft.functions.TextFunctions.hash60(
          concat(lit(s"clsplit|$seed|"), col("rep"))) % 1000000L < holdoutPpm)
      .select(col(idCol), col("rep"), col("holdout"))
  }

  /** Dedup audit report — the cluster-size distribution a curation run
    * prints next to its removal counts (how much duplication, in what
    * shape: a few giant mirror clusters and a long pair tail read very
    * differently from uniform triples, and drive opposite threshold
    * decisions). One row per cluster size: how many clusters, how many
    * docs they cover; size 1 = corpus documents in NO near-dup pair
    * (clusters from [[connectedComponents]] only ever contain paired
    * docs, so singletons are the complement count — corpus total minus
    * clustered total, two scalar aggregates, no extra corpus join).
    *
    * Scale: sizes is one groupBy on the (tiny) cluster table; the
    * histogram a second groupBy on sizes; the corpus contributes one
    * count. Returns (n_members, n_clusters, n_docs) sorted ascending.
    */
  def dedupAudit(corpus: DataFrame, idCol: String, clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    val multi = sizes.groupBy(col("n_members"))
      .agg(count(lit(1)).as("n_clusters"))
    val singles = corpus.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(clusters.agg(count(lit(1)).as("m"))))
      .select(lit(1L).as("n_members"), (col("n") - col("m")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
    multi.unionByName(singles)
      .withColumn("n_docs", col("n_members") * col("n_clusters"))
  }

  /** Driver-side union-find over a collected (bounded) edge list.
    * Roots are always the component MINIMUM (union attaches the larger
    * root under the smaller), so labels match the distributed
    * min-label fixpoint exactly and do not depend on edge order.
    *
    * "Minimum" must mean the SAME thing on both paths: the distributed
    * loop's `min(label)` orders by Spark's ordering for the key type
    * (binary UTF-8 for strings), which differs from Java's UTF-16
    * `String.compareTo` for supplementary-plane code points. The
    * union-find therefore runs over the CATALYST representation of the
    * keys with Spark's own interpreted ordering — labels cannot depend
    * on which side of `driverEdgeThreshold` the edge count lands, and
    * key types with no `Comparable` (arrays, structs) order correctly
    * instead of throwing.
    */
  private def driverComponents(basePairs: DataFrame): DataFrame = {
    val spark = basePairs.sparkSession
    val keyType = basePairs.schema.head.dataType
    val toCatalyst =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(keyType)
    val toScala =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter(keyType)
    val ord =
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(keyType)
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    basePairs.collect().foreach { row =>
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val a = toCatalyst(row.get(0))
        val b = toCatalyst(row.get(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ord.compare(ra, rb) < 0) parent(rb) = ra else parent(ra) = rb
        }
      }
    }
    val rows = parent.keys.toSeq
      .map(n => org.apache.spark.sql.Row(toScala(n), toScala(find(n))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc", keyType),
      org.apache.spark.sql.types.StructField("cluster", keyType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Substring-level exact dedup, part 1 — repeated-span DETECTION
    * (the suffix-array dedup family of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL'22): find every
    * maximal token span covered by k-token windows that occur more
    * than once ANYWHERE in the corpus (across documents or repeated
    * inside one). Returns (doc_id, span_start, span_end, n_tokens),
    * token positions 1-based inclusive.
    *
    * Plan (all stages linear in total token count — the 100 TB shape
    * of the suffix-array algorithm, which needs a global sort the
    * cluster would pay for in one shuffle anyway):
    *   1. explode one row per window START (not per window CONTENT —
    *      each row carries a fixed-width md5 of the k tokens, so the
    *      shuffle width is independent of k);
    *   2. groupBy window-hash count — map-side partial aggregation
    *      collapses each document's repeats before the shuffle;
    *   3. semi-join window starts against the duplicated-hash set
    *      (dup density is corpus-dependent but the set only carries
    *      hashes; with AQE it broadcasts when small);
    *   4. per-document interval merge of overlapping/adjacent windows
    *      via the gaps-and-islands pattern — two window functions over
    *      ONE shuffle on doc_id (Catalyst reuses the sort).
    * No pairwise join ever forms: duplication is detected on the
    * window-hash group, so cost scales with corpus size, not dup²
    * (contrast minhashLshPairs, which must materialize candidate
    * PAIRS — span dedup only needs the per-doc flag set).
    *
    * Windows are hashed (md5 of the space-joined k tokens), not
    * compared literally: a collision would flag a false span in BOTH
    * engines identically (the DuckDB oracle shares the hash), and at
    * 128 bits the corpus-level collision odds are negligible.
    */
  def repeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, "window length k must be >= 2")
    val w = windowHashes(df, idCol, textCol, k)
    val dup = w.groupBy(col("wh")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("wh"))
    val flagged = w.join(dup, Seq("wh"), "left_semi")
      .select(col("doc"), col("pos").as("s"), (col("pos") + lit(k - 1L)).as("e"))
    mergeSpans(flagged)
      .select(col("doc").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1L)).as("n_tokens"))
  }

  /** Keep-one-canonical-copy variant of repeated-span detection: for
    * each duplicated k-token window, the occurrence at the MINIMUM
    * (doc, pos) — lexicographic, deterministic — is canonical and
    * kept; every OTHER occurrence is flagged. This is the form a
    * training-data dedup actually ships (Lee et al. keep one copy of
    * each duplicated substring; remove-all is the decontamination
    * form [[repeatedSpans]] pins).
    *
    * Same linear plan as repeatedSpans with the dup-detection
    * groupBy extended to also carry the min-(doc,pos) struct — still
    * one window-hash shuffle, still no pairwise join; the canonical
    * set re-attaches by the same hash equi-join as the dup flag.
    * A canonical occurrence survives unless covered by some OTHER
    * flagged window (overlap semantics fall out of the span merge).
    */
  def repeatedSpansKeepFirst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, "window length k must be >= 2")
    val w = windowHashes(df, idCol, textCol, k)
    val canon = w.groupBy(col("wh"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc"), col("pos"))).as("c"))
      .filter(col("cnt") >= 2)
      .select(col("wh"), col("c.doc").as("cdoc"), col("c.pos").as("cpos"))
    val flagged = w.join(canon, Seq("wh"))
      .filter(!(col("doc") === col("cdoc") && col("pos") === col("cpos")))
      .select(col("doc"), col("pos").as("s"), (col("pos") + lit(k - 1L)).as("e"))
    mergeSpans(flagged)
      .select(col("doc").as("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1L)).as("n_tokens"))
  }

  /** Substring-level exact dedup, part 2 — repeated-span REMOVAL:
    * drop every token covered by a repeated >=k-token window and
    * report, per affected document, the before/removed token counts
    * and an md5 fingerprint of the surviving text (tokens re-joined
    * in original order). Documents made empty (exact full-doc dups)
    * surface with n_tokens_removed == n_tokens_before and the
    * fingerprint of the empty string.
    *
    * Semantics: ALL occurrences of a repeated span are removed (the
    * conservative decontamination form). The keep-one-canonical-copy
    * variant is a post-filter on the window-hash group (keep the
    * occurrence at min (doc_id, pos)) — same plan shape, omitted here
    * because remove-all is what the oracle pins.
    *
    * Scale: adds to repeatedSpans one explode of covered positions
    * (bounded by total token count) and one anti-join on
    * (doc, position) — both linear; the final per-doc rebuild
    * aggregates on the same doc_id partitioning.
    */
  def removeRepeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame =
    removeSpansSummary(df, idCol, textCol, repeatedSpans(df, idCol, textCol, k))

  /** Keep-one-canonical-copy removal: [[repeatedSpansKeepFirst]]'s
    * flagged spans through the same token-level edit — the canonical
    * occurrence of every duplicated window survives, every other copy
    * is dropped. Same output shape as [[removeRepeatedSpans]].
    */
  def removeRepeatedSpansKeepFirst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): DataFrame =
    removeSpansSummary(df, idCol, textCol, repeatedSpansKeepFirst(df, idCol, textCol, k))

  /** Suffix-array–range maximal repeated spans — the EXACT form of
    * substring dedup (Lee et al. ACL'22 §4 "ExactSubstr", whose
    * single-node implementation is a suffix array; [[repeatedSpans]]
    * is the fixed-k window APPROXIMATION of the same paper's removal
    * rule). For every corpus position this computes the length of the
    * LONGEST token substring starting there that occurs at another
    * (doc, pos), and reports the left-maximal such spans with their
    * exact occurrence counts:
    * (doc_id, span_start, span_end, n_tokens, n_occurrences).
    *
    * What the window approximation gets wrong and this fixes
    * (SubstringDedupSpec pins both differentials):
    *   - EXTENT: repeatedSpans MERGES overlapping/adjacent duplicated
    *     k-windows, so two unrelated 8-token repeats sitting side by
    *     side in one doc (each matching a DIFFERENT other doc) merge
    *     into one 16-token "span" that occurs nowhere else as a whole.
    *     Here a span's full content is pinned by one key, so the two
    *     repeats surface separately with their true lengths.
    *   - MULTIPLICITY: the merge also discards how often each span
    *     repeats; `n_occurrences` is the exact corpus-wide occurrence
    *     count of the maximal span.
    *
    * Construction — prefix doubling (Manber–Myers; the distributed
    * formulation is Flick & Aluru SC'15), with md5-composed rank
    * IDENTITIES instead of dense integer ranks: rank_1 = md5(token),
    * rank_2h(p) = md5(rank_h(p) || rank_h(p+h)). Equal windows ⇔ equal
    * identity (up to md5 collision — the same negligible-and-shared-
    * with-the-oracle caveat as [[repeatedSpans]]'s window hashes);
    * identities need only EQUALITY, so the global dense_rank sort of
    * the classical algorithm — a non-scalable single-partition window
    * in Spark — is never needed. A length-l window's identity is the
    * standard sparse-table overlap pair (rank_h(p), rank_h(p+l-h)) for
    * h = 2^⌊lg l⌋: the two overlapping h-windows determine the l-window
    * exactly.
    *
    * Plan shape (the 100 TB story): one doc-keyed shuffle feeds ALL
    * O(log maxLen) rank-doubling window passes plus the per-l shift
    * leads (same window spec — one Exchange, one Sort, chained Window
    * operators); then one (l, key) hash aggregate for occurrence
    * counts, one equi-join back, one per-position max aggregate, and a
    * final doc-keyed running-max window for left-maximality. Never a
    * pairwise join; the only super-linear factor is the bounded
    * (maxLen - minLen + 1)× key expansion. Spans longer than `maxLen`
    * are reported as runs of maxLen-length spans (the cap is the price
    * of a bounded level stack; raise maxLen to measure longer
    * repeats).
    */
  def saMaximalRepeats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8,
      maxLen: Int = 32): DataFrame = {
    // rank rows feed the keys explode AND the three per-h dup-rank
    // aggregates below — materialize once (released before return;
    // the returned frame is checkpoint-backed, release contract),
    // projected to ONLY the sparse-table levels later stages read
    // (the sub-h levels exist solely to build the h levels; dropping
    // them shrinks the materialized table ~2x)
    val keep = Seq(col("doc"), col("pos")) ++
      saHLevels(minLen, maxLen).map(h => col(s"r_$h"))
    val cur = saRankRows(df, idCol, textCol, maxLen)
      .select(keep: _*).localCheckpoint(true)
    val keys = saKeysFromRanks(cur, minLen, maxLen)
    // candidate-position prefilter (lossless, the prefix argument): an
    // l-window duplicated anywhere has its h(l)-prefix duplicated too
    // (the prefix occurs wherever the window does), so keys whose ka
    // rank is NOT an h-level duplicate can never survive the occ >= 2
    // filter — drop them BEFORE the (l, ka, kb) exchange. Dup
    // positions are sparse in a real corpus, so this turns the
    // (maxLen-minLen+1)x key expansion from a shuffled 25x into a
    // map-side filter: the per-h dup-rank tables are aggregate outputs
    // whose runtime size AQE sees, and broadcast when small (the
    // common case); a dup-heavy corpus degrades to a shuffle join —
    // never to wrong counts, since surviving keys' occ aggregate is
    // exact over the kept rows (every position of a duplicated
    // l-window is kept, by the same prefix argument).
    val dupH = saHLevels(minLen, maxLen).map { h =>
      cur.filter(col(s"r_$h").isNotNull)
        .groupBy(col(s"r_$h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .select(lit(h).as("h"), col(s"r_$h").as("ka"))
    }.reduce(_ unionByName _)
    val cand = keys.join(dupH, Seq("h", "ka"))
    val dup = cand.groupBy(col("l"), col("ka"), col("kb"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
    // per position: the longest duplicated window and ITS exact count
    val result = saLeftMaximalSpans(cand.join(dup, Seq("l", "ka", "kb")))
      .withColumnRenamed("n_match_occurrences", "n_occurrences")
      .localCheckpoint(true)
    graft.Checkpoints.release(cur)
    result
  }

  /** Cross-corpus EXACT contamination spans — [[saMaximalRepeats]]'s
    * machinery pointed at a benchmark: for every corpus position, the
    * longest token substring ALSO occurring anywhere in `bench`,
    * reported as left-maximal spans with the exact benchmark
    * occurrence count:
    * (doc_id, span_start, span_end, n_tokens, n_bench_occurrences).
    *
    * The exact complement of [[graft.operators.Quality]].decontaminate
    * (q67): that flags docs sharing SOME fixed-n gram with the
    * benchmark; this reports the true maximal shared EXTENT (the
    * GPT-3/Lee-et-al. contamination measure is "shares a substring of
    * >= L tokens" — extent is the decision variable) and how often the
    * benchmark contains it. Plan shape identical to saMaximalRepeats
    * except the duplicate-count aggregate runs on the BENCH side only
    * (typically small -> its (l, key) table broadcasts) and the corpus
    * side never self-joins.
    */
  def saSharedSpans(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 8,
      maxLen: Int = 32): DataFrame = {
    val keep = (cur: DataFrame) => cur.select(
      (Seq(col("doc"), col("pos")) ++
        saHLevels(minLen, maxLen).map(h => col(s"r_$h"))): _*)
    val ccur = keep(saRankRows(corpus, idCol, textCol, maxLen))
    // bench ranks feed the three allowed-rank projections AND the key
    // aggregate — materialize once (released before return)
    val bcur = keep(saRankRows(bench, idCol, textCol, maxLen)).localCheckpoint(true)
    // cross-corpus prefilter, same prefix argument as saMaximalRepeats
    // but against the BENCHMARK's h-rank sets: a corpus l-window
    // occurring in bench has its h(l)-prefix in bench too. Benchmark
    // sides are small by construction, so both the allowed-rank tables
    // and the bench key aggregate broadcast — the corpus pays one
    // map-side-filtered aggregate and no self-join.
    val allowedH = saHLevels(minLen, maxLen).map { h =>
      bcur.filter(col(s"r_$h").isNotNull)
        .select(lit(h).as("h"), col(s"r_$h").as("ka")).distinct()
    }.reduce(_ unionByName _)
    val ck = saKeysFromRanks(ccur, minLen, maxLen).join(allowedH, Seq("h", "ka"))
    val bk = saKeysFromRanks(bcur, minLen, maxLen)
      .groupBy(col("l"), col("ka"), col("kb"))
      .agg(count(lit(1)).as("occ"))
    val result = saLeftMaximalSpans(ck.join(bk, Seq("l", "ka", "kb")))
      .withColumnRenamed("n_match_occurrences", "n_bench_occurrences")
      .localCheckpoint(true)
    graft.Checkpoints.release(bcur)
    result
  }

  /** The power-of-two sparse-table levels h(l) actually used by
    * lengths in [minLen, maxLen].
    */
  private def saHLevels(minLen: Int, maxLen: Int): Seq[Int] =
    (minLen to maxLen).map(Integer.highestOneBit).distinct

  /** Prefix-doubling rank rows: (doc, pos, r_1, r_2, ..., r_maxLevel)
    * with r_h the md5-composed identity of the h-token window at pos
    * (null iff it does not fit the doc). One doc-keyed exchange feeds
    * every doubling pass (same window spec).
    *
    * Identities are 16-byte BINARY md5 digests, not 32-char hex:
    * identity columns only need within-engine EQUALITY (the oracle
    * derives its own spans independently — final outputs are what the
    * gate compares), and the rank table is materialized + shuffled
    * through every later stage, so halving its width halves the
    * operator's dominant memory/IO term. Composition needs no
    * delimiter: both inputs are fixed 16-byte digests, so the
    * concatenation is injective by construction.
    */
  private def saRankRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxLen: Int): DataFrame = {
    require(maxLen >= 2, "maxLen must be >= 2")
    VectorExpressions.register(df.sparkSession) // md5_bin below
    // md5_bin(x) ≡ unhex(md5(x)) (r21): the identity digests are the
    // operator's dominant per-position cost (one per position per
    // doubling level); the native form skips the per-row 32-char hex
    // render + unhex re-parse and the per-row MessageDigest lookup.
    def md5bin(c: Column): Column =
      call_function(graft.functions.Md5Bin.fnName, c)
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
    // one token row per position, pre-partitioned by doc so every
    // window pass below reuses the same exchange
    var cur = df.repartition(fanout, col(idCol))
      .select(col(idCol).as("doc"), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("p0", "tok")))
      .select(col("doc"), (col("p0") + 1L).as("pos"), md5bin(col("tok")).as("r_1"))
      .drop("tok")
    // doubling levels: r_h defined iff the h-window at pos fits the doc
    val levels = Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxLen).toSeq
    levels.tail.foreach { h =>
      val half = h / 2
      cur = cur
        .withColumn("sh", lead(col(s"r_$half"), half).over(byDoc))
        .withColumn(s"r_$h",
          when(col(s"r_$half").isNotNull && col("sh").isNotNull,
            md5bin(concat(col(s"r_$half"), col("sh")))))
        .drop("sh")
    }
    cur
  }

  /** Per-position (l, h, ka, kb) window identities for every length in
    * [minLen, maxLen], from [[saRankRows]] output: the length-l window
    * at pos is identified by the overlap pair (r_h(pos),
    * r_h(pos+l-h)), h = 2^floor(lg l). Output: (doc, pos, l, h, ka, kb).
    */
  private def saKeysFromRanks(
      cur: DataFrame,
      minLen: Int,
      maxLen: Int): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(maxLen >= minLen, "maxLen must be >= minLen")
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
    // per-l second key component: the (l-h)-shifted h-rank. Window
    // leads must sit in a projection, not under the generator below.
    val withKb = (minLen to maxLen).foldLeft(cur) { (d, l) =>
      val h = Integer.highestOneBit(l)
      if (l == h) d
      else d.withColumn(s"kb_$l", lead(col(s"r_$h"), l - h).over(byDoc))
    }
    val keyStructs = (minLen to maxLen).map { l =>
      val h = Integer.highestOneBit(l)
      val kb = if (l == h) col(s"r_$h") else col(s"kb_$l")
      struct(lit(l.toLong).as("l"), lit(h).as("h"), col(s"r_$h").as("ka"), kb.as("kb"))
    }
    withKb
      .select(col("doc"), col("pos"), explode(array(keyStructs: _*)).as("k"))
      .select(col("doc"), col("pos"), col("k.l").as("l"), col("k.h").as("h"),
        col("k.ka").as("ka"), col("k.kb").as("kb"))
      .filter(col("ka").isNotNull && col("kb").isNotNull)
  }

  /** Shared back half: from matched key rows (doc, pos, l, ..., occ),
    * the per-position longest match with its count, then the running-
    * max left-maximality filter. Output: (doc_id, span_start,
    * span_end, n_tokens, n_match_occurrences).
    */
  private def saLeftMaximalSpans(matched: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val best = matched
      .groupBy(col("doc"), col("pos"))
      .agg(max(struct(col("l"), col("occ"))).as("b"))
      .select(col("doc"), col("pos"), col("b.l").as("len"), col("b.occ").as("occ"))
    // left-maximality: a span is contained in an earlier one iff some
    // earlier position reaches at least as far right
    best
      .withColumn("maxe", max(col("pos") + col("len")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("maxe").isNull || col("maxe") < col("pos") + col("len"))
      .select(col("doc").as("doc_id"), col("pos").as("span_start"),
        (col("pos") + col("len") - 1L).as("span_end"),
        col("len").as("n_tokens"), col("occ").as("n_match_occurrences"))
  }

  /** Shared removal tail: drop tokens covered by `spans`, report
    * per affected doc (n_tokens_before, n_tokens_removed, cleaned_fp).
    */
  private def removeSpansSummary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spans: DataFrame): DataFrame = {
    val removedPerDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("n_tokens_removed"))
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val tokPos = df
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens_before"),
        posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), col("n_tokens_before"),
        (col("pos0") + 1L).as("pos"), col("tok"))
    // survivors rebuilt in original token order: sort_array on
    // (pos, tok) structs makes the fold shuffle-order-independent
    val surviving = tokPos
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
          p => p.getField("tok")))).as("fp"))
    removedPerDoc
      .join(tokPos.select(col("doc_id"), col("n_tokens_before")).distinct(), Seq("doc_id"))
      .join(surviving, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens_before"), col("n_tokens_removed"),
        coalesce(col("fp"), md5(lit(""))).as("cleaned_fp"))
  }

  /** One row per k-token window start: (doc, pos, wh) with pos
    * 1-based and wh the md5 of the space-joined window. Window CONTENT
    * never leaves the projection — only the fixed-width hash is
    * exploded, so row width is independent of k.
    */
  private def windowHashes(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    VectorExpressions.register(df.sparkSession) // md5_bin below
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    // toks materialized as an attribute first — the lambda-capture rule
    // (see shinglesFromToks): a captured non-attribute subtree would
    // re-tokenize the document once per window
    val toks = df.repartition(fanout, col(idCol))
      .select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
    // wh is an internal equality key only (never output): md5_bin
    // (r21) keeps the exact md5 identity semantics — same collisions,
    // shared with the oracle — at half the shuffle width and none of
    // the per-window hex-render cost
    toks.select(col("doc"),
        explode(transform(sequence(lit(1L), size(col("toks")).cast("long") - lit(k - 1L)),
          i => struct(i.as("pos"),
            call_function(graft.functions.Md5Bin.fnName, concat_ws(" ",
              (0 until k).map(j => element_at(col("toks"), (i + lit(j.toLong)).cast("int"))): _*))
              .as("wh")))).as("w"))
      .select(col("doc"), col("w.pos").as("pos"), col("w.wh").as("wh"))
  }

  /** Gaps-and-islands interval union: merge overlapping or adjacent
    * [s, e] token intervals per doc into maximal spans. Two window
    * passes over one doc-keyed sort (Catalyst reuses the exchange+sort
    * between them).
    */
  private def mergeSpans(intervals: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("s"))
    intervals
      .withColumn("newIsland",
        when(col("s") > coalesce(
          max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1L)) + 1L, 1L).otherwise(0L))
      .withColumn("grp", sum(col("newIsland")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc"), col("grp"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
  }

  /** Character n-gram Jaccard near-dup pairs, blocked on an exact key
    * (e.g. language), with PREFIX-FILTER candidate generation
    * (AllPairs/PPJoin family, Bayardo et al. WWW'07; Chaudhuri et al.
    * ICDE'06) over HASHED (60-bit int) distinct trigram sets.
    *
    * Candidate stage: grams are canonically ordered by ascending
    * global document frequency (rare first, ties on gram id); each
    * doc's PREFIX is its first |s| - ceil(t*|s|) + 1 grams. The prefix
    * lemma: J(a,b) >= t implies overlap >= max(ceil(t|a|), ceil(t|b|))
    * = alpha, and two sets with overlap >= alpha must share an element
    * within their (|s| - alpha + 1)-prefixes under a common order —
    * our per-record prefix is at least that long, so the filter is
    * LOSSLESS (the DuckDB oracle recomputes the unpruned answer and
    * the hash gate would catch a lost pair). A small epsilon guards
    * ceil against float wobble shortening a prefix.
    *
    * Every stage is linear in the gram multiset: df count, per-doc
    * rank, prefix explode (~(1-t) of all gram occurrences), equi-join
    * on (block, gram). The quadratic per-block pairwise of the naive
    * plan never materializes, which is what makes this the 100 TB
    * plan: candidates scale with shared-rare-gram pairs, not with
    * block size squared. Verification runs the primitive merge-scan
    * (SortedIntersectCount) once per surviving candidate; a size-ratio
    * prune (J <= min/max sizes) drops impossible pairs before that.
    *
    * RELEASE contract: the returned frame is backed by an eager
    * checkpoint of the doc->gram-set table (read three times by the
    * plan). After consuming the result, call
    * [[graft.Checkpoints.release]] on it to free those blocks.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    // sorted distinct hashed char-3-grams in ONE native pass (r21):
    // gram_hashes replaces the composed case-when + two interpreted
    // transform lambdas + string array_distinct + array_sort chain —
    // see GramHashes' scaladoc for the exact-equivalence contract.
    // poly_hash family since r12: at sf0.1 this evaluates ~10M grams
    // and the md5+hex+conv chain was the sweep's largest remaining md5
    // sink. No min-selection happens over these hashes (sets are
    // compared by intersection size), so the short-string bias that
    // keeps minhash on md5 is irrelevant here.
    val g = df
      .select(col(blockCol).as("blk"), col(idCol).as("doc"),
        call_function(graft.functions.GramHashes.fnName,
          lower(col(textCol))).as("g"))
      .withColumn("n", size(col("g")))
    // docs->grams materialized once; re-read by the df count, the
    // prefix build, and the verify re-attach below
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    val gSets = g.repartition(fanout, col("doc")).localCheckpoint(true)

    // canonical order: ascending global document frequency, rare grams
    // first (common grams land outside prefixes => few collisions)
    val occ = gSets.select(col("blk"), col("doc"), col("n"),
      explode(col("g")).as("gram"))
    val gramDf = occ.groupBy(col("gram")).agg(count(lit(1)).as("df_"))
    val prefixLen = (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int")
      + lit(1))
    val byRarity = Window.partitionBy(col("doc")).orderBy(col("df_"), col("gram"))
    val prefixes = occ.join(gramDf, "gram")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= least(prefixLen, col("n")))
      .select(col("blk"), col("gram"), col("doc"), col("n"), col("pos"))

    // candidates: same block, sharing >=1 prefix gram; two codegen'd
    // prunes run inside the join before the expensive distinct+verify:
    //   - size ratio: J <= min/max sizes
    //   - PPJoin POSITIONAL filter: at a shared gram ranked pos_a/pos_b
    //     in the canonical order, overlap <= earlier-shared + 1 +
    //     min(n_a-pos_a, n_b-pos_b); at the pair's FIRST shared gram
    //     "earlier-shared" is 0 and the bound must still reach
    //     alpha = ceil(t/(1+t)*(n_a+n_b)) (the Jaccard overlap
    //     requirement). Keeping a pair when ANY occurrence passes is
    //     LOSSLESS: a true pair's first-match occurrence always
    //     passes (bound >= overlap >= alpha there). The unpruned
    //     DuckDB oracle would catch a lost pair.
    //     (Measured neutral on the sf0.1 testdata — its tiny synthetic
    //     vocabulary keeps prefixes ~10 grams so few occurrences land
    //     past the positional bound; on real corpora with long
    //     documents and heavy-tailed gram frequencies this prune is
    //     where PPJoin beats AllPairs.)
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("n_a") + col("n_b")) - lit(1e-9))
    val cand = prefixes.select(col("blk"), col("gram"), col("doc").as("doc_a"),
        col("n").as("n_a"), col("pos").as("pos_a"))
      .join(prefixes.select(col("blk"), col("gram"), col("doc").as("doc_b"),
        col("n").as("n_b"), col("pos").as("pos_b")),
        Seq("blk", "gram"))
      .filter(col("doc_a") < col("doc_b") &&
        col("n_a") * threshold <= col("n_b") && col("n_b") * threshold <= col("n_a") &&
        lit(1) + least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) >= alpha)
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    cand
      .join(gSets.select(col("doc").as("doc_a"), col("g").as("g_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(gSets.select(col("doc").as("doc_b"), col("g").as("g_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("isect",
        call_function(VectorExpressions.isectFnName, col("g_a"), col("g_b")).cast("double"))
      // exact-ratio threshold test + floor-truncated output, for the
      // same at-threshold/tie-free reasons as minhashLshPairs
      .withColumn("jr", col("isect") / (col("n_a") + col("n_b") - col("isect")))
      .filter(col("jr") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        (floor(col("jr") * lit(1e6)) / lit(1e6)).as("jaccard"))
  }

  // ------------------------------------------------------- winnowing
  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS scheme): hash every word k-gram, slide a
    * window of `w` consecutive hashes, select each window's minimum;
    * the distinct selected hashes are the document's fingerprints.
    * The winnowing guarantee: any shared token run of length
    * >= w + k - 1 between two documents yields a shared fingerprint,
    * while expected fingerprint density is 2/(w+1) of the k-gram
    * count — position-robust near-dup detection at a fraction of the
    * full shingle set's size.
    *
    * Fingerprints are selected by VALUE (the distinct window minima),
    * not by position: inside one window a value tie selects the same
    * hash either way, so the paper's rightmost-tie rule only matters
    * for positional attribution, which this operator does not emit.
    *
    * Short docs degrade gracefully (shingle convention): fewer than k
    * tokens -> the whole doc is one gram; fewer than w grams -> one
    * fingerprint (the global min).
    *
    * Scale/codegen notes — the flat-explode discipline (this file's
    * header: explode -> hash -> codegen'd aggregation, never nested
    * higher-order lambda folds): BOTH array-lambda formulations of
    * this pipeline were measured catastrophic, for the same reason —
    * projection collapse inlines the array producer into every
    * element reference inside a lambda:
    *   - the window step as `transform(sequence(...), j =>
    *     least(element_at(hs, ...)))` re-tokenized and re-hashed the
    *     doc per operand: O(m²·w), 30 min for 5 000 docs at sf0.1
    *     (jstack: `Least.eval` re-entering `ConcatWs`/`ArrayFilter`);
    *   - gram STRINGS built as `transform(sequence(...), i =>
    *     concat_ws(element_at(toks, i+d)...))` re-tokenized the doc
    *     inside every `element_at`: ~34 µs per gram, 9 s of the
    *     original 24.8 s at sf0.1 (BENCH_r11 q104 analysis; the other
    *     ~10 s was one md5 + hex-conv per gram).
    * The shape that survives Catalyst: posexplode TOKENS once (a
    * Generate evaluates its child once per input row), hash each token
    * once with the native codegen'd Karp-Rabin fold (PolyHash — the
    * paper's own hash family), then build each k-gram's hash as a
    * Horner combination of the k token hashes via `lead()` and take
    * the sliding minimum — integer window functions over materialized
    * long columns, sharing ONE doc-partitioned sort (lead and min use
    * the same partitioning + ordering), no gram string ever exists.
    */
  def winnowFingerprintsFlat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    require(k >= 1, "k-gram size must be >= 1")
    require(w >= 2, "winnowing window must be >= 2")
    val HB = 1000003L // Horner base over token hashes; P * HB < 2^52
    val base =
      df.select(col(idCol).as("doc"), TextFunctions.tokens(col(textCol)).as("toks"))
    val byPos = Window.partitionBy(col("doc")).orderBy(col("pos"))
    // gram hash at token position pos: Horner fold over the k token
    // hashes th[pos..pos+k-1]; lead() past the partition end yields
    // null, and those tail rows are exactly pos >= m (dropped)
    val gramHash = (1 until k).foldLeft(col("th")) { (acc, d) =>
      (acc * lit(HB) + lead(col("th"), d).over(byPos)) % lit(P) }
    val grams = base
      .filter(size(col("toks")) >= k)
      .select(col("doc"), (size(col("toks")) - (k - 1)).as("m"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc"), col("m"), col("pos"),
        TextFunctions.polyHash(col("tok")).as("th"))
      .select(col("doc"), col("m"), col("pos"), gramHash.as("h"))
      .filter(col("pos") < col("m"))
    // sub-k docs degrade to one whole-doc gram (shingle convention):
    // the same Horner fold over ALL token hashes, seeded 0 — identical
    // to the k-gram formula since 0 * HB + th0 = th0. <= 2 lambda
    // elements per such doc, so the interpreted HOF is irrelevant here.
    val smallDocs = base
      .filter(size(col("toks")) < k)
      .select(col("doc"), lit(1).as("m"), lit(0).as("pos"),
        aggregate(transform(col("toks"), t => TextFunctions.polyHash(t)),
          lit(0L), (acc, x) => (acc * lit(HB) + x) % lit(P)).as("h"))
    val frame = Window.partitionBy(col("doc")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams.unionByName(smallDocs)
      .withColumn("wmin", min(col("h")).over(frame))
      // full windows only (pos is 0-based: the last full window starts
      // at m - w); a doc with fewer than w grams degrades to its
      // global minimum — the pos-0 window covers the whole doc
      .filter(col("pos") <= col("m") - w || (col("m") < w && col("pos") === 0))
      .select(col("doc"), col("wmin").as("fp"))
      .distinct()
  }

  /** Array-per-doc view of [[winnowFingerprintsFlat]] (fps sorted
    * ascending) — the API surface for per-doc fingerprint storage.
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame =
    winnowFingerprintsFlat(df, idCol, textCol, k, w)
      .groupBy(col("doc"))
      .agg(sort_array(collect_set(col("fp"))).as("fps"))

  /** Near-dup candidate pairs by winnowing-fingerprint overlap: docs
    * sharing >= `minShared` selected fingerprints, with the
    * containment score n_shared / min(n_a, n_b).
    *
    * Blocking is the fingerprint equi-self-join — the same
    * never-all-pairs discipline as the LSH band join, and the same
    * skew hazard: a fingerprint selected in many documents (a common
    * phrase that happens to be a local minimum) is a hot block whose
    * join blows up quadratically. `maxDf` drops such stop-fingerprints
    * before the join (df-capped blocking, the PPJoin analog of a
    * stopword list); every count in the output — n_shared, n_a, n_b —
    * is computed over the SAME capped fingerprint universe, so the
    * containment score is internally consistent.
    *
    * At 100 TB: per-doc fingerprinting is map-only; the exploded
    * (fp, doc) table is ~2/(w+1) of the shingle explode; the df cap
    * bounds every join block at `maxDf` rows, so the candidate join
    * cost is sum over fingerprints of df² <= maxDf * |table| — linear
    * in the corpus with a tunable constant.
    *
    * The flat (doc, fp) table is eagerly checkpoint-materialized: it
    * has FOUR lazy consumers (the df histogram, the per-doc counts,
    * both sides of the pair join), and without the cut each consumer
    * re-executes the whole fingerprint pipeline (the q95
    * multi-consumer disease). RELEASE CONTRACT: the result is
    * checkpoint-backed — consume it (write/collect/count), then call
    * [[graft.Checkpoints.release]] on it.
    */
  def winnowPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4,
      maxDf: Int = 10,
      minShared: Int = 2): DataFrame = {
    // spread the hash-heavy map stage across tasks even when the input
    // is a single small parquet split (see ngramJaccardPairs note)
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    val e = winnowFingerprintsFlat(
        df.repartition(fanout, col(idCol)), idCol, textCol, k, w)
      .localCheckpoint(true)
    // df-capped, >=2 (a fingerprint unique to one doc joins nothing)
    val informative = e.groupBy(col("fp"))
      .agg(count(lit(1)).as("fp_df"))
      .filter(col("fp_df") >= 2 && col("fp_df") <= maxDf)
      .select(col("fp"))
    val ee = e.join(informative, Seq("fp"))
    val nFp = ee.groupBy(col("doc")).agg(count(lit(1)).as("n_fp"))
    ee.select(col("fp"), col("doc").as("doc_a"))
      .join(ee.select(col("fp"), col("doc").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(nFp.select(col("doc").as("doc_a"), col("n_fp").as("n_a")), Seq("doc_a"))
      .join(nFp.select(col("doc").as("doc_b"), col("n_fp").as("n_b")), Seq("doc_b"))
      // exact small-integer ratio: correctly-rounded double division is
      // engine-portable (minhashLshPairs note); floor-truncated output
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"), col("n_b"),
        (floor(col("n_shared").cast("double") / least(col("n_a"), col("n_b")).cast("double")
          * lit(1e6)) / lit(1e6)).as("containment"))
  }
}
