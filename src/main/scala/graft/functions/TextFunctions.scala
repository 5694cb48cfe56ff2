package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks for the training-data extensions
  * (SURVEY.md §7 phase 4). Every function here is built strictly from
  * codegen'd Catalyst expressions (no UDFs) and — deliberately — from
  * primitives that DuckDB evaluates bit-identically, so each operator
  * can carry an exact SQL oracle:
  *
  *   - md5 → identical hex in both engines;
  *   - `conv(hex,16,10)` / `CAST('0x…' AS BIGINT)` → identical 60-bit ints;
  *   - higher-order `transform`/`aggregate` fold left-to-right exactly
  *     like DuckDB's `list_transform`/`list_sum` (verified empirically
  *     on the testdata; see scripts/check_correctness.py gate).
  *
  * At 100 TB these are all narrow per-row transformations: no shuffle,
  * whole-stage codegen, parquet column pruning intact (each reads only
  * `text`).
  */
object TextFunctions {

  /** Lowercased alphanumeric word tokens, empties removed — the native
    * single-pass [[Tokens]] expression (r21: the composed
    * filter/split/lower form carried an interpreted HigherOrderFunction
    * in the hot loop of every tokenizing operator; see Tokens scaladoc
    * for the exact-equivalence contract).
    */
  def tokens(text: Column): Column = call_function(Tokens.fnName, text)

  /** Deterministic 60-bit positive hash of a string: first 15 hex chars
    * of md5 parsed base-16 — natively, via [[Hash60Md5]] (r21:
    * value-identical to `conv(substring(md5(s),1,15),16,10)` but
    * without the per-row hex render + re-parse and the per-row
    * MessageDigest lookup). DuckDB mirror unchanged:
    * `CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT)`.
    */
  def hash60(s: Column): Column = call_function(Hash60Md5.fnName, s)

  /** Seeded variant for minhash families: hash of "<seed>|<s>". */
  def hash60(s: Column, seed: Int): Column =
    hash60(concat(lit(s"$seed|"), s))

  /** Karp-Rabin polynomial hash in [0, 2^31-1) — the cheap (native
    * codegen'd, allocation-free) alternative to [[hash60]] for
    * hash-per-gram hot paths; see [[PolyHash]] for the full contract
    * (code-point fold, exact DuckDB mirror for ALL inputs).
    *
    * Where it may and may not replace md5: safe wherever downstream
    * only needs DISTINCTNESS or is re-mixed — set intersection (q30),
    * equi-join blocking keys, winnowing's Horner k-gram combinations,
    * and the minhash BASE hash (the Carter-Wegman affine layer
    * supplies pairwise-independent mixing for any distinct inputs).
    * NOT safe where raw hash VALUES or BITS must be uniform: direct
    * min-selection over raw hashes of variable-length strings (h <
    * base^len biases short inputs small) and simhash's per-bit votes
    * (high bits are zero for short inputs) — those stay on md5.
    */
  def polyHash(s: Column): Column = call_function(PolyHash.fnName, s)

  /** Unicode NFC canonical composition (native expression, ASCII
    * fast-path) — see [[NfcNormalize]]. DuckDB mirror:
    * `nfc_normalize(s)`.
    */
  def nfcNormalize(s: Column): Column = call_function(NfcNormalize.fnName, s)

  /** DuckDB mirror of [[polyHash]]; %s = string expr (referenced
    * twice). Identical left fold over code points (`unicode(c)` there,
    * UTF-8 decode here).
    */
  val polyHashSql: String =
    "(CASE WHEN %s = '' THEN 0 ELSE list_reduce(" +
      "list_prepend(0::BIGINT, list_transform(string_split(%s, ''), " +
      "c -> unicode(c)::BIGINT)), " +
      "(acc, c) -> (acc * 1000003 + c) %% 2147483647) END)"

  // ------------------------------------------------------------ lang id
  /** Tiny stopword inventories; scoring is count-of-matching-tokens
    * (with multiplicity). Heuristic n-gram-free language ID — the
    * standard cheap first pass of a corpus pipeline.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "auf", "ein"),
    "fr" -> Seq("le", "les", "et", "un", "une", "est", "dans", "pour", "au", "ce"))

  /** Language priority for deterministic tie-breaks (strictly-greater
    * chain: earlier language wins ties).
    */
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr")

  /** Stopword occurrence count — the native one-pass [[StopwordHits]]
    * (r21: the composed `size(filter(toks, array_contains(...)))`
    * carried an interpreted HigherOrderFunction per token per language;
    * langId pays it four times per document). Value- and type-identical
    * to the composed form.
    */
  def stopwordHits(toks: Column, lang: String): Column =
    call_function(StopwordHits.fnName, toks, lit(lang))

  /** Best-scoring language, "und" (undetermined) when no stopword hits.
    * Evaluated as a strictly-greater chain in `langOrder` order so the
    * result is deterministic and mirrors the oracle SQL CASE chain.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langOrder.map(l => l -> stopwordHits(toks, l))
    // greatest score wins; earlier language wins ties
    val best = scores.tail.foldLeft(scores.head._2)((acc, s) => greatest(acc, s._2))
    scores.foldRight(lit("und"): Column) { case ((l, sc), els) =>
      when(sc === best && best > 0, lit(l)).otherwise(els)
    }
  }

  // ------------------------------------------------------- quality score
  /** Ratio of [a-z] chars after lowering — crude "is this prose" probe. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    stopwordHits(toks, "en").cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite document-quality heuristic in [0,1]: length saturation,
    * English stopword density, alphabetic density. Fixed weights; the
    * expression tree (and therefore IEEE evaluation order) matches the
    * oracle SQL exactly.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    lit(0.4) * least(nTok / lit(100.0), lit(1.0)) +
      lit(0.3) * stopwordRatio(text) +
      lit(0.3) * alphaRatio(text)
  }

  // ------------------------------------------------------ token counting
  /** Whitespace-split token count (the cheap estimator). */
  def whitespaceTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= lit("")))

  /** BPE-ish subword proxy: alpha runs, digit runs, and single
    * punctuation marks each count as one token — the shape a byte-pair
    * tokenizer's pre-tokenizer uses.
    */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  // ------------------------------------------------------- fingerprints
  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set (the classic "bag fingerprint" for exact-after-
    * normalization dedup).
    *
    * sort_array, not array_sort (r22): on a containsNull=false string
    * array the two are value-identical (both ascending; they differ
    * only in null placement, and tokens() never emits nulls), but
    * array_sort's comparator lambda is an interpreted
    * HigherOrderFunction in the generated code while sort_array is
    * whole-stage codegen. FingerprintSpec pins the equality.
    */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(array_distinct(tokens(text)))))

  /** Order-sensitive positional rolling fingerprint: sum over tokens of
    * `(hash60(token) * (i+1)) mod 2^31-1`. Each term < 2^31 and docs are
    * ≪ 2^32 tokens, so the sum stays well inside BIGINT under ANSI
    * arithmetic in both engines.
    */
  def rollingFingerprint(text: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    val terms = transform(tokens(text), (t, i) => pmod(hash60(t) % M * (i + lit(1)), lit(M)))
    aggregate(terms, lit(0L), (acc, x) => acc + x)
  }
}
