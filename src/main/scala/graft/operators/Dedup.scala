package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operator suite for corpus curation — exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design (the 100 TB story):
  *   - every per-document stage (shingling, signatures, simhash) is a
  *     narrow codegen'd projection — no shuffle, no state;
  *   - candidate generation is always a *blocked* equi-self-join
  *     (LSH band hash / simhash chunk), never an O(n²) cross join:
  *     the shuffle is keyed on the block hash, so each reducer sees one
  *     bucket. Skewed buckets (a shingle every doc shares) are handled
  *     by AQE skew-join splitting (on in GraftSession);
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

  /** Distinct word 3-shingles; whole doc as one shingle when < 3 tokens
    * (keeps short docs dedupable instead of silently dropped).
    */
  def shingles(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** One minhash component: lexicographic min over shingles of the
    * seeded 15-hex-char md5 prefix. String-min keeps the primitive
    * bit-portable to the SQL oracle (no integer conversion needed).
    */
  def minhashSig(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => substring(md5(concat(lit(s"$seed|"), x)), 1, 15)))

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

  /** MinHash + banded LSH near-duplicate pairs.
    *
    * numHashes signature components, grouped into `bands` bands of
    * numHashes/bands rows; docs sharing any band hash become candidates;
    * candidates are verified with true Jaccard over distinct shingle
    * sets and kept at `threshold` or above.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSh = df.select(col(idCol).as("doc"), shingles(col(textCol)).as("sh"))
    val withSig = withSh.select(
      col("doc") +: col("sh") +:
        (0 until numHashes).map(k => minhashSig(col("sh"), k).as(s"sig_$k")): _*)
    // band hash = md5 over the band's signature slice
    val banded = withSig.select(col("doc"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", (0 until rows).map(r => col(s"sig_${b * rows + r}")): _*)).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc"), col("sh"), col("bk.band"), col("bk.bh"))

    val left = banded.select(col("band"), col("bh"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("bh"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    val cand = left.join(right, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 60-bit SimHash over word tokens (bit j set when the ±1 vote of
    * token-hash bit j sums positive). 60 bits keeps every intermediate
    * positive inside BIGINT under ANSI arithmetic in both engines.
    * Built as one SQL expression string so the nested higher-order
    * aggregates read identically to the oracle.
    */
  def simhash60(textCol: String): Column = expr(
    s"""cast(aggregate(sequence(0, 59), 0L, (acc, j) -> acc + if(
       |  aggregate(filter(split(lower($textCol), '[^a-z0-9]+'), tk -> tk != ''),
       |            0, (a, tk2) -> a + if(
       |    (shiftright(cast(conv(substring(md5(tk2), 1, 15), 16, 10) as bigint), j) & 1) = 1,
       |    1, -1)) > 0,
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
    val withSim = df.select(col(idCol).as("doc"), simhash60(textCol).as("simhash"))
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

  /** Character n-gram Jaccard near-dup pairs, blocked on an exact key
    * (e.g. language): per-block pairwise with true char-trigram Jaccard.
    * The block key bounds the quadratic term to the largest block.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val grams = expr(
      s"""case when length($textCol) >= 3 then
         |  array_distinct(transform(sequence(1, length($textCol) - 2),
         |    i -> substring(lower($textCol), i, 3)))
         |else array(lower($textCol)) end""".stripMargin)
    val g = df.select(col(blockCol).as("blk"), col(idCol).as("doc"), grams.as("g"))
    val left = g.select(col("blk"), col("doc").as("doc_a"), col("g").as("g_a"))
    val right = g.select(col("blk"), col("doc").as("doc_b"), col("g").as("g_b"))
    left.join(right, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
