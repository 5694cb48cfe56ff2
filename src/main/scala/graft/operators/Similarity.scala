package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an embedding column (Array[Float]).
  *
  * Two plans:
  *   - `cosineTopK` — brute force: query-set × corpus join, exact cosine,
  *     per-query top-k window. The *baseline*: correct at any recall,
  *     cost |Q|·|C|. Sensible when |Q| is small (the query side is
  *     broadcast, so the corpus never shuffles).
  *   - `lshTopK` — sign-LSH bucketed: vectors hash to a b-bit bucket
  *     (sign of the first b components — a fixed, data-independent
  *     hyperplane family); candidates are same-bucket only, so the join
  *     is a keyed equi-join that shuffles each corpus row once. The
  *     scale path: cost |C| + Σ_bucket |Q_b|·|C_b|.
  *
  * Determinism: cosine is evaluated as one left-to-right fold
  * (`aggregate(zip_with(...))`) over double-promoted components — the
  * same IEEE operation order DuckDB's list primitives use, verified
  * bit-exact on the testdata. Rankings tie-break on vec_id.
  */
object Similarity {

  /** Components promoted to double before any arithmetic. */
  def asDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right fold dot product of two double vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, z) => acc + z)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Sign-LSH bucket id from the first `bits` components:
    * bit d set iff component d+1 > 0.
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(d =>
      when(element_at(v, d + 1) > 0d, lit(1 << d)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector (self-match excluded).
    * Output: query_id, neighbor_id, rank, cosine.
    */
  def cosineTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDoubleVec(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDoubleVec(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 9).as("cosine"))
  }

  /** Bucketed approximate top-k: neighbors come only from the query's
    * sign-LSH bucket. Same output shape as cosineTopK.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDoubleVec(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDoubleVec(col(vecCol)).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 9).as("cosine"))
  }

  /** Most-similar pairs across the corpus (embedding near-dup
    * detection): exact pairwise cosine, global top-n pairs. At scale the
    * same verification runs behind an LSH candidate filter (lshTopK);
    * the exact form is the audit tool / baseline.
    */
  def topPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      n: Int): DataFrame = {
    val a = corpus.select(col(idCol).as("vec_a"), asDoubleVec(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("vec_b"), asDoubleVec(col(vecCol)).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(n)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 9).as("cosine"))
  }
}
