package graft.operators

import graft.SparkSpec

/** [[Similarity.scalarQuantize]] / [[Similarity.sq8TopK]] edge
  * semantics the q241/q242 oracles exercise only in aggregate: the
  * bucket-edge rules (v = max codes 255, constant dimension codes 0),
  * hand-checked codes, the reconstruction-error bound (≤ half a
  * bucket per dimension), and full recall on well-separated vectors.
  */
class Sq8Spec extends SparkSpec {

  test("codes: hand-checked buckets, v=max -> 255, constant dimension -> 0") {
    import spark.implicits._
    // dim0 spans [0, 10]; dim1 is constant 7; dim2 spans [-1, 1]
    val emb = Seq(
      (0L, Seq(0.0, 7.0, -1.0)),
      (1L, Seq(5.0, 7.0, 0.0)),
      (2L, Seq(10.0, 7.0, 1.0))).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize(emb, "vec_id", "embedding")
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(got(0L) === Seq(0, 0, 0))
    assert(got(1L) === Seq(127, 0, 127)) // floor(5*255/10), const, floor(1*255/2)
    assert(got(2L) === Seq(255, 0, 255)) // v = max codes 255
  }

  test("reconstruction error is bounded by half a bucket per dimension") {
    import spark.implicits._
    val r = new scala.util.Random(5)
    val emb = (0L until 50L).map(i => (i, Seq.fill(16)(r.nextDouble() * 4 - 2)))
      .toDF("vec_id", "embedding")
    val errs = Similarity.scalarQuantize(emb, "vec_id", "embedding")
      .select("err").as[Double].collect()
    // span 4 per dim -> bucket 4/255; half-bucket bound x 16 dims
    val bound = 16 * (4.0 / 255) / 2 + 1e-9
    assert(errs.forall(e => e >= 0 && e <= bound), s"max=${errs.max} bound=$bound")
  }

  test("sq8TopK recovers the exact neighbor on well-separated clusters") {
    import spark.implicits._
    // three orthogonal-ish clusters; quantization noise cannot flip them
    def v(axis: Int, eps: Double) =
      Seq.tabulate(8)(d => if (d == axis) 1.0 + eps else eps / 10)
    val corpus = Seq(
      (0L, v(0, 0.00)), (1L, v(0, 0.02)), (2L, v(0, 0.04)),
      (10L, v(3, 0.00)), (11L, v(3, 0.02)),
      (20L, v(6, 0.00)), (21L, v(6, 0.02))).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(corpus.filter($"vec_id".isin(0L, 10L, 20L)), corpus,
        "vec_id", "embedding", k = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got(0L) === Seq(1L, 2L))
    assert(got(10L) === Seq(11L, 20L) || got(10L).head === 11L)
    assert(got(20L).head === 21L)
  }
}
