package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  private def estimate(sk: Seq[Long], term: String, d: Int, w: Int): Long =
    (0 until d).map(j => sk(j * w + CountMin.bucket(term, j, w))).min

  test("collision-free width: estimates are the exact counts") {
    import spark.implicits._
    val toks = Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    val df = toks.toDF("term")
    val sk = df.agg(CountMin.sketch(4, 1024)(col("term"))).collect()(0)
      .getSeq[Long](0)
    assert(estimate(sk, "x", 4, 1024) === 7L)
    assert(estimate(sk, "y", 4, 1024) === 3L)
    assert(estimate(sk, "z", 4, 1024) === 1L)
  }

  test("narrow width: never underestimates, every row sums to the stream size") {
    import spark.implicits._
    val terms = (0 until 40).map(i => s"t$i")
    val toks = terms.zipWithIndex.flatMap { case (t, i) => Seq.fill(i % 5 + 1)(t) }
    val (d, w) = (3, 4) // heavy collisions by construction
    val sk = toks.toDF("term").agg(CountMin.sketch(d, w)(col("term")))
      .collect()(0).getSeq[Long](0)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    exact.foreach { case (t, n) =>
      assert(estimate(sk, t, d, w) >= n, s"underestimate for $t")
    }
    (0 until d).foreach { j =>
      assert(sk.slice(j * w, (j + 1) * w).sum === toks.size.toLong)
    }
  }

  test("sketch is partition- and merge-order invariant") {
    import spark.implicits._
    val toks = (0 until 500).map(i => s"w${i % 37}")
    def run(parts: Int): Seq[Long] =
      toks.toDF("term").repartition(parts)
        .agg(CountMin.sketch(4, 64)(col("term"))).collect()(0).getSeq[Long](0)
    assert(run(1) === run(13))
  }

  test("bucketSql mirrors the Scala bucket arithmetic through poly_hash") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val terms = Seq("alpha", "merge", "x9", "a")
    val df = terms.toDF("term")
    (0 until 4).foreach { j =>
      val got = df
        .withColumn("b", expr(CountMin.bucketSql("poly_hash(term)", j, 64)))
        .orderBy("term").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.foreach { t =>
        assert(got(t) === CountMin.bucket(t, j, 64).toLong, s"row $j term $t")
      }
    }
  }
}
