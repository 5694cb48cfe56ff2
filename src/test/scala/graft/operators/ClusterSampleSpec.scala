package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cluster-balanced diversity sampling
  * (Similarity.clusterBalancedSample — oracle-gated end-to-end by
  * q117). Pins the assignment rule (nearest coarse centroid, first-min
  * tiebreak — the IVF rule, so a persisted AnnModel coarse set drops
  * in), the per-cluster quota, and partitioning invariance of the
  * hash-order keep set.
  */
class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  private val coarse = Array(Array(0.0, 0.0), Array(10.0, 0.0))

  private def corpus = Seq(
    (1L, Seq(0.1f, 0.1f)), (2L, Seq(0.2f, -0.1f)), (3L, Seq(-0.3f, 0.0f)),
    (4L, Seq(9.8f, 0.1f)), (5L, Seq(10.2f, -0.2f)), (6L, Seq(9.9f, 0.0f)),
    (7L, Seq(0.4f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("assigns each vector to its nearest coarse centroid") {
    val got = Similarity.clusterBalancedSample(corpus, "vec_id", "embedding", coarse, quota = 10)
      .select("cluster", "vec_id").as[(Int, Long)].collect().toSet
    assert(got === Set((0, 1L), (0, 2L), (0, 3L), (0, 7L), (1, 4L), (1, 5L), (1, 6L)))
  }

  test("equidistant vector takes the FIRST centroid (IVF tiebreak)") {
    val mid = Seq((42L, Seq(5.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.clusterBalancedSample(mid, "vec_id", "embedding", coarse, quota = 1)
      .select("cluster").as[Int].collect().toList
    assert(got === List(0))
  }

  test("quota caps every cluster; ranks are 1..n in hash order") {
    val got = Similarity.clusterBalancedSample(corpus, "vec_id", "embedding", coarse, quota = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val perCluster = got.groupBy(_._1)
    assert(perCluster.values.forall(_.length == 2), "quota 2 must keep exactly 2 of >=2")
    perCluster.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toList === List(1, 2))
    }
  }

  test("clusterAssign: bare assignment matches the sample's cluster column") {
    val viaAssign = Similarity.clusterAssign(corpus, "vec_id", "embedding", coarse)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val viaSample = Similarity.clusterBalancedSample(corpus, "vec_id", "embedding", coarse, quota = 10)
      .collect().map(r => (r.getLong(2), r.getInt(0))).toSet
    assert(viaAssign === viaSample)
  }

  test("keep set is invariant under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.clusterBalancedSample(df, "vec_id", "embedding", coarse, quota = 2)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(corpus.repartition(1)) === run(corpus.repartition(7)))
  }
}
