package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** trainKMeans: cluster recovery, determinism, and the trained-codebook
  * IVF path (the production configuration ivfTopK documents).
  */
class KMeansSpec extends SparkSpec {

  // three well-separated 4-d blobs, 5 points each
  private def blobs = {
    import spark.implicits._
    val pts = for {
      (center, cid) <- Seq(
        Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0), Seq(0.0, 0.0, 10.0, 0.0))
        .zipWithIndex
      j <- 0 until 5
    } yield (s"p${cid}_$j", center.zipWithIndex.map { case (c, d) =>
      c + 0.1 * ((j + d) % 3) }, cid)
    pts.toDF("id", "vec", "true_cluster")
  }

  test("recovers well-separated blobs and is deterministic") {
    val cents1 = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5)
    val cents2 = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5)
    assert(cents1.collect().map(_.toString).sorted.toSeq ===
      cents2.collect().map(_.toString).sorted.toSeq)
    // each centroid sits on one blob: its dominant component ~10
    val rows = cents1.collect().map(_.getSeq[Double](1))
    assert(rows.length === 3)
    val dominant = rows.map(c => c.indexOf(c.max)).sorted
    assert(dominant.toSeq === Seq(0, 1, 2), s"centroids: ${rows.map(_.mkString(",")).mkString(" | ")}")
    rows.foreach(c => assert(c.max > 9.0 && c.max < 11.0))
  }

  test("bounded-sample init: covers-the-corpus sample equals the exact path; deterministic") {
    // sample >= corpus: the driver-side farthest-point traversal sees
    // every row the distributed traversal sees, same seed/d2/ties —
    // identical centroids bit-for-bit
    val exact = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5)
    val sampled = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5,
      initSampleSize = 1000)
    assert(sampled.collect().map(_.toString).sorted.toSeq ===
      exact.collect().map(_.toString).sorted.toSeq)
    // bounded sample (smaller than the corpus): still deterministic,
    // still k centroids, still recovers the blobs after Lloyd runs on
    // the FULL corpus
    val small1 = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5,
      initSampleSize = 6)
    val small2 = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5,
      initSampleSize = 6)
    assert(small1.collect().map(_.toString).sorted.toSeq ===
      small2.collect().map(_.toString).sorted.toSeq)
    assert(small1.count() === 3L)
  }

  test("empty clusters keep their previous centroid (k > natural clusters)") {
    val cents = Similarity.trainKMeans(blobs, "id", "vec", k = 5, iters = 3)
    assert(cents.count() === 5L) // never collapses below k
  }

  test("nprobe=2 recovers a cross-boundary neighbor that nprobe=1 misses") {
    import spark.implicits._
    // two lists: c0 along x, c1 along y. The query leans to c1 but its
    // true nearest neighbor sits just over the boundary in c0's list.
    val cents = Seq((0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0))).toDF("id", "vec")
    val corpus = Seq(
      ("boundary", Seq(6.2, 6.0)), // assigned c0; the true best match
      ("inlist", Seq(0.0, 9.0))) // assigned c1
      .toDF("id", "vec")
    val query = Seq(("q", Seq(6.0, 6.2))).toDF("id", "vec") // assigned c1
    def top1(nprobe: Int) =
      Similarity.ivfTopK(query, corpus, cents, "id", "vec", k = 1, nprobe = nprobe)
        .collect().map(_.getAs[String]("neighbor_id")).toSeq
    assert(top1(1) === Seq("inlist"), "nprobe=1 should stay in the probed list")
    assert(top1(2) === Seq("boundary"), "nprobe=2 should reach the second list")
  }

  test("trained codebook drives ivfTopK with full recall on blob data") {
    val cents = Similarity.trainKMeans(blobs, "id", "vec", k = 3, iters = 5)
      .select(col("cluster_id").as("id"), col("centroid").as("vec"))
    val queries = blobs.filter(col("id") === "p0_0").select(col("id"), col("vec"))
    val ivf = Similarity.ivfTopK(queries, blobs.select(col("id"), col("vec")),
      cents, "id", "vec", k = 3).collect()
    // neighbors all come from the query's own blob
    assert(ivf.length === 3)
    assert(ivf.forall(_.getAs[String]("neighbor_id").startsWith("p0_")))
    // and match the brute-force answer exactly on this data
    val brute = Similarity.cosineTopK(queries, blobs.select(col("id"), col("vec")),
      "id", "vec", k = 3).collect()
    assert(ivf.map(r => (r.getAs[String]("neighbor_id"), r.getAs[Int]("rank"))).toSeq ===
      brute.map(r => (r.getAs[String]("neighbor_id"), r.getAs[Int]("rank"))).toSeq)
  }
}
