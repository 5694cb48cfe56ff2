package graft.operators

import graft.SparkSpec

/** Batch-hard triplet mining (Similarity.mineTriplets). q113
  * oracle-gates the operator on the real embeddings table; these pin
  * the mining semantics on a hand-built labeled corpus against a
  * brute-force reference, plus the no-positive-peer edge.
  */
class TripletMiningSpec extends SparkSpec {
  import spark.implicits._

  // three labeled clusters on the plane + one singleton label:
  // cosines are axis-separable so hardest-pos/neg are hand-derivable
  private val vecs: Seq[(Long, Array[Float], Long)] = Seq(
    (0L, Array(1.0f, 0.0f), 0L),
    (1L, Array(0.9f, 0.1f), 0L),
    (2L, Array(0.7f, 0.3f), 0L),
    (3L, Array(0.0f, 1.0f), 1L),
    (4L, Array(0.1f, 0.9f), 1L),
    (5L, Array(0.5f, 0.5f), 2L)) // singleton label: no positive exists

  private def df = vecs.toDF("vec_id", "embedding", "label")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def d(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    d(a, b) / math.sqrt(d(a, a) * d(b, b))
  }

  private def mined(kNeg: Int) =
    Similarity.mineTriplets(df, df, "vec_id", "embedding", "label", kNeg)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getDouble(4)))

  test("hardest positive is the min-cosine same-label peer; negatives max-cosine cross-label") {
    val rows = mined(kNeg = 2)
    val byId = vecs.map(v => v._1 -> v).toMap
    for (anchor <- vecs) {
      val others = vecs.filter(_._1 != anchor._1)
      val sameLabel = others.filter(_._3 == anchor._3)
      val pos = rows.filter(r => r._1 == anchor._1 && r._2 == "pos")
      if (sameLabel.isEmpty) assert(pos.isEmpty, s"anchor ${anchor._1} fabricated a positive")
      else {
        val want = sameLabel.minBy(v => (cos(anchor._2, v._2), v._1))._1
        assert(pos.map(_._4).toSeq === Seq(want), s"anchor ${anchor._1} hardest positive")
      }
      val wantNegs = others.filter(_._3 != anchor._3)
        .sortBy(v => (-cos(anchor._2, v._2), v._1)).take(2).map(_._1)
      val negs = rows.filter(r => r._1 == anchor._1 && r._2 == "neg")
        .sortBy(_._3).map(_._4).toSeq
      assert(negs === wantNegs, s"anchor ${anchor._1} hardest negatives")
      // mined cosines are the true cosines (rounded at 9)
      rows.filter(_._1 == anchor._1).foreach { r =>
        val expect = BigDecimal(cos(anchor._2, byId(r._4)._2))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r._5 - expect) < 1e-9)
      }
    }
  }

  test("kNeg caps negatives; ranks are dense from 1") {
    val rows = mined(kNeg = 3)
    vecs.foreach { v =>
      val negRanks = rows.filter(r => r._1 == v._1 && r._2 == "neg").map(_._3).sorted
      assert(negRanks.nonEmpty && negRanks.head == 1)
      assert(negRanks === (1 to negRanks.size))
      assert(negRanks.size <= 3)
    }
  }
}
