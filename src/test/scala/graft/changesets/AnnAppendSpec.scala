package graft.changesets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{AnnModel, Similarity}

/** No-retrain ANN index maintenance (Pipeline.appendAnn). The binding
  * property is append ≡ rebuild: growing a published pair by a batch
  * encoded with the FROZEN model must produce exactly the index (and
  * therefore exactly the probe results) that indexing everything from
  * scratch with the same model produces. Plus the versioning contract:
  * each append is its own immutable pair, so the pointer flip back is
  * a true rollback, and the model artifact rides along unchanged.
  */
class AnnAppendSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vec(id: Long): Array[Double] =
    Array.tabulate(dims)(d => math.sin(id * 31 + d * 7) * 10)
  private def emb(ids: Range) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private val coarse = Array.tabulate(4)(c => vec(1000 + c))
  private val codebooks = Array.tabulate(2)(m =>
    Array.tabulate(4)(c => vec(2000 + m * 10 + c).slice(m * 4, m * 4 + 4)))

  private def indexRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("neighbor_id").cast("long"), col("cluster").cast("int"), col("codes"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq)).toSet

  test("append == rebuild: index contents and probe results match from-scratch") {
    val dir = tmpDir("ann-append")
    val day1 = Similarity.ivfPqIndex(emb(0 until 40), "vec_id", "embedding", coarse, codebooks)
    Pipeline.publishAnn(spark, dir, "day1", day1, coarse, codebooks)
    Pipeline.appendAnn(spark, dir, "day2", emb(40 until 70), "vec_id", "embedding")

    val cur = Pipeline.readCurrentAnn(dir).get
    assert(cur.endsWith("ann-day2"), "pointer must advance to the appended pair")
    val grown = spark.read.parquet(s"$cur/index.parquet")
    val scratch = Similarity.ivfPqIndex(emb(0 until 70), "vec_id", "embedding", coarse, codebooks)
    assert(indexRows(grown) === indexRows(scratch))

    // probes agree too, and see day-2 vectors
    val model = AnnModel.load(spark, s"$cur/model")
    def probe(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqProbe(emb(0 until 3), ix, "vec_id", "embedding",
          k = 5, coarse = model.coarse, codebooks = model.codebooks, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val viaAppend = probe(grown)
    assert(viaAppend === probe(scratch))
    assert(grown.filter(col("neighbor_id") >= 40).count() === 30)
  }

  test("append is an immutable new pair: pointer flip back is a true rollback") {
    val dir = tmpDir("ann-rollback")
    val day1 = Similarity.ivfPqIndex(emb(0 until 40), "vec_id", "embedding", coarse, codebooks)
    Pipeline.publishAnn(spark, dir, "day1", day1, coarse, codebooks)
    val day1Rows = indexRows(
      spark.read.parquet(s"${Pipeline.readCurrentAnn(dir).get}/index.parquet"))
    Pipeline.appendAnn(spark, dir, "day2", emb(40 until 70), "vec_id", "embedding")
    // the day-1 pair is untouched by the append
    assert(indexRows(spark.read.parquet(s"$dir/ann-day1/index.parquet")) === day1Rows)
    // flip back: the reader protocol sees exactly the day-1 index again
    Pipeline.flipAnnPointer(dir, "ann-day1", "day1")
    assert(indexRows(
      spark.read.parquet(s"${Pipeline.readCurrentAnn(dir).get}/index.parquet")) === day1Rows)
  }

  test("appendAnn refuses a version that resolves to the live pair (self-overwrite)") {
    val dir = tmpDir("ann-selfoverwrite")
    val day1 = Similarity.ivfPqIndex(emb(0 until 20), "vec_id", "embedding", coarse, codebooks)
    Pipeline.publishAnn(spark, dir, "day1", day1, coarse, codebooks)
    val e = intercept[IllegalArgumentException] {
      Pipeline.appendAnn(spark, dir, "day1", emb(20 until 30), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("overwrite the index it is reading"))
    // live pair untouched by the refused append
    assert(spark.read.parquet(s"$dir/ann-day1/index.parquet").count() === 20)
  }

  test("appendAnn refuses a batch whose ids already exist (disjoint-batch contract)") {
    val dir = tmpDir("ann-dupbatch")
    val day1 = Similarity.ivfPqIndex(emb(0 until 20), "vec_id", "embedding", coarse, codebooks)
    Pipeline.publishAnn(spark, dir, "day1", day1, coarse, codebooks)
    Pipeline.appendAnn(spark, dir, "day2", emb(20 until 30), "vec_id", "embedding")
    // replaying day2's batch under a NEW version would duplicate ids
    val e = intercept[IllegalArgumentException] {
      Pipeline.appendAnn(spark, dir, "day2-retry", emb(20 until 30), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("batches must be disjoint"))
    // pointer still on the last good pair
    assert(Pipeline.readCurrentAnn(dir).get.endsWith("ann-day2"))
  }

  test("appendAnn before the first publish fails loudly") {
    val dir = tmpDir("ann-nopair")
    val e = intercept[IllegalStateException] {
      Pipeline.appendAnn(spark, dir, "day1", emb(0 until 5), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("publishAnn must run first"))
  }
}
