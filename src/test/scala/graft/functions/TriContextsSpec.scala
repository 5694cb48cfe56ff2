package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r22 `explode_tri_contexts` Generator to the composed
  * `explode(transform(sequence(3, size(toks)), i -> struct(...)))`
  * formulation it replaced in NgramLm.scoredPositions — same rows,
  * same ascending-position order, same null passthrough.
  */
class TriContextsSpec extends SparkSpec {

  private def viaGenerator(toks: Seq[String]): Seq[(String, String, String)] = {
    import spark.implicits._
    VectorExpressions.register(spark)
    Seq(Tuple1(toks)).toDF("toks")
      .select(call_function("explode_tri_contexts", col("toks")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
  }

  private def viaBuiltins(toks: Seq[String]): Seq[(String, String, String)] = {
    import spark.implicits._
    Seq(Tuple1(toks)).toDF("toks")
      .filter(size(col("toks")) >= 3)
      .select(explode(transform(sequence(lit(3), size(col("toks"))),
        i => struct(
          element_at(col("toks"), (i - 2).cast("int")).as("w1"),
          element_at(col("toks"), (i - 1).cast("int")).as("w2"),
          element_at(col("toks"), i.cast("int")).as("w")))).as("p"))
      .select(col("p.w1"), col("p.w2"), col("p.w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
  }

  test("explode_tri_contexts matches the explode(transform(...)) formulation") {
    for (toks <- Seq(
        Seq("a", "b", "c", "d", "e"),
        Seq("a", "b", "c"),
        Seq("a", "b"), // shorter than 3: both emit nothing
        Seq("x"),
        Seq.empty[String],
        Seq("dup", "dup", "dup", "dup"),
        Seq("a", null, "c", "d")))
      assert(viaGenerator(toks) === viaBuiltins(toks), s"toks=$toks")
  }

  test("explode_tri_contexts works from pure SQL via the session extension") {
    val got = spark.sql(
        "SELECT explode_tri_contexts(array('a','b','c','d')) FROM (SELECT 1)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq(("a", "b", "c"), ("b", "c", "d")))
  }

  test("explode_tri_contexts rejects non-string arrays at analysis") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("nums")
    val e = intercept[Exception] {
      df.select(call_function("explode_tri_contexts", col("nums"))).collect()
    }
    assert(e.getMessage.contains("explode_tri_contexts") ||
      e.getMessage.contains("DATATYPE"))
  }
}
