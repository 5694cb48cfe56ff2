package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NGramGeneratorSpec extends SparkSpec {

  private def viaGenerator(toks: Seq[String], n: Int): Seq[String] = {
    import spark.implicits._
    VectorExpressions.register(spark)
    Seq(Tuple1(toks)).toDF("toks")
      .select(call_function("explode_ngrams", col("toks"), lit(n)).as("g"))
      .collect().map(_.getString(0)).toSeq
  }

  private def viaBuiltins(toks: Seq[String], n: Int): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(toks)).toDF("toks")
      .filter(size(col("toks")) >= n)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
      .collect().map(_.getString(0)).toSeq
  }

  test("explode_ngrams matches the explode(transform(...)) formulation") {
    for {
      toks <- Seq(
        Seq("a", "b", "c", "d"),
        Seq("x"),
        Seq.empty[String],
        Seq("dup", "dup", "dup"),
        Seq("a", null, "c"))
      n <- Seq(1, 2, 3, 5)
    } {
      assert(viaGenerator(toks, n) === viaBuiltins(toks, n),
        s"toks=$toks n=$n")
    }
  }

  test("explode_ngrams works from pure SQL via the session extension") {
    spark.sql("SELECT explode_ngrams(array('a','b','c'), 2) AS g")
      .collect().map(_.getString(0)).toSeq match {
      case got => assert(got === Seq("a b", "b c"))
    }
  }

  test("explode_ngrams rejects bad argument shapes at analysis") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq(Tuple1(Seq(1, 2, 3))).toDF("nums")
    val e = intercept[Exception] {
      df.select(call_function("explode_ngrams", col("nums"), lit(2))).collect()
    }
    assert(e.getMessage.contains("explode_ngrams") || e.getMessage.contains("DATATYPE"))
  }
}
