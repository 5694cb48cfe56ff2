package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[StopwordHits]] exact-equivalence gate (r21): the native one-pass
  * counter must agree — value, type, null shape — with both composed
  * forms it replaced (`size(filter(toks, array_contains(lit(...), t)))`
  * and the `isInCollection` variant) for every language in the table.
  */
class StopwordHitsSpec extends SparkSpec {

  private val cases = Seq(
    Seq("the", "cat", "sat", "on", "the", "mat"), // repeats count
    Seq.empty[String],
    Seq("la", "de", "el"), // es words under lang=en
    Seq("THE", "The"), // case-sensitive (tokens are lowered upstream)
    Seq("xyzzy"),
    TextFunctions.stopwords("en"), // all hits
    Seq("der", "die", "und", "the", "a")
  )

  test("native ≡ both composed forms, all languages") {
    VectorExpressions.register(spark)
    val df = spark.createDataFrame(cases.map(Tuple1(_))).toDF("toks")
    TextFunctions.langOrder.foreach { lang =>
      val words = TextFunctions.stopwords(lang)
      val both = df.select(
        call_function(StopwordHits.fnName, col("toks"), lit(lang)).as("native"),
        size(filter(col("toks"),
          t => array_contains(lit(words.toArray), t))).as("old_ac"),
        size(filter(col("toks"), t => t.isInCollection(words))).as("old_in"))
      both.collect().zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(0) === r.getInt(1), s"$lang row $i vs array_contains")
        assert(r.getInt(0) === r.getInt(2), s"$lang row $i vs isInCollection")
      }
      assert(both.schema("native").dataType === both.schema("old_ac").dataType)
    }
  }

  test("null array is null; null elements are misses") {
    VectorExpressions.register(spark)
    val df = spark.createDataFrame(
      Seq(Tuple1(null.asInstanceOf[Seq[String]]))).toDF("toks")
    val r = df.select(
      call_function(StopwordHits.fnName, col("toks"), lit("en")).as("n"),
      size(filter(col("toks"),
        t => array_contains(lit(TextFunctions.stopwords("en").toArray), t))).as("o"))
      .collect()(0)
    assert(r.isNullAt(0) === r.isNullAt(1))
    val withNulls = spark.sql(
      "SELECT stopword_hits(array('the', CAST(NULL AS STRING), 'of'), 'en') AS n," +
        " size(filter(array('the', CAST(NULL AS STRING), 'of')," +
        " t -> array_contains(array('the','a','of','and','to','in','is','it','for','on'), t))) AS o")
      .collect()(0)
    assert(withNulls.getInt(0) === 2)
    assert(withNulls.getInt(0) === withNulls.getInt(1))
  }
}
