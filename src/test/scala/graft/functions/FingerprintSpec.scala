package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r22 contentFingerprint rewrite: sort_array over the
  * distinct token set is value-identical to the r21 array_sort form
  * (tokens() arrays are containsNull=false, so the two builtins can
  * only differ on null placement — which never occurs), while
  * sort_array stays whole-stage codegen (no comparator lambda).
  */
class FingerprintSpec extends SparkSpec {

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the the the dup dup",
    "",
    "   ",
    "punctuation, splits; tokens! 42 a1b2",
    "Ünïcode Tokens MIXED case ünïcode",
    "z y x w v u t s r q p o n m l k j i h g f e d c b a",
    "a"
  )

  test("contentFingerprint(sort_array) == md5 over array_sort'd distinct tokens") {
    import spark.implicits._
    val df = texts.toDF("text")
    val got = df.select(
        TextFunctions.contentFingerprint(col("text")).as("fp"),
        md5(concat_ws(" ",
          array_sort(array_distinct(TextFunctions.tokens(col("text")))))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("sort_array == array_sort on distinct containsNull=false string arrays") {
    import spark.implicits._
    val df = texts.toDF("text")
      .select(array_distinct(TextFunctions.tokens(col("text"))).as("toks"))
    val diff = df.filter(
      not(sort_array(col("toks")) <=> array_sort(col("toks")))).count()
    assert(diff === 0L)
  }
}
