package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Tokens]] exact-equivalence gate (r21): the native single-pass
  * tokenizer must agree with the composed
  * `filter(split(lower(text), "[^a-z0-9]+"), t -> t <> '')` form —
  * including type/nullability — on ASCII, Unicode (slow path), empty,
  * null, and separator-edge inputs, because 61 operator call sites and
  * every oracle's `$tokensSql` assume that exact semantics.
  */
class TokensSpec extends SparkSpec {

  private def composed(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= lit(""))

  private val cases = Seq(
    "Hello, World! 42",
    "",
    " ",
    "---",
    "a",
    "7",
    "UPPER lower MiXeD 0zero9",
    "leading space",
    "trailing space ",
    "tab\tnewline\nsep",
    "digits123mix456",
    "éclair naïve ÉCLAIR", // slow path: accents lower then separate
    "İstanbul I ı", // dotted capital I expands on lowering
    "日本語 text 漢字42", // CJK: separators around ASCII runs
    "a\u0000b", // NUL is a separator byte
    "ÿ" * 3 + "x" // 0xFF-heavy multi-byte input
  )

  test("native ≡ composed on ASCII, Unicode, empty and edge inputs") {
    val df = spark.createDataFrame(
      cases.map(Tuple1(_)) ++ Seq(Tuple1(null.asInstanceOf[String])))
      .toDF("text")
    val both = df.select(
      TextFunctions.tokens(col("text")).as("native"),
      composed(col("text")).as("old"))
    val rows = both.collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch at row $i")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"row $i")
    }
    // the column TYPE (incl. containsNull) is unchanged — downstream
    // unions/schemas must not notice the swap
    assert(both.schema("native").dataType === both.schema("old").dataType)
  }

  test("interpreted eval matches codegen'd eval") {
    // a filter above a generator blocks whole-stage codegen for the
    // projection, exercising the interpreted path; compare against the
    // plain projection (codegen'd)
    val df = spark.createDataFrame(cases.map(Tuple1(_))).toDF("text")
    val gen = df.select(TextFunctions.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    cases.zip(gen).foreach { case (s, got) =>
      val expected = graft.functions.Tokens
        .tokenize(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got === expected.toArray[AnyRef](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq, s"input '$s'")
    }
  }
}
