package graft.sources

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ts", TimestampType)))

  private def sample = Seq(
    (1L, "alice", 0.5, new java.sql.Timestamp(1700000000123L)),
    (2L, "bob, with comma", 1.25, new java.sql.Timestamp(1700000060456L)),
    (3L, null.asInstanceOf[String], 2.0, null.asInstanceOf[java.sql.Timestamp]))
    .toDF("id", "name", "score", "ts")

  test("csv round trip preserves values incl. quoting, nulls, timestamps") {
    val dir = tmpDir("fmt-csv")
    Formats.writeCsv(sample, dir)
    val back = Formats.readCsv(spark, dir, schema).orderBy($"id")
    assert(back.schema === schema)
    val rows = back.collect()
    assert(rows.length === 3)
    assert(rows(1).getString(1) === "bob, with comma")
    assert(rows(0).getTimestamp(3).getTime === 1700000000123L)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
  }

  test("json-lines round trip preserves values") {
    val dir = tmpDir("fmt-json")
    Formats.writeJsonLines(sample, dir)
    val back = Formats.readJsonLines(spark, dir, schema).orderBy($"id")
    val rows = back.collect()
    assert(rows.length === 3)
    assert(rows(0).getDouble(2) === 0.5)
    assert(rows(0).getTimestamp(3).getTime === 1700000000123L)
  }

  test("orc round trip preserves values incl. nulls and timestamps") {
    val dir = tmpDir("fmt-orc")
    Formats.writeOrc(sample, dir)
    val back = Formats.readOrc(spark, dir, schema).orderBy($"id")
    assert(back.schema === schema)
    val rows = back.collect()
    assert(rows.length === 3)
    assert(rows(0).getTimestamp(3).getTime === 1700000000123L)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
  }

  test("FAILFAST surfaces malformed rows; permissive captures them") {
    val dir = tmpDir("fmt-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.json"),
      """{"id": 1, "name": "ok", "score": 0.5, "ts": null}
        |{"id": "not-a-number", "name": 3zz}""".stripMargin)
    intercept[SparkException] {
      Formats.readJsonLines(spark, dir, schema).collect()
    }
    val perm = Formats.readJsonLines(spark, dir, schema, permissive = true)
    val bad = perm.filter(col(Formats.CorruptCol).isNotNull).collect()
    assert(bad.length === 1)
    assert(perm.count() === 2)
  }
}
