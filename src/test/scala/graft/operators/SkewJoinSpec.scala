package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin matches the plain join result exactly") {
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "left_val") // key 1 is hot: 900 of 1000 rows
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"))
      .toDF("k", "right_val")

    val plain = left.join(right, "k")
      .select($"k", $"left_val", $"right_val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salts = 8,
        saltBy = Seq("k", "left_val"))
      .select($"k", $"left_val", $"right_val").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted

    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salt spreads the hot key across sub-keys deterministically") {
    val left = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "left_val")
    val salts = left.withColumn("__salt", pmod(hash($"k", $"left_val"), lit(8)))
      .select($"__salt").distinct().count()
    assert(salts > 4, s"hot key concentrated in $salts salt buckets")
    // determinism: same expression, same routing
    val a = left.withColumn("s", pmod(hash($"k", $"left_val"), lit(8))).collect()
    val b = left.withColumn("s", pmod(hash($"k", $"left_val"), lit(8))).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }
}
