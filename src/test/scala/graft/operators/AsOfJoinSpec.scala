package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics for AsOfJoin (q18 pins the aggregate result; these
  * pin the row-level contract, especially atomic right-row attach).
  */
class AsOfJoinSpec extends SparkSpec {

  test("attaches the latest right row ATOMICALLY when a value column is null") {
    import spark.implicits._
    // right rows per key k1: t=1 (price=10, note=old), t=2 (price=20, note=NULL)
    // a per-column fill would resurrect note=old next to price=20
    val left = Seq((("k1"), 5L)).toDF("key", "t")
    val right = Seq(
      ("k1", 1L, Some(10.0), Some("old")),
      ("k1", 2L, Some(20.0), None: Option[String]))
      .toDF("key", "rt", "price", "note")
    val out = AsOfJoin(left, right, "key", "t", "rt",
      Seq("price", "note"), rightTiebreak = "rt").collect()
    assert(out.toSeq == Seq(Row("k1", 5L, 20.0, null)))
  }

  test("left row earlier than every right row gets an all-null attach") {
    import spark.implicits._
    val left = Seq(("k1", 0L)).toDF("key", "t")
    val right = Seq(("k1", 1L, 10.0)).toDF("key", "rt", "price")
    val out = AsOfJoin(left, right, "key", "t", "rt", Seq("price"), "rt").collect()
    assert(out.toSeq == Seq(Row("k1", 0L, null)))
  }

  test("tie at t: right row at the same instant is visible; max tiebreak wins") {
    import spark.implicits._
    val left = Seq(("k1", 2L)).toDF("key", "t")
    val right = Seq(
      ("k1", 2L, 1L, "first"), ("k1", 2L, 2L, "second"))
      .toDF("key", "rt", "seq", "v")
    val out = AsOfJoin(left, right, "key", "t", "rt", Seq("v"), "seq").collect()
    assert(out.toSeq == Seq(Row("k1", 2L, "second")))
  }

  test("keys partition independently") {
    import spark.implicits._
    val left = Seq(("a", 10L), ("b", 10L)).toDF("key", "t")
    val right = Seq(("a", 1L, "va"), ("b", 2L, "vb")).toDF("key", "rt", "v")
    val out = AsOfJoin(left, right, "key", "t", "rt", Seq("v"), "rt")
      .orderBy("key").collect()
    assert(out.toSeq == Seq(Row("a", 10L, "va"), Row("b", 10L, "vb")))
  }
}
