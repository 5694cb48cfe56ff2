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

  // ------------------------------------------------ native merge exec

  test("native exec plans AsOfJoinExec — no union, no window, exactly |L| rows") {
    import spark.implicits._
    val left = Seq(("k1", 5L), ("k2", 1L)).toDF("key", "t")
    val right = Seq(("k1", 1L, 10.0), ("k1", 4L, 20.0)).toDF("key", "rt", "price")
    val df = AsOfJoin.native(left, right, "key", "t", "rt", Seq("price"), "rt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec not planned:\n$p")
    assert(!p.contains("Window"), "native plan still contains a Window")
    assert(!p.contains("Union"), "native plan still contains a Union")
    val rows = df.orderBy("key").collect()
    assert(rows.toSeq == Seq(Row("k1", 5L, 20.0), Row("k2", 1L, null)))
  }

  test("native matches the compositional form on randomized data (nulls included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c", "d", null)
    val left = (1 to 300).map { i =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(50).toLong, i.toLong)
    }.toDF("key", "t", "lid")
    val right = (1 to 200).map { i =>
      (keys(rnd.nextInt(keys.length)), rnd.nextInt(50).toLong, i.toLong,
        if (rnd.nextBoolean()) Some(rnd.nextInt(1000).toDouble) else None,
        s"tag${rnd.nextInt(5)}")
    }.toDF("key", "rt", "rid", "price", "tag")
    val viaUnion = AsOfJoin(left, right, "key", "t", "rt", Seq("price", "tag"), "rid")
      .orderBy("lid").collect()
    val viaNative = AsOfJoin.native(left, right, "key", "t", "rt", Seq("price", "tag"), "rid")
      .orderBy("lid").collect()
    assert(viaNative.length == 300 && viaUnion.length == 300)
    viaUnion.zip(viaNative).foreach { case (u, n) =>
      assert(u == n, s"union form $u != native form $n")
    }
  }
}
