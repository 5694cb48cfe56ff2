package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Raw sketch values are implementation-defined, so Analytics
  * .approxStats is bounded against exact answers here; the registered
  * q37 wraps the same sketches in oracle-gated accuracy booleans.
  */
class ApproxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Analytics.approxStats(spark, sf)
      .select(col("o_orderpriority"), col("approx_customers")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"group $k: approx $a vs exact $e")
    }
  }

  test("approx median between group min and max, near exact median") {
    val rows = Analytics.approxStats(spark, sf).collect()
    val exact = graft.Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val k = r.getAs[String]("o_orderpriority")
      val am = r.getAs[Double]("approx_median_price")
      assert(math.abs(am - exact(k)) / exact(k) <= 0.05, s"group $k median drift")
    }
  }
}
