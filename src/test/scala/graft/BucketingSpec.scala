package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle lever for repeated co-located joins at
  * scale — both fact tables written bucketed by the join key join with
  * NO Exchange (the shuffle happened once at write time, amortized over
  * every subsequent join). Pinned here so the capability (and Spark's
  * bucket-join planning) stays exercised.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle") {
    val s = spark.newSession() // warehouse dir set statically in SparkSpec
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")

    val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    val joined = s.table("li_b").join(s.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")

    // same join on the raw (unbucketed) parquet MUST shuffle — proves
    // the assertion above is meaningful
    val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    unbucketed.collect()
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
