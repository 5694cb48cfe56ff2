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

  test("IVF-PQ index written partitioned by cluster gives partition-pruned probe scans") {
    // the production claim behind ivfPqIndex's scaladoc: store the
    // (neighbor_id, cluster, codes) table partitioned by cluster and a
    // query's nprobe list probes become partition-pruned scans — the
    // scan touches nprobe/nlist of the FILES, not just of the rows
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def firstVecs(n: Int): Array[Array[Double]] =
      emb.filter(col("vec_id") < n).orderBy(col("vec_id"))
        .select(graft.operators.Similarity.asDoubleVec(col("embedding")))
        .collect().map(_.getSeq[Double](0).toArray)
    val coarse = firstVecs(8)
    val codebooks = {
      val sample = firstVecs(16)
      val subDim = sample(0).length / 4
      Array.tabulate(4)(m => sample.map(_.slice(m * subDim, (m + 1) * subDim)))
    }
    val dir = tmpDir("ivfpq-index") + "/index.parquet"
    graft.operators.Similarity.ivfPqIndex(emb, "vec_id", "embedding", coarse, codebooks)
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    assert(idx.inputFiles.length >= 8, "expected one file set per cluster")
    val probed = idx.filter(col("cluster").isin(2, 5)) // nprobe=2 of nlist=8
    probed.collect()
    // pruning is physical: the executed scan's numFiles metric counts
    // the files actually selected after partition pruning
    // (Dataset.inputFiles is pre-pruning and would always show all 8)
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      // unwrap AQE: metrics live on the ADAPTIVE final plan's leaves
      def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            leaves(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => leaves(s.plan)
          case l if l.children.isEmpty => Seq(l)
          case n => n.children.flatMap(leaves) ++
            n.subqueries.flatMap(leaves)
        }
      leaves(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    val probedFiles = scanFiles(probed)
    assert(probedFiles > 0 && probedFiles < idx.inputFiles.length,
      s"probe scanned $probedFiles of ${idx.inputFiles.length} files — partition pruning lost")
    // and the pruned scan still returns exactly the probed lists
    assert(probed.select(countDistinct(col("cluster"))).collect()(0).getLong(0) <= 2L)

    // the REAL probe path prunes too (r12): ivfPqProbe collects the
    // bounded probe-cluster set and filters the scan explicitly —
    // without that, its equi-join on cluster emits no partition filter
    // and a published-index probe would scan all nlist file sets
    val queries = emb.filter(col("vec_id") < 2)
    val probe = graft.operators.Similarity.ivfPqProbe(
      queries, idx, "vec_id", "embedding", k = 5, coarse, codebooks, nprobe = 2)
    probe.collect()
    val realProbeFiles = scanFiles(probe)
    assert(realProbeFiles > 0 && realProbeFiles < idx.inputFiles.length,
      s"ivfPqProbe scanned $realProbeFiles of ${idx.inputFiles.length} files — " +
        "the probe path lost partition pruning")
  }
}
