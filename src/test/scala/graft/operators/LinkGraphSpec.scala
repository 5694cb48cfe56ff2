package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer PageRank (LinkGraph.pageRankInt — oracle-gated end-to-end
  * by q135). The binding properties, pinned against a hand-computed
  * 3-node graph (edges 0→1, 0→2, 1→2; rank₀ = 10⁶, damping 0.85 ppm,
  * every division truncating BIGINT):
  *
  *   iter1: c(1) = 10⁶ DIV 2 = 500000, c(2) = 500000 + 10⁶ = 1500000
  *          r = [150000, 575000, 1425000]
  *   iter2: c(1) = 150000 DIV 2 = 75000, c(2) = 75000 + 575000 = 650000
  *          r = [150000, 213750, 702500]
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(ids: Long*) = ids.toDF("id")
  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  private def ranks(n: org.apache.spark.sql.DataFrame,
                    e: org.apache.spark.sql.DataFrame, iters: Int): Map[Long, Long] =
    LinkGraph.pageRankInt(n, "id", e, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two iterations match the hand computation exactly") {
    val r = ranks(nodes(0, 1, 2), edges(0L -> 1L, 0L -> 2L, 1L -> 2L), iters = 2)
    assert(r === Map(0L -> 150000L, 1L -> 213750L, 2L -> 702500L))
  }

  test("zero iterations return the uniform initial mass") {
    val r = ranks(nodes(0, 1, 2), edges(0L -> 1L), iters = 0)
    assert(r === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("duplicate edges collapse to one vote; isolated nodes keep the teleport rank") {
    // duplicating 0→1 must not change out-degree or contributions
    val dup = ranks(nodes(0, 1, 2),
      edges(0L -> 1L, 0L -> 1L, 0L -> 2L, 1L -> 2L), iters = 2)
    assert(dup === Map(0L -> 150000L, 1L -> 213750L, 2L -> 702500L))
    // node 3 is in the node list but no edge touches it: after any
    // iteration it holds exactly the per-node teleport term
    val iso = ranks(nodes(0, 1, 2, 3), edges(0L -> 1L, 0L -> 2L, 1L -> 2L), iters = 2)
    assert(iso(3L) === 150000L)
    assert(iso(0L) === 150000L) // no in-links either — same teleport floor
  }

  test("weighted rank matches the hand computation; duplicate edges sum into the weight") {
    // nodes {0,1,2}; weighted edges 0→1 w=3, 0→2 w=1, 1→2 w=5.
    // W₀ = 4, W₁ = 5.
    // iter1: c(1) = 10⁶·3 DIV 4 = 750000, c(2) = 10⁶·1 DIV 4 + 10⁶·5 DIV 5
    //        = 250000 + 10⁶ = 1250000
    //        r = [150000, 787500, 1212500]
    //   (787500 = 150000 + 850000·750000 DIV 10⁶;
    //    1212500 = 150000 + 850000·1250000 DIV 10⁶)
    val n = nodes(0, 1, 2)
    val e = Seq((0L, 1L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 5L))
      .toDF("src", "dst", "w") // 0→1 appears twice: 2 + 1 = w 3
    val r = LinkGraph.pageRankWeightedInt(n, "id", e, "src", "dst", "w", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 150000L, 1L -> 787500L, 2L -> 1212500L))
    // uniform weights degenerate to the unweighted recurrence
    val uw = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L)).toDF("src", "dst", "w")
    val rw = LinkGraph.pageRankWeightedInt(n, "id", uw, "src", "dst", "w", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rw === Map(0L -> 150000L, 1L -> 213750L, 2L -> 702500L))
  }

  // ---------------------------------------------------------- HITS
  // Hand computation on the same 3-node graph (0→1, 0→2, 1→2),
  // hub₀ = auth₀ = 10⁶, max-normalized truncating-integer steps:
  //   iter1: auth' = [-, 10⁶, 2·10⁶] max 2·10⁶ → auth = [0, 500000, 10⁶]
  //          hub'  = [1.5·10⁶, 10⁶, -] max 1.5·10⁶ → hub = [10⁶, 666666, 0]
  //   iter2: auth' = [-, 10⁶, 1666666] → auth = [0, 600000, 10⁶]
  //          hub'  = [1600000, 10⁶, -] → hub = [10⁶, 625000, 0]
  test("HITS matches the hand computation exactly") {
    val r = LinkGraph.hitsInt(nodes(0, 1, 2),
        "id", edges(0L -> 1L, 0L -> 2L, 1L -> 2L), "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(
      0L -> ((1000000L, 0L)),      // the pure hub
      1L -> ((625000L, 600000L)),  // both roles
      2L -> ((0L, 1000000L))))     // the pure authority
  }

  test("HITS: duplicate edges vote once; isolated nodes sit at zero") {
    val base = LinkGraph.hitsInt(nodes(0, 1, 2), "id",
        edges(0L -> 1L, 0L -> 2L, 1L -> 2L), "src", "dst", iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val dup = LinkGraph.hitsInt(nodes(0, 1, 2), "id",
        edges(0L -> 1L, 0L -> 1L, 0L -> 2L, 1L -> 2L), "src", "dst", iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(dup === base)
    val iso = LinkGraph.hitsInt(nodes(0, 1, 2, 9), "id",
        edges(0L -> 1L, 0L -> 2L, 1L -> 2L), "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(iso(9L) === ((0L, 0L))) // no links either way: no mass, ever
  }

  // ------------------------------------------------- redirect chains
  private def resolved(es: (String, String)*): Map[String, (String, Long, Boolean)] =
    LinkGraph.resolveRedirects(es.toDF("src", "dst"), "src", "dst", maxHops = 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("redirect chains collapse to the final target with exact hop counts") {
    val r = resolved("a" -> "b", "b" -> "c", "c" -> "d", "g" -> "h")
    assert(r === Map(
      "a" -> (("d", 3L, true)),
      "b" -> (("d", 2L, true)),
      "c" -> (("d", 1L, true)),
      "g" -> (("h", 1L, true))))
  }

  test("redirect cycles and over-long chains report unresolved at the hop cap") {
    // 2-cycle: after ⌈log₂ 4⌉ = 2 doubling rounds each member has
    // walked exactly maxHops = 4 steps and landed back on itself.
    val cyc = resolved("e" -> "f", "f" -> "e")
    assert(cyc("e") === (("e", 4L, false)))
    assert(cyc("f") === (("f", 4L, false)))
    // 6-hop chain: the 4-step walk from p1 reaches p5 (still a
    // redirect source) — unresolved, exactly a fetcher's redirect cap
    val long = resolved("p1" -> "p2", "p2" -> "p3", "p3" -> "p4",
      "p4" -> "p5", "p5" -> "p6", "p6" -> "p7")
    assert(long("p1") === (("p5", 4L, false)))
    assert(long("p3") === (("p7", 4L, true))) // 4 hops exactly: in budget
    assert(long("p4") === (("p7", 3L, true)))
  }

  // ---------------------------------------------------- crawl depth
  test("crawl depth is the min-hop BFS distance; unreached is -1") {
    val n = nodes(0, 1, 2, 3, 4, 5)
    // two paths to 4: 0→1→4 (depth 2) must beat 0→1→2→3→4
    val e = edges(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 2L -> 0L)
    val d = LinkGraph.crawlDepth(n, "id", e, "src", "dst",
        nodes(0), "id", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> -1L))
    // a back-edge to the seed (2→0) must not displace its depth 0
    val d0 = LinkGraph.crawlDepth(n, "id", e, "src", "dst",
        nodes(0), "id", maxDepth = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d0 === Map(0L -> 0L, 1L -> -1L, 2L -> -1L, 3L -> -1L, 4L -> -1L, 5L -> -1L))
  }

  // -------------------------------------------------- co-citation
  test("coCitation counts distinct co-linking sources; high-degree sources drop at the cap") {
    val e = edges(10L -> 1L, 10L -> 2L,
      11L -> 1L, 11L -> 2L,
      12L -> 1L, 12L -> 2L, 12L -> 3L,
      12L -> 3L) // duplicate edge collapses before pairing
    def run(cap: Int) = LinkGraph.coCitation(e, "src", "dst", maxSrcDegree = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(64) === Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // cap 2 drops source 12 (degree 3) entirely — the stopword rule
    assert(run(2) === Map((1L, 2L) -> 2L))
    intercept[IllegalArgumentException] {
      LinkGraph.coCitation(e, "src", "dst", maxSrcDegree = 1)
    }
  }

  test("bibliographicCoupling counts shared outlink targets; popular targets drop at the cap") {
    val e = edges(1L -> 10L, 1L -> 11L, 2L -> 10L, 2L -> 11L, 3L -> 10L)
    def run(cap: Int) = LinkGraph.bibliographicCoupling(e, "src", "dst", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(64) === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // cap 2 drops target 10 (in-degree 3): only target 11 couples
    assert(run(2) === Map((1L, 2L) -> 1L))
  }

  // ------------------------------------------------- degree stats
  test("degreeStats: out/in degree, reciprocal count, ppm; self-loops dropped") {
    // 0→1 and 1→0 reciprocate; 0→2 does not; 2→2 self-loop drops
    val r = LinkGraph.degreeStats(nodes(0, 1, 2, 3), "id",
        edges(0L -> 1L, 1L -> 0L, 0L -> 2L, 2L -> 2L), "src", "dst")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r === Map(
      0L -> (2L, 1L, 1L, 500000L),   // 1 of 2 out-links reciprocated
      1L -> (1L, 1L, 1L, 1000000L),
      2L -> (0L, 1L, 0L, 0L),        // self-loop gone; 2→2 not counted anywhere
      3L -> (0L, 0L, 0L, 0L)))       // isolated: zeros, ppm 0 not a crash
  }

  // ------------------------------------------- personalized PageRank
  // Hand computation on 0→1, 0→2, 1→2, seeds {0}, damping 0.85:
  //   r0 = [10⁶, 0, 0]
  //   iter1: c(1) = 10⁶ DIV 2 = 500000, c(2) = 500000 + 0 = 500000
  //          r = [150000, 425000, 425000]
  //   iter2: c(1) = 150000 DIV 2 = 75000, c(2) = 75000 + 425000 = 500000
  //          r = [150000, 63750, 425000]
  test("TrustRank matches the hand computation; unreachable pages are exact zero") {
    val r = LinkGraph.personalizedPageRankInt(nodes(0, 1, 2, 3), "id",
        edges(0L -> 1L, 0L -> 2L, 1L -> 2L), "src", "dst",
        nodes(0), "id", iters = 2)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getBoolean(2)))).toMap
    assert(r === Map(
      0L -> (150000L, true), 1L -> (63750L, false),
      2L -> (425000L, false), 3L -> (0L, false)))
  }

  test("TrustRank: an isolated seed holds the teleport floor; no seeds means all-zero") {
    val iso = LinkGraph.personalizedPageRankInt(nodes(0, 1), "id",
        edges(1L -> 1L), "src", "dst", nodes(0), "id", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(iso === Map(0L -> 150000L, 1L -> 0L))
    val none = LinkGraph.personalizedPageRankInt(nodes(0, 1), "id",
        edges(0L -> 1L), "src", "dst", Seq.empty[Long].toDF("id"), "id", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(none === Map(0L -> 0L, 1L -> 0L))
  }

  // ---------------------------------------------- label propagation
  // Two triangles {0,1,2} and {3,4,5} joined by one bridge 2–3. Hand
  // rounds (most-frequent previous neighbor label, ties to smallest):
  //   l0 = [0,1,2,3,4,5]
  //   r1 = [1,0,0,2,3,3]   (all counts 1 → min neighbor label)
  //   r2 = [0,0,0,3,2,2]   (0 sees {0,0}; 3 sees {0,3,3} → 3)
  //   r3 = [0,0,0,2,2,2]   → the two triangles, bridge NOT merged
  test("label propagation splits a bridged pair of triangles that components would fuse") {
    val e = edges(0L -> 1L, 1L -> 2L, 2L -> 0L,
      3L -> 4L, 4L -> 5L, 5L -> 3L, 2L -> 3L)
    val r = LinkGraph.labelPropagationInt(nodes(0, 1, 2, 3, 4, 5), "id",
        e, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
    // intermediate rounds match the hand table (synchronous semantics:
    // every node reads PREVIOUS labels, not a mixed frontier)
    val r1 = LinkGraph.labelPropagationInt(nodes(0, 1, 2, 3, 4, 5), "id",
        e, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 === Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L, 5L -> 3L))
  }

  test("label propagation: isolated nodes keep their label; self-loops and direction are ignored") {
    // 6 is isolated; 0↔1 given in BOTH directions plus a self-loop —
    // the symmetrized neighbor set must count 1 vote each way
    val r = LinkGraph.labelPropagationInt(nodes(0, 1, 6), "id",
        edges(0L -> 1L, 1L -> 0L, 0L -> 0L), "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r1: 0 adopts 1's label... 0 sees {1} → 1; 1 sees {0} → 0
    // r2: 0 sees 1's previous label {0} → 0; 1 sees {1} → 1 (swap cycle)
    assert(r === Map(0L -> 0L, 1L -> 1L, 6L -> 6L))
    val r0 = LinkGraph.labelPropagationInt(nodes(0, 1), "id",
        edges(0L -> 1L), "src", "dst", iters = 0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r0 === Map(0L -> 0L, 1L -> 1L))
  }

  test("self-loops and damping bounds behave deterministically") {
    // a pure self-loop node feeds itself: r1 = 150000 + 850000·10⁶ DIV 10⁶
    val r = ranks(nodes(0), edges(0L -> 0L), iters = 1)
    assert(r === Map(0L -> 1000000L))
    intercept[IllegalArgumentException] {
      LinkGraph.pageRankInt(nodes(0), "id", edges(), "src", "dst", 1, dampingPpm = 2000000L)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRankInt(nodes(0), "id", edges(), "src", "dst", -1)
    }
  }

  // ---------------------------------------------------- checkpointEvery

  private def planJoins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size

  test("checkpointEvery: bit-identical results; iters=50 plan depth bounded by the cadence") {
    // a ring + chords so ranks keep moving across many iterations
    val n = nodes(0L to 9L: _*)
    val e = edges((0L to 9L).map(i => i -> ((i + 1) % 10)) ++
      Seq(0L -> 5L, 3L -> 8L, 7L -> 2L): _*)

    // equality vs the unchunked path at an iteration count the
    // unchunked plan can still afford — the cost that forces this to
    // stay single-digit is not execution but CONSTRUCTION: every
    // .join in the loop eagerly analyzes the whole accumulated plan,
    // so unchunked build cost grows super-linearly with iters (and
    // crawlDepth's state tree doubles per level). checkpointEvery
    // collapses the analyzed plan to a LogicalRDD leaf on the
    // cadence, which is exactly why it must exist. Off-cadence tail
    // (iters % every != 0) included in each comparison.
    val plain = LinkGraph.pageRankInt(n, "id", e, "src", "dst", iters = 7)
    val chunked = LinkGraph.pageRankInt(n, "id", e, "src", "dst", iters = 7,
      checkpointEvery = 3)
    assert(chunked.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    assert(planJoins(chunked) < planJoins(plain))
    graft.Checkpoints.release(chunked)

    // the iters=50 plan the scaladoc warning used to punt on: the
    // UNCHUNKED 50-iteration plan is deliberately NOT built here (its
    // optimize+codegen cost is the pathology checkpointEvery removes);
    // the chunked one must both run and stay shallow — only the
    // iterations after the LAST checkpoint remain in the final plan
    val deep = LinkGraph.pageRankInt(n, "id", e, "src", "dst", iters = 50,
      checkpointEvery = 5)
    assert(deep.collect().length === 10)
    assert(planJoins(deep) < 12)
    graft.Checkpoints.release(deep)

    // same contract on the multi-state loops: HITS (two state tables)
    val hp = LinkGraph.hitsInt(n, "id", e, "src", "dst", iters = 4)
    val hc = LinkGraph.hitsInt(n, "id", e, "src", "dst", iters = 4, checkpointEvery = 3)
    assert(hc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ===
      hp.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    assert(planJoins(hc) < planJoins(hp))
    graft.Checkpoints.release(hc)

    // label propagation and BFS depth: off-cadence final iteration
    // (iters not a multiple of every) must also be identical
    val lp = LinkGraph.labelPropagationInt(n, "id", e, "src", "dst", iters = 5)
    val lc = LinkGraph.labelPropagationInt(n, "id", e, "src", "dst", iters = 5,
      checkpointEvery = 2)
    assert(lc.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      lp.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    graft.Checkpoints.release(lc)

    val seeds = Seq(0L).toDF("id")
    val dp = LinkGraph.crawlDepth(n, "id", e, "src", "dst", seeds, "id", maxDepth = 5)
    val dc = LinkGraph.crawlDepth(n, "id", e, "src", "dst", seeds, "id", maxDepth = 5,
      checkpointEvery = 2)
    assert(dc.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      dp.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    graft.Checkpoints.release(dc)
  }

  test("checkpointEvery releases superseded state: at most one held generation of blocks") {
    val n = nodes(0L to 9L: _*)
    val e = edges((0L to 9L).map(i => i -> ((i + 1) % 10)): _*)
    val before = graft.Checkpoints.storageBytes(spark)
    val r = LinkGraph.pageRankInt(n, "id", e, "src", "dst", iters = 12,
      checkpointEvery = 2)
    r.collect()
    // 6 checkpoints were taken; all but the LAST were released inside
    // the loop, so held storage is one small table, not six
    graft.Checkpoints.release(r)
    assert(graft.Checkpoints.storageBytes(spark) <= before)
  }

}
