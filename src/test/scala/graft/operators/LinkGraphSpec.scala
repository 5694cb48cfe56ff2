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
}
