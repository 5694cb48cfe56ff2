package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Largest-remainder apportionment (LinkGraph.apportionBudget —
  * oracle-gated end-to-end by q168): the Σslots ≡ budget invariant,
  * remainder distribution, tie order, and degenerate budgets, all
  * hand-derived.
  */
class ApportionSpec extends SparkSpec {
  import spark.implicits._

  private def run(ws: Seq[(String, Long)], budget: Long): Map[String, Long] =
    LinkGraph.apportionBudget(ws.toDF("k", "w"), "k", "w", budget)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("slots")).toMap

  test("proportional weights split exactly — no remainder phase needed") {
    assert(run(Seq(("a", 5L), ("b", 3L), ("c", 2L)), 10L)
      === Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("leftover slots go to the largest remainders, ties to the smaller key") {
    // base = 3 each (9 of 10); all remainders equal -> 'a' wins the tie
    assert(run(Seq(("a", 1L), ("b", 1L), ("c", 1L)), 10L)
      === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // 7 * (3,2,2)/7: base 3,2,2; leftover 0
    assert(run(Seq(("a", 3L), ("b", 2L), ("c", 2L)), 7L)
      === Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("sum of slots equals the budget exactly on awkward weight mixes") {
    val ws = Seq(("a", 17L), ("b", 13L), ("c", 7L), ("d", 3L), ("e", 1L))
    for (budget <- Seq(1L, 10L, 100L, 999L)) {
      val got = run(ws, budget)
      assert(got.values.sum === budget, s"budget $budget: $got")
    }
  }

  test("zero-weight keys take nothing while positive remainders exist; budget 0 allocates 0") {
    assert(run(Seq(("z", 0L), ("b", 1L)), 5L) === Map("z" -> 0L, "b" -> 5L))
    assert(run(Seq(("a", 4L), ("b", 6L)), 0L) === Map("a" -> 0L, "b" -> 0L))
  }
}
