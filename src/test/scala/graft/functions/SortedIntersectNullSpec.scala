package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r22 null-element guard on SortedIntersectCount's STRING
  * form (advisory: the r21 loop NPE'd on a nullable-typed array's
  * null element). Nulls sort LAST and equal each other — array_sort's
  * ascending placement — and the containsNull=false fast path is
  * byte-identical to r21's.
  */
class SortedIntersectNullSpec extends SparkSpec {

  private def isect(a: Seq[String], b: Seq[String]): Int = {
    import spark.implicits._
    VectorExpressions.register(spark)
    // Seq[String] with a null element infers containsNull=true —
    // exactly the schema that picked the unguarded loop in r21
    Seq((a, b)).toDF("a", "b")
      .select(call_function("sorted_intersect_count", col("a"), col("b")))
      .collect().head.getInt(0)
  }

  test("string form: null elements compare nulls-last instead of NPE") {
    assert(isect(Seq("a", "b"), Seq("b", null)) === 1)
    assert(isect(Seq("b", null), Seq("b", null)) === 2) // null == null, once
    assert(isect(Seq(null), Seq("z")) === 0) // null sorts after any value
    assert(isect(Seq("a", "m", null), Seq("m", "z", null)) === 2)
    assert(isect(Seq.empty[String], Seq(null)) === 0)
  }

  test("string form: non-null arrays unchanged") {
    assert(isect(Seq("a", "b", "c"), Seq("b", "c", "d")) === 2)
    assert(isect(Seq("a"), Seq("b")) === 0)
  }
}
