package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Relational analytics inventory — the query surface the reference
  * delegates to DuckDB (SURVEY.md §2.3) rebuilt as Spark-first operators,
  * each with a DuckDB oracle (SURVEY.md §5 gate).
  *
  * == Determinism discipline (hash-compared against DuckDB) ==
  * Double-typed aggregation is order-dependent, and Spark's partial
  * aggregation order is nondeterministic. Every aggregate over a money
  * column therefore runs in DECIMAL (exact, engine-independent) and is
  * cast to DOUBLE only at the end (exact decimal -> nearest double is
  * deterministic and identical across engines). Doubles appear mid-plan
  * only in per-row single expressions evaluated identically by IEEE-754
  * in both engines. Ratios are computed as one double division of two
  * exact values. Every ORDER BY / top-k carries a unique tiebreak key.
  * Every computed column is aliased identically in the Spark plan and in
  * the oracle SQL (driver compare sorts columns by name).
  */
object Analytics {

  /** Cast a 2-decimal-valued double column to exact DECIMAL(18,2). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def asDouble(c: Column): Column = c.cast(DoubleType)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------- q01
  /** Scan -> filter -> hash-aggregate, TPC-H Q1 shape. Exercises:
    * predicate pushdown to parquet, partial (map-side) aggregation,
    * whole-stage codegen over the decimal arithmetic.
    */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        asDouble(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))))
          .as("sum_disc_price"),
        (asDouble(sum(dec($"l_quantity"))) / count(lit(1))).as("avg_qty"),
        (asDouble(sum(dec($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Selective filter + projection with a per-row computed column.
    * Exercises: parquet PushedFilters, column pruning (ReadSchema must
    * show only the 5 referenced columns), codegen'd row expression.
    */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1997-01-01").cast(TimestampType) &&
        $"l_discount" > 0.05 && $"l_quantity" < 24.0)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount > 0.05 AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------- q03
  /** 3-way join -> aggregate -> top-k, TPC-H Q3 shape. Exercises: join
    * order (customer is the small side at scale -> broadcastable after
    * the segment filter), shuffle-key reuse between join and groupBy,
    * deterministic top-k (unique tiebreak on o_orderkey).
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast(TimestampType))
    val li = t(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1997-01-01").cast(TimestampType))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(asDouble(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))))
        .as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** EXISTS as left-semi join (TPC-H Q4 shape). Catalyst plans the
    * semi-join without materializing lineitem columns.
    */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1996-07-01").cast(TimestampType))
    val li = t(s, dir, "lineitem").select($"l_orderkey").distinct()
    ord.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Star join through two broadcast dimensions (TPC-H Q5 shape):
    * fact tables shuffle-join on orderkey; nation/region are broadcast.
    */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region").filter($"r_name" === "ASIA")
    val dims = broadcast(nation.join(region, $"n_regionkey" === $"r_regionkey"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(dims, $"c_nationkey" === $"n_nationkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
      .groupBy($"n_name")
      .agg(asDouble(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))))
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q05Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Pure filter + global aggregate (TPC-H Q6 shape) — the minimal
    * "does the whole pipeline collapse into one codegen stage" probe.
    */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1997-01-01").cast(TimestampType) &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(asDouble(sum(dec($"l_extendedprice") * dec($"l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q06Sql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Ranking window: latest 3 orders per customer. Ordering carries a
    * unique key (o_orderkey) so row_number is deterministic.
    */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice", $"rn")
  }

  private val q07Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Running-total window over the event stream (exact decimal running
    * sum, deterministic frame order by (ts, event_id)).
    */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("running_value", asDouble(sum(dec($"value")).over(w)))
      .select($"user_id", $"event_id", $"ts", $"event_type", $"running_value")
  }

  private val q08Sql =
    """SELECT user_id, event_id, ts, event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_topk_revenue" -> (q03 _),
    "q04_exists_semijoin" -> (q04 _),
    "q05_star_join" -> (q05 _),
    "q06_global_agg" -> (q06 _),
    "q07_window_rank" -> (q07 _),
    "q08_running_total" -> (q08 _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_topk_revenue" -> q03Sql,
    "q04_exists_semijoin" -> q04Sql,
    "q05_star_join" -> q05Sql,
    "q06_global_agg" -> q06Sql,
    "q07_window_rank" -> q07Sql,
    "q08_running_total" -> q08Sql)
}
