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
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount > 0.05 AND l_quantity < 24.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

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
      .orderBy($"o_custkey", $"rn")
  }

  private val q07Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

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
      .orderBy($"user_id", $"event_id")
  }

  private val q08Sql =
    """SELECT user_id, event_id, ts, event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Exact distinct aggregation per group (count-distinct expands to a
    * two-phase aggregate; partial aggregation still applies).
    */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        asDouble(max(dec($"o_totalprice"))).as("max_price"),
        asDouble(min(dec($"o_totalprice"))).as("min_price"))
      .orderBy($"c_mktsegment")
  }

  private val q09Sql =
    """SELECT c_mktsegment,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q10
  /** ROLLUP hierarchy (region -> nation) — grouping-set aggregation with
    * the standard null-filled super-aggregate rows.
    */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        asDouble(sum(dec($"c_acctbal"))).as("total_acctbal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  private val q10Sql =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Set operations: customers active in 1996 INTERSECT 1997, minus the
    * EXCEPT of a high-value cohort. Exercises distinct-based set ops.
    */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
    def activeIn(year: Int) = ord
      .filter($"o_orderdate" >= lit(s"$year-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit(s"${year + 1}-01-01").cast(TimestampType))
      .select($"o_custkey")
    val bigSpenders = ord.filter($"o_totalprice" > 400000.0).select($"o_custkey")
    activeIn(1996).intersect(activeIn(1997)).except(bigSpenders)
      .orderBy($"o_custkey")
  }

  private val q11Sql =
    """SELECT o_custkey FROM (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  INTERSECT
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
      |) ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Time-bucketed event aggregation (tumbling daily windows as
    * date_trunc — the batch analog of the streaming windowed agg).
    */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"ts".cast(DateType).as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        asDouble(sum(dec($"value"))).as("total_value"))
      .orderBy($"day", $"event_type")
  }

  private val q12Sql =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Scalar string-function pipeline over documents (pure codegen'd
    * row expressions; no shuffle besides the final sort).
    */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .filter($"text".like("%spark%"))
      .select(
        $"doc_id",
        upper($"lang").as("lang_uc"),
        length($"text").as("text_len"),
        substring($"text", 1, 20).as("head20"),
        concat($"source", lit(":"), $"lang").as("src_lang"))
      .orderBy($"doc_id")
  }

  private val q13Sql =
    """SELECT doc_id, upper(lang) AS lang_uc, length(text) AS text_len,
      |  substring(text, 1, 20) AS head20,
      |  source || ':' || lang AS src_lang
      |FROM documents
      |WHERE text LIKE '%spark%'
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Conditional aggregation (TPC-H Q14 shape): CASE inside SUM, share
    * computed as one double division of two exact decimals.
    */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val one = lit(1).cast(DecimalType(18, 2))
    val revenue = dec($"l_extendedprice") * (one - dec($"l_discount"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .agg(
        (asDouble(sum(when($"p_type".startsWith("PROMO"), revenue)
          .otherwise(lit(0).cast(DecimalType(18, 2))))) /
          asDouble(sum(revenue))).as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  private val q14Sql =
    """SELECT
      |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_share,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Top-1-per-group via window over a broadcast-joined dimension:
    * richest supplier per nation.
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"n_name").orderBy($"s_acctbal".desc, $"s_suppkey")
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"n_name", $"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"n_name")
  }

  private val q15Sql =
    """SELECT n_name, s_suppkey, s_name, s_acctbal FROM (
      |  SELECT n_name, s_suppkey, s_name, s_acctbal,
      |    row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rk
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |WHERE rk = 1 ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q16
  /** NOT EXISTS as left-anti join: customers with no 1995 orders
    * (the date filter keeps the result non-trivial at every sf).
    */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord95 = t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1996-01-01").cast(TimestampType))
    t(s, dir, "customer")
      .join(ord95, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q16Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Banded range join (interval/attribution): first purchase within
    * 10 minutes after each click, per user. Equi-join on user_id keeps
    * the shuffle keyed; the band predicate prunes inside the join;
    * min() picks the earliest qualifying purchase.
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"ts".as("purchase_ts"))
    clicks.join(purchases,
        $"user_id" === $"p_user_id" &&
          $"purchase_ts" >= $"click_ts" &&
          $"purchase_ts" <= $"click_ts" + expr("INTERVAL 10 MINUTES"))
      .groupBy($"user_id", $"click_id", $"click_ts")
      .agg(min($"purchase_ts").as("first_purchase_ts"),
        count(lit(1)).as("n_purchases_10m"))
      .orderBy($"user_id", $"click_id")
  }

  private val q17Sql =
    """SELECT c.user_id AS user_id, c.event_id AS click_id, c.ts AS click_ts,
      |  min(p.ts) AS first_purchase_ts,
      |  count(*) AS n_purchases_10m
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
      |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q18
  /** As-of join via the NATIVE sorted-merge exec (graft.plans
    * .AsOfJoinExec, strategy-injected): each purchase gets the latest
    * signup at or before it, per user. Oracle uses DuckDB's native
    * ASOF JOIN — an independent implementation of the same semantics
    * — so the custom physical operator is hash-gated every round. The
    * compositional union+window form (AsOfJoin.apply) stays
    * differential-tested against this one in AsOfJoinSpec.
    */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("signup_ts"))
    graft.operators.AsOfJoin.native(
        left = purchases, right = signups,
        key = "user_id", leftTime = "ts", rightTime = "signup_ts",
        rightValues = Seq("signup_ts"), rightTiebreak = "signup_id")
      .orderBy($"user_id", $"event_id")
  }

  private val q18Sql =
    """SELECT p.user_id, p.event_id, p.ts, s.ts AS signup_ts
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND s.ts <= p.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  // ---------------------------------------------------------------- q19
  /** GROUPING SETS via cube + grouping_id over two independent
    * dimensions of orders.
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec($"o_totalprice"))).as("total_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val q19Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Correlated scalar-subquery shape: parts priced above their type's
    * average (decorrelates into a join against the per-type aggregate).
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = t(s, dir, "part")
    val avgByType = part.groupBy($"p_type")
      .agg((asDouble(sum(dec($"p_retailprice"))) / count(lit(1))).as("avg_price"))
    part.join(broadcast(avgByType), Seq("p_type"))
      .filter($"p_retailprice" > $"avg_price")
      .select($"p_partkey", $"p_type", $"p_retailprice", $"avg_price")
      .orderBy($"p_partkey")
  }

  private val q20Sql =
    """SELECT p_partkey, p_type, p_retailprice, avg_price FROM (
      |  SELECT p_partkey, p_type, p_retailprice,
      |    CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_type) AS DOUBLE)
      |      / count(*) OVER (PARTITION BY p_type) AS avg_price
      |  FROM part)
      |WHERE p_retailprice > avg_price
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q21
  /** JSON extraction from the events props column (string JSON ->
    * typed value), aggregated.
    */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"k").as("sum_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  private val q21Sql =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Offset window functions: per-user event gaps (lag) and
    * next-event lookahead (lead) over the stream.
    */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select(
        $"user_id", $"event_id", $"event_type",
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))).as("micros_since_prev"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"user_id", $"event_id")
  }

  private val q22Sql =
    """SELECT user_id, event_id, event_type,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS micros_since_prev,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Approximate aggregation (HLL++ distinct, GK quantiles) — the
    * sketch operators a 100 TB profile pass uses instead of exact
    * distinct/percentile. Raw sketch values are implementation-
    * defined, so they can never hash-match a DuckDB oracle; ApproxSpec
    * bounds them against exact answers.
    */
  def approxStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        approx_count_distinct($"o_custkey", 0.02).as("approx_customers"),
        percentile_approx($"o_totalprice", lit(0.5), lit(1000)).as("approx_median_price"),
        count(lit(1)).as("n_orders"))
  }

  /** The oracle-gated form pins the sketches' ACCURACY CONTRACT
    * instead of their values: each group carries exact anchors plus
    * within-bounds booleans (HLL estimate vs exact distinct; GK median
    * vs its true rank). The oracle asserts the same anchors and
    * literal TRUE — so the hash gate fails exactly when a sketch
    * breaks its published error bound. The second pass joining the
    * 5-row sketch output back to orders is a broadcast.
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
    val sk = approxStats(s, dir)
      .join(t(s, dir, "orders").groupBy($"o_orderpriority")
          .agg(countDistinct($"o_custkey").as("exact_customers")),
        "o_orderpriority")
    orders.join(broadcast(sk), "o_orderpriority")
      .groupBy($"o_orderpriority")
      .agg(
        first($"n_orders").as("n_orders"),
        first($"approx_customers").as("ac"),
        first($"exact_customers").as("ec"),
        // true rank of the approx median within the group
        (sum(when($"o_totalprice" <= $"approx_median_price", 1L).otherwise(0L))
          / count(lit(1))).as("mrank"))
      .select($"o_orderpriority", $"n_orders",
        // rsd 0.02 => 2.5 sigma margin
        (abs($"ac" - $"ec") <= $"ec" * 0.05).as("customers_ok"),
        // GK accuracy 1000 => rank error <= 1/1000; 10x margin
        ($"mrank" >= 0.49 && $"mrank" <= 0.51).as("median_ok"))
      .orderBy($"o_orderpriority")
  }

  private val q37Sql =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  TRUE AS customers_ok, TRUE AS median_ok
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Pivot: order counts per priority, one column per order status.
    * Values enumerated so the plan is one pass (no distinct-scan) —
    * the only pivot shape that works at 100 TB.
    */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderpriority")
  }

  private val q38Sql =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Explicit GROUPING SETS (not derivable from rollup/cube): the
    * (status) and (priority) marginals only — no grand total, no
    * cross cells. Spark's groupingSets API + grouping_id, single
    * Expand pass (one scan at any scale).
    */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupingSets(Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val q50Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q51
  /** The remaining analytic-window family in one pass per customer
    * order history: ntile, percent_rank, cume_dist, first/nth value
    * over a running frame. One shuffle (partition by custkey), every
    * function shares the same window definition.
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cdist"),
        first($"o_orderkey").over(run).as("first_key"),
        nth_value($"o_orderkey", 2).over(run).as("second_key"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q51Sql =
    """SELECT o_custkey, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 9) AS pct_rank,
      |  round(cume_dist() OVER w, 9) AS cdist,
      |  first_value(o_orderkey) OVER wrun AS first_key,
      |  nth_value(o_orderkey, 2) OVER wrun AS second_key
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Regression/correlation aggregates from EXACT decimal co-moment
    * sums (n, Σx, Σy, Σxx, Σxy, Σyy), with slope/intercept/corr
    * derived in identically-shaped double expressions — the built-in
    * corr/regr_* run streaming co-moment updates whose float error
    * differs per engine, so the oracle could never hash-match them.
    * One aggregation pass either way.
    */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_extendedprice")
    val n = asDouble($"n_")
    val (sx, sy, sxx, sxy, syy) = (asDouble($"sx"), asDouble($"sy"),
      asDouble($"sxx"), asDouble($"sxy"), asDouble($"syy"))
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
      .select($"l_returnflag", $"n_".as("n_rows"),
        round(num / denx, 9).as("slope"),
        round((sy - (num / denx) * sx) / n, 9).as("intercept"),
        round(num / (sqrt(denx) * sqrt(deny)), 9).as("corr_xy"))
      .orderBy($"l_returnflag")
  }

  private val q52Sql =
    """SELECT l_returnflag, n_rows,
      |  round((n_*sxy - sx*sy) / (n_*sxx - sx*sx), 9) AS slope,
      |  round((sy - (n_*sxy - sx*sy) / (n_*sxx - sx*sx) * sx) / n_, 9) AS intercept,
      |  round((n_*sxy - sx*sy) / (sqrt(n_*sxx - sx*sx) * sqrt(n_*syy - sy*sy)), 9) AS corr_xy
      |FROM (
      |  SELECT l_returnflag, count(*) AS n_rows, CAST(count(*) AS DOUBLE) AS n_,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy,
      |    CAST(sum(y*y) AS DOUBLE) AS syy
      |  FROM (SELECT l_returnflag,
      |          CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |          CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Bitwise and boolean aggregates (order-independent, so safely
    * partial-aggregated map-side at any scale).
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        bit_and($"l_linenumber").as("lines_and"),
        bit_or($"l_linenumber").as("lines_or"),
        bit_xor($"l_linenumber").as("lines_xor"),
        bool_and($"l_discount" < 0.09).as("all_low_discount"),
        bool_or($"l_tax" > 0.07).as("any_high_tax"))
      .orderBy($"l_returnflag")
  }

  private val q53Sql =
    """SELECT l_returnflag,
      |  bit_and(l_linenumber) AS lines_and,
      |  bit_or(l_linenumber) AS lines_or,
      |  bit_xor(l_linenumber) AS lines_xor,
      |  bool_and(l_discount < 0.09) AS all_low_discount,
      |  bool_or(l_tax > 0.07) AS any_high_tax
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Fuzzy string matching: near-identical part names by edit
    * distance within (brand, size) blocks. The block key is an
    * equi-join — Catalyst shuffles both sides once on it — and
    * levenshtein only runs inside blocks (~|block|² pairs, not |T|²).
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = t(s, dir, "part").select($"p_partkey", $"p_name", $"p_brand", $"p_size")
    val a = p.select($"p_brand", $"p_size", $"p_partkey".as("key_a"), $"p_name".as("name_a"))
    val b = p.select($"p_brand", $"p_size", $"p_partkey".as("key_b"), $"p_name".as("name_b"))
    a.join(b, Seq("p_brand", "p_size"))
      .filter($"key_a" < $"key_b")
      .withColumn("edit_dist", levenshtein($"name_a", $"name_b"))
      .filter($"edit_dist" <= 2)
      .select($"key_a", $"key_b", $"name_a", $"name_b", $"edit_dist")
      .orderBy($"key_a", $"key_b")
  }

  private val q54Sql =
    """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  levenshtein(a.p_name, b.p_name) AS edit_dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
      | AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY key_a, key_b""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Calendar/date function family over the order dates (extract
    * parts, ISO week, last-of-month, offsets, day arithmetic) — pure
    * codegen'd row expressions, no shuffle but the final sort.
    * Engine deltas pinned explicitly: Spark dayofweek is 1-based
    * Sunday-first, DuckDB's 0-based.
    */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 100 === 0)
      .select($"o_orderkey", to_date($"o_orderdate").as("d"))
      .select($"o_orderkey",
        year($"d").as("y"), quarter($"d").as("q"), month($"d").as("m"),
        dayofmonth($"d").as("dom"), dayofyear($"d").as("doy"),
        dayofweek($"d").as("dow"), weekofyear($"d").as("iso_week"),
        last_day($"d").as("eom"),
        date_add($"d", 30).as("plus30"),
        datediff($"d", lit(java.sql.Date.valueOf("1995-01-01"))).as("days_since_95"))
      .orderBy($"o_orderkey")
  }

  private val q55Sql =
    """SELECT o_orderkey,
      |  year(d) AS y, quarter(d) AS q, month(d) AS m,
      |  day(d) AS dom, dayofyear(d) AS doy,
      |  dayofweek(d) + 1 AS dow, week(d) AS iso_week,
      |  last_day(d) AS eom,
      |  d + 30 AS plus30,
      |  date_diff('day', DATE '1995-01-01', d) AS days_since_95
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
      |      WHERE o_orderkey % 100 = 0)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q56
  /** UNION (distinct) — the remaining set operation (q11 covers
    * INTERSECT/EXCEPT): customers active in either window, once.
    */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
    def activeIn(year: Int) = ord
      .filter($"o_orderdate" >= lit(s"$year-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit(s"${year + 1}-01-01").cast(TimestampType))
      .select($"o_custkey")
    activeIn(1992).union(activeIn(1998)).distinct()
      .orderBy($"o_custkey")
  }

  private val q56Sql =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1992-01-01' AND o_orderdate < TIMESTAMP '1993-01-01'
      |UNION
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q57
  /** The SQL front end itself: the engine registered as temp views and
    * queried with LITERAL SQL (SparkSqlParser -> Catalyst), not the
    * DataFrame DSL — what "be the query layer" means for users who
    * bring SQL (the reference's delegated surface, SURVEY §2.3). Same
    * text runs in DuckDB as the oracle.
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  private val q57Sql =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Time-series gap fill + forward fill: build the complete per-user
    * day calendar (sequence/generate_series between the user's first
    * and last active day), left-join the daily aggregate, zero-fill
    * counts and forward-fill the last seen event type. The standard
    * resample-and-ffill operator; the calendar explode is linear in
    * user-days, never a cross join.
    */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events")
      .filter($"user_id" < 20)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), max($"event_type").as("day_type"))
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
    cal.join(daily, Seq("user_id", "day"), "left_outer")
      .select($"user_id", $"day",
        coalesce($"n", lit(0L)).as("n_events"),
        last($"day_type", ignoreNulls = true).over(w).as("last_seen_type"))
      .orderBy($"user_id", $"day")
  }

  private val q59Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
      |    max(event_type) AS day_type
      |  FROM events WHERE user_id < 20
      |  GROUP BY user_id, CAST(ts AS DATE)),
      |cal AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
      |                                CAST(max(day) AS TIMESTAMP),
      |                                INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id)
      |SELECT cal.user_id, cal.day,
      |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
      |  last_value(daily.day_type IGNORE NULLS)
      |    OVER (PARTITION BY cal.user_id ORDER BY cal.day) AS last_seen_type
      |FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
      |ORDER BY cal.user_id, cal.day""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Time-RANGE window frames (not ROWS): per event, activity within
    * the trailing hour for the same user — the rolling-rate primitive.
    * Ordered on integer epoch-micros so the frame bound arithmetic is
    * identical in both engines.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600L * 1000000L, 0L)
    t(s, dir, "events")
      .select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_1h"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(w).as("purchases_1h"))
      .orderBy($"user_id", $"event_id")
  }

  private val q60Sql =
    """SELECT user_id, event_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS purchases_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Correlated scalar subquery, as SQL text: Catalyst must
    * DECORRELATE it into an aggregate+join (check the plan — no
    * per-row re-execution survives). Same analytical shape as q20,
    * but q20 hand-writes the window; this exercises the rewrite.
    */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_v")
    // the subquery's mean is derived from the EXACT decimal sum (a
    // double avg folds in partition order — a row within 1 ulp of the
    // 1.5x boundary could flip between engines)
    s.sql(
      """SELECT p_partkey, p_type, p_retailprice
        |FROM part_v p
        |WHERE p_retailprice > 1.5 * (
        |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM part_v p2 WHERE p2.p_type = p.p_type)
        |ORDER BY p_partkey""".stripMargin)
  }

  private val q61Sql =
    """SELECT p_partkey, p_type, p_retailprice
      |FROM part p
      |WHERE p_retailprice > 1.5 * (
      |  SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM part p2 WHERE p2.p_type = p.p_type)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q62
  /** LATERAL correlated subquery: for each region, the 2 nations with
    * the most customers — the per-row dependent-subquery shape that
    * plans as a LateralJoin.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "region").createOrReplaceTempView("region_v")
    t(s, dir, "nation").createOrReplaceTempView("nation_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT r.r_name, t.n_name, t.n_customers
        |FROM region_v r,
        |LATERAL (
        |  SELECT n.n_name, count(*) AS n_customers
        |  FROM nation_v n JOIN customer_v c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_customers DESC, n.n_name
        |  LIMIT 2) t
        |ORDER BY r.r_name, t.n_customers DESC, t.n_name""".stripMargin)
  }

  private val q62Sql =
    """SELECT r.r_name, t.n_name, t.n_customers
      |FROM region r,
      |LATERAL (
      |  SELECT n.n_name, count(*) AS n_customers
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_customers DESC, n.n_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.n_customers DESC, t.n_name""".stripMargin

  // ---------------------------------------------------------------- q63
  /** JSON construction (the q21 counterpart: typed -> JSON text):
    * to_json over a struct, int + string fields only — double
    * formatting is engine-specific, so numeric payloads ship as
    * exact types, not embedded in strings.
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 1000 === 0)
      .select($"o_orderkey",
        to_json(struct($"o_orderkey".as("k"), $"o_orderstatus".as("s"),
          $"o_orderpriority".as("p"))).as("payload"))
      .orderBy($"o_orderkey")
  }

  private val q63Sql =
    """SELECT o_orderkey,
      |  CAST(to_json(struct_pack(k := o_orderkey, s := o_orderstatus,
      |                           p := o_orderpriority)) AS VARCHAR) AS payload
      |FROM orders
      |WHERE o_orderkey % 1000 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Ordered-set aggregates via ANSI WITHIN GROUP syntax (SQL text on
    * both engines): interpolated + discrete percentiles and an
    * order-specified listagg. Sort-based, so fold order cannot
    * perturb the doubles (q47 established cont==quantile_cont
    * bit-exactness).
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1,
        |  percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_disc,
        |  listagg(DISTINCT l_linestatus, '|') WITHIN GROUP (ORDER BY l_linestatus) AS statuses
        |FROM lineitem_v
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  private val q64Sql =
    """SELECT l_returnflag,
      |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1,
      |  percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_disc,
      |  string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Custom typed Aggregator (TopKAggregator): 3 highest-value orders
    * per market segment as a bounded O(k) accumulator — partial
    * aggregation applies, unlike the window-sort formulation (q07/q15)
    * which shuffles every row. Oracle mirrors with ordered list aggs.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top3 = graft.functions.TopKAggregator.topK(3)
    // one row per (segment, rank): arrays never reach the output
    // schema (the driver's oracle compare hashes scalar cells only)
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(top3($"o_totalprice", $"o_orderkey").as("top"))
      .select($"c_mktsegment",
        posexplode(arrays_zip($"top.top_values".as("v"), $"top.top_ids".as("i"))))
      .select($"c_mktsegment", ($"pos" + 1).cast("long").as("rnk"),
        $"col.v".as("top_value"), $"col.i".as("top_id"))
      .orderBy($"c_mktsegment", $"rnk")
  }

  private val q39Sql =
    """SELECT c_mktsegment, rnk, o_totalprice AS top_value, o_orderkey AS top_id
      |FROM (
      |  SELECT c_mktsegment, o_totalprice, o_orderkey,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Ordered collection + array functions: per-user event-type journey
    * (first 5 steps), distinct-type count, purchase flag. Exercises
    * collect_list with a deterministic sort, slice, array_distinct,
    * array_contains.
    */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic ordered collect: gather (ts, event_id, type)
    // structs, array_sort on the leading fields, project the type —
    // collect_list alone has no order guarantee under parallel agg
    t(s, dir, "events")
      .groupBy($"user_id")
      .agg(transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
        x => x("event_type")).as("seq"))
      .select(
        $"user_id",
        // pipe-joined string, not an array: the driver compare cannot
        // hash list cells (event types never contain '|')
        concat_ws("|", slice($"seq", 1, 5)).as("first5"),
        size(array_distinct($"seq")).as("n_types"),
        array_contains($"seq", "purchase").as("has_purchase"))
      .orderBy($"user_id")
  }

  private val q40Sql =
    """SELECT user_id,
      |  array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '|') AS first5,
      |  len(list_distinct(list(event_type ORDER BY ts, event_id))) AS n_types,
      |  list_contains(list(event_type ORDER BY ts, event_id), 'purchase') AS has_purchase
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Outer-join aggregation distribution (TPC-H Q13 shape): orders per
    * customer including zero-order customers (LEFT join + count(col)
    * null semantics), re-aggregated into a histogram.
    */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCustomer = t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
    perCustomer.groupBy($"n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_customers".desc, $"n_orders")
  }

  private val q42Sql =
    """SELECT n_orders, count(*) AS n_customers FROM (
      |  SELECT c_custkey, count(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY n_orders
      |ORDER BY n_customers DESC, n_orders""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Unpivot (wide -> long): the three lineitem money measures melted
    * to (measure, value) rows and aggregated per measure.
    */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount", $"l_tax")
      .unpivot(
        ids = Array($"l_orderkey"),
        values = Array($"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy($"measure")
      .agg(asDouble(sum(dec($"value"))).as("total"),
        count(lit(1)).as("n_values"))
      .orderBy($"measure")
  }

  private val q43Sql =
    """SELECT measure,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS n_values
      |FROM (
      |  SELECT l_orderkey, 'l_extendedprice' AS measure, l_extendedprice AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
      |GROUP BY measure
      |ORDER BY measure""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Exact interpolated quantiles per group (verified bit-identical to
    * DuckDB's quantile_cont — both use linear interpolation over the
    * sorted group). The exact counterpart of q37's sketches.
    */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("q50"),
        expr("percentile(o_totalprice, 0.9)").as("q90"),
        expr("percentile(o_totalprice, 0.99)").as("q99"))
      .orderBy($"o_orderpriority")
  }

  private val q47Sql =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS q50,
      |  quantile_cont(o_totalprice, 0.9) AS q90,
      |  quantile_cont(o_totalprice, 0.99) AS q99
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Statistical moments computed the determinism-safe way: raw sums in
    * exact DECIMAL (order-independent), moments assembled with one
    * fixed double-expression at the end. Built-in corr/stddev
    * accumulate doubles in partition order — nondeterministic under
    * parallel aggregation — so they can never be hash-gated; this
    * formulation can, and is how a 100 TB profile should compute them.
    */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_extendedprice")
    val g = t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(x)).as("sx"), asDouble(sum(y)).as("sy"),
        asDouble(sum(x * x)).as("sxx"), asDouble(sum(x * y)).as("sxy"),
        asDouble(sum(y * y)).as("syy"))
    g.select($"l_returnflag", $"n",
        round(sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * ($"n" - 1))), 6).as("stddev_qty"),
        round((($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy"))), 6)
          .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  private val q48Sql =
    """SELECT l_returnflag, n,
      |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS stddev_qty,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      |  FROM lineitem
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_approx_stats" -> (q37 _),
    "q50_grouping_sets" -> (q50 _),
    "q51_window_suite" -> (q51 _),
    "q52_regression" -> (q52 _),
    "q53_bit_bool_aggs" -> (q53 _),
    "q54_fuzzy_match" -> (q54 _),
    "q55_datetime_suite" -> (q55 _),
    "q56_union" -> (q56 _),
    "q57_sql_surface" -> (q57 _),
    "q59_gap_fill" -> (q59 _),
    "q60_rolling_time_window" -> (q60 _),
    "q61_correlated_subquery" -> (q61 _),
    "q62_lateral_topk" -> (q62 _),
    "q63_json_build" -> (q63 _),
    "q64_ordered_set_aggs" -> (q64 _),
    "q47_exact_quantiles" -> (q47 _),
    "q48_exact_moments" -> (q48 _),
    "q42_order_distribution" -> (q42 _),
    "q43_unpivot" -> (q43 _),
    "q38_pivot" -> (q38 _),
    "q39_topk_udaf" -> (q39 _),
    "q40_array_journey" -> (q40 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_topk_revenue" -> (q03 _),
    "q04_exists_semijoin" -> (q04 _),
    "q05_star_join" -> (q05 _),
    "q06_global_agg" -> (q06 _),
    "q07_window_rank" -> (q07 _),
    "q08_running_total" -> (q08 _),
    "q09_distinct_agg" -> (q09 _),
    "q10_rollup" -> (q10 _),
    "q11_set_ops" -> (q11 _),
    "q12_time_buckets" -> (q12 _),
    "q13_string_funcs" -> (q13 _),
    "q14_conditional_agg" -> (q14 _),
    "q15_top_per_group" -> (q15 _),
    "q16_anti_join" -> (q16 _),
    "q17_range_join" -> (q17 _),
    "q18_asof_join" -> (q18 _),
    "q19_cube" -> (q19 _),
    "q20_above_group_avg" -> (q20 _),
    "q21_json_extract" -> (q21 _),
    "q22_lag_lead" -> (q22 _))

  val oracle: Map[String, String] = Map(
    "q47_exact_quantiles" -> q47Sql,
    "q48_exact_moments" -> q48Sql,
    "q42_order_distribution" -> q42Sql,
    "q43_unpivot" -> q43Sql,
    "q38_pivot" -> q38Sql,
    "q39_topk_udaf" -> q39Sql,
    "q40_array_journey" -> q40Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_topk_revenue" -> q03Sql,
    "q04_exists_semijoin" -> q04Sql,
    "q05_star_join" -> q05Sql,
    "q06_global_agg" -> q06Sql,
    "q07_window_rank" -> q07Sql,
    "q08_running_total" -> q08Sql,
    "q09_distinct_agg" -> q09Sql,
    "q10_rollup" -> q10Sql,
    "q11_set_ops" -> q11Sql,
    "q12_time_buckets" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_conditional_agg" -> q14Sql,
    "q15_top_per_group" -> q15Sql,
    "q16_anti_join" -> q16Sql,
    "q17_range_join" -> q17Sql,
    "q18_asof_join" -> q18Sql,
    "q19_cube" -> q19Sql,
    "q20_above_group_avg" -> q20Sql,
    "q21_json_extract" -> q21Sql,
    "q22_lag_lead" -> q22Sql,
    "q37_approx_stats" -> q37Sql,
    "q50_grouping_sets" -> q50Sql,
    "q51_window_suite" -> q51Sql,
    "q52_regression" -> q52Sql,
    "q53_bit_bool_aggs" -> q53Sql,
    "q54_fuzzy_match" -> q54Sql,
    "q55_datetime_suite" -> q55Sql,
    "q56_union" -> q56Sql,
    "q57_sql_surface" -> q57Sql,
    "q59_gap_fill" -> q59Sql,
    "q60_rolling_time_window" -> q60Sql,
    "q61_correlated_subquery" -> q61Sql,
    "q62_lateral_topk" -> q62Sql,
    "q63_json_build" -> q63Sql,
    "q64_ordered_set_aggs" -> q64Sql)
}
