package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables.t

/** Relational operator coverage (SURVEY §2.3-§2.7): scan, filter/project
  * pushdown, joins (broadcast + shuffled), aggregation (partial/final free
  * via Catalyst), window top-k, distinct, set ops, rollup, semi/anti joins.
  *
  * Conventions for oracle hash-matching (driver compares vs DuckDB):
  *  - money math is done on DECIMAL(18,2) (exact in both engines), cast to
  *    DOUBLE only in the final projection;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - deterministic ORDER BY on both sides.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary: partial aggregation pushes map-side,
    * 6 aggregate columns in one shuffle on a low-cardinality key. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val qty = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(BigDecimal(1).bigDecimal) - disc)).cast("double")
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection pushdown: predicate and 3-column read schema reach
    * the parquet scan (verified via explain in BenchSpec). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45.0 && col("l_discount") < 0.02)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("qty"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty
      |FROM lineitem WHERE l_quantity > 45.0 AND l_discount < 0.02
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Broadcast join: customer (small dim) is broadcast to the orders side —
    * no shuffle of the fact table. */
  def q03SegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("segment_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  val q03Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q5-style 5-way join through the dimension chain; all dims
    * broadcast, single shuffle for the final aggregate. */
  def q04NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(price * (lit(BigDecimal(1).bigDecimal) - disc)).cast("double")
        .as("revenue"))
      .orderBy("r_name", "n_name")
  }

  val q04Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Global top-k: Spark's orderBy+limit uses TakeOrderedAndProject (no full
    * sort of the table). */
  def q05TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey"))
      .limit(10)
  }

  val q05Sql: String =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin

  /** Per-group top-k via window row_number — the engine's top-k search
    * shape (reference RRF/top-k: crates/ondine-core/src/evidence/store.rs:289-307). */
  def q06TopOrdersPerSegment(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      .orderBy("c_mktsegment", "rk")
  }

  val q06Sql: String =
    """SELECT c_mktsegment, rk, o_orderkey, price FROM (
      |  SELECT c_mktsegment, o_orderkey,
      |    CAST(o_totalprice AS DOUBLE) AS price,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey) x
      |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin

  /** Distinct aggregation + countDistinct in one pass. */
  def q07DistinctParts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  val q07Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Anti join: customers with no high-value orders (NOT EXISTS). */
  def q08CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: suppliers that shipped high-value items (EXISTS). */
  def q09ActiveSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_extendedprice") > 50000.0)
    s.join(li, s("s_suppkey") === li("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  val q09Sql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_extendedprice > 50000.0)
      |ORDER BY s_suppkey""".stripMargin

  /** Rollup (grouping sets family) with grouping-id disambiguation. */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q10Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set ops: union + except over projected key sets. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ordered = t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    val all = t(spark, dir, "customer").select(col("c_custkey").as("custkey"))
    val inactive = all.except(ordered)        // distinct by SQL semantics
    val active = all.intersect(ordered)
    inactive.withColumn("status", lit("inactive"))
      .unionByName(active.withColumn("status", lit("active")))
      .orderBy("custkey")
  }

  val q11Sql: String =
    """SELECT custkey, status FROM (
      |  SELECT custkey, 'inactive' AS status FROM
      |    (SELECT c_custkey AS custkey FROM customer
      |     EXCEPT SELECT o_custkey FROM orders) a
      |  UNION ALL
      |  SELECT custkey, 'active' AS status FROM
      |    (SELECT c_custkey AS custkey FROM customer
      |     INTERSECT SELECT o_custkey FROM orders) b) x
      |ORDER BY custkey""".stripMargin

  /** Conditional aggregation (CASE WHEN inside agg, TPC-H Q12 shape). */
  def q12ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("finished"),
        sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("open"),
        // exact decimal sum, then one double division — identical in DuckDB
        // (whose AVG would otherwise use double accumulation)
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_price"))
      .orderBy("o_orderpriority")

  val q12Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
      |  CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** HLL sketch aggregation (approx_count_distinct). Sketch estimates are
    * engine-specific, so the hash-checkable output is the exact distinct
    * count plus a boolean asserting the sketch landed within its error
    * bound (default rsd 0.05 → 15% is a 3-sigma bound); the oracle emits
    * TRUE for that column. */
  def q13ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.15).as("approx_ok"),
        col("exact_parts"))
      .orderBy("l_returnflag")

  val q13Sql: String =
    """SELECT l_returnflag, TRUE AS approx_ok,
      |  COUNT(DISTINCT l_partkey) AS exact_parts
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Running cumulative aggregate per key (window frame) — decimal-exact. */
  def q14RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").filter(col("o_custkey") < 50)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q14Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Correlated-subquery shape (TPC-H Q17): lineitems under 50% of their
    * part's average quantity. Expressed as agg + self-join (decorrelated —
    * what Catalyst does to the subquery anyway). */
  def q15BelowAvgQty(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_qty"))
    li.join(avgQty, li("l_partkey") === avgQty("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_below"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("value_below"))
      .orderBy("l_returnflag")
  }

  val q15Sql: String =
    """WITH pa AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_returnflag, COUNT(*) AS n_below,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_below
      |FROM lineitem JOIN pa ON l_partkey = pk
      |WHERE l_quantity < avg_qty * 0.5
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Date arithmetic: yearly/quarterly order stats (ints — exact). */
  def q16DateParts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy("yr", "qtr")

  val q16Sql: String =
    """SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS yr,
      |  EXTRACT(QUARTER FROM o_orderdate)::INT AS qtr,
      |  COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_custs
      |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  /** Full grouping-sets family: CUBE over two dims with grouping-id. */
  def q17Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q17Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin

  /** String-function battery: case, substring, trim, levenshtein (same
    * dynamic-programming edit distance in both engines — exact ints). */
  def q18StringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").filter(col("p_partkey") < 200)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 10).as("name_prefix"),
        length(trim(col("p_type"))).as("type_len"),
        levenshtein(col("p_brand"), lit("Brand#00")).as("brand_dist"),
        translate(col("p_name"), "aeiou", "#####").as("no_vowels"))
      .orderBy("p_partkey")

  val q18Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_upper,
      |  substr(p_name, 1, 10) AS name_prefix,
      |  length(trim(p_type)) AS type_len,
      |  levenshtein(p_brand, 'Brand#00') AS brand_dist,
      |  translate(p_name, 'aeiou', '#####') AS no_vowels
      |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin

  /** Continuous percentiles (median, p90) — linear interpolation over the
    * sorted values, identical in both engines. */
  def q19Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000))
          .cast("double"), 6).as("med_approx"),
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 6)
          .as("med"),
        round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"), 6)
          .as("p90"))
      .orderBy("o_orderpriority")

  val q19Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_disc(o_totalprice, 0.5), 6) AS med_approx,
      |  round(quantile_cont(o_totalprice, 0.5), 6) AS med,
      |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Z-order (Morton) layout audit: interleave the low 10 bits of two
    * independent lineitem keys and report each 2^14-z-value block's
    * min/max range of BOTH keys. Every block is a 128×128 tile of the
    * 1024×1024 key space — `a_spread`/`b_spread` ≤ 127 in every row is
    * the data-skipping property the z-sorted write layout buys: parquet
    * footer ranges stay tight on both keys, so a filter on either one
    * prunes files. The oracle replays the exact interleave formula. */
  def q128ZOrderBlocks(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val li = t(spark, dir, "lineitem").select(
      pmod(col("l_partkey"), lit(1024L)).as("a"),
      pmod(col("l_suppkey"), lit(1024L)).as("b"))
    Layout.withZValue(li, "a", "b", bits = 10)
      .groupBy(shiftright(col("z"), 14).as("z_block"))
      .agg(count(lit(1)).as("n_rows"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"),
        (max("a") - min("a")).as("a_spread"),
        (max("b") - min("b")).as("b_spread"))
      .orderBy("z_block")
  }

  val q128Sql: String =
    s"""WITH k AS (
       |  SELECT l_partkey % 1024 AS a, l_suppkey % 1024 AS b FROM lineitem),
       |z AS (
       |  SELECT a, b,
       |    ${graft.operators.Layout.zValueSql("a", "b", 10)} AS z
       |  FROM k)
       |SELECT (z >> 14) AS z_block, count(*) AS n_rows,
       |  min(a) AS a_min, max(a) AS a_max, min(b) AS b_min, max(b) AS b_max,
       |  max(a) - min(a) AS a_spread, max(b) - min(b) AS b_spread
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_zorder_blocks" -> q128ZOrderBlocks _,
    "q19_percentiles" -> q19Percentiles _,
    "q13_approx_distinct" -> q13ApproxDistinct _,
    "q14_running_sum" -> q14RunningSum _,
    "q15_below_avg_qty" -> q15BelowAvgQty _,
    "q16_date_parts" -> q16DateParts _,
    "q17_cube" -> q17Cube _,
    "q18_string_funcs" -> q18StringFuncs _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_broadcast_join" -> q03SegmentRevenue _,
    "q04_multi_join" -> q04NationRevenue _,
    "q05_topk_global" -> q05TopCustomers _,
    "q06_window_topk" -> q06TopOrdersPerSegment _,
    "q07_distinct_agg" -> q07DistinctParts _,
    "q08_anti_join" -> q08CustomersWithoutOrders _,
    "q09_semi_join" -> q09ActiveSuppliers _,
    "q10_rollup" -> q10Rollup _,
    "q11_set_ops" -> q11SetOps _,
    "q12_conditional_agg" -> q12ConditionalAgg _)

  val oracles: Map[String, String] = Map(
    "q128_zorder_blocks" -> q128Sql,
    "q19_percentiles" -> q19Sql,
    "q17_cube" -> q17Sql,
    "q18_string_funcs" -> q18Sql,
    "q14_running_sum" -> q14Sql,
    "q15_below_avg_qty" -> q15Sql,
    "q16_date_parts" -> q16Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_broadcast_join" -> q03Sql,
    "q04_multi_join" -> q04Sql,
    "q05_topk_global" -> q05Sql,
    "q06_window_topk" -> q06Sql,
    "q07_distinct_agg" -> q07Sql,
    "q08_anti_join" -> q08Sql,
    "q09_semi_join" -> q09Sql,
    "q10_rollup" -> q10Sql,
    "q11_set_ops" -> q11Sql,
    "q12_conditional_agg" -> q12Sql,
    "q13_approx_distinct" -> q13Sql)
}
