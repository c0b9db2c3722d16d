package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dim / fact / mart layer: equi-joins onto dimensions, distinct dims,
  * rollups with conditional distinct counts and exact percentiles.
  *
  * Reference semantics (not code):
  *   - fact_prices left joins       (dbt models/marts/fact_prices.sql:22-24)
  *   - dim_products SELECT DISTINCT (models/marts/dim_products.sql:1-7)
  *   - mart_category_distribution   (models/marts/mart_category_distribution.sql:1-9)
  *   - mart_location_sales          (models/marts/mart_location_sales.sql:1-24)
  *   - mart_price_by_category       (models/marts/mart_price_by_category.sql:1-16)
  *
  * Scale notes: dims (part/supplier/nation) are orders of magnitude smaller
  * than the fact table, so every fact←dim join is explicitly
  * `broadcast(...)` — no shuffle of the fact side for the join. Rollups are
  * plain groupBy/agg: Catalyst plans partial (map-side) + final hash
  * aggregation, so the shuffle carries pre-aggregated rows only.
  */
object Marts {

  /** Exact-decimal average for 2-decimal "money" columns: summing doubles
    * is order-dependent, and money data sits exactly on the rounding grid,
    * so round(avg(x), 2) can flip its last cent between engines (§7.5
    * hazard 1). Summing as DECIMAL is exact and associative → the
    * unrounded quotient is bitwise identical in Spark and DuckDB.
    * SQL twin: round(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x), 2)
    */
  private[ops] def avgMoney(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c.cast("decimal(18,2)")).cast("double") / count(c), 2)

  /** J1: left equi-join fact←product dim (fact rows never dropped). */
  def j1LeftJoinPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
      .select("l_orderkey", "l_linenumber", "p_brand", "p_type", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J2: the fact build — stg_prices left-joined onto both dims
    * (fact_prices.sql:22-24 analog). The flagship wide table.
    */
  def factBuild(spark: SparkSession, dir: String): DataFrame = {
    val prices = Staging.stgPrices(spark, dir)
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    prices
      .join(broadcast(p), prices("l_partkey") === p("p_partkey"), "left")
      .join(broadcast(s), prices("l_suppkey") === s("s_suppkey"), "left")
      .select(prices("l_orderkey"), prices("l_linenumber"),
        prices("l_partkey"), prices("l_suppkey"), col("effective_date"),
        col("regular_price"), col("promo_price"), col("discount_amount"),
        col("discount_pct"), col("p_brand"), col("p_type"), col("s_name"),
        col("s_nationkey"))
  }

  def j2FactBuild(spark: SparkSession, dir: String): DataFrame =
    factBuild(spark, dir).orderBy("l_orderkey", "l_linenumber")

  /** A1: SELECT DISTINCT dimension (dim_products.sql analog). */
  def a1DistinctDim(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select("p_brand", "p_type")
      .distinct()
      .orderBy("p_brand", "p_type")

  /** A2+O1: category rollup — COUNT(DISTINCT), AVG, ORDER BY count DESC
    * (mart_category_distribution.sql analog, p_brand as the category).
    */
  def a2CategoryRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .filter(col("p_brand").isNotNull)
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("l_partkey")).as("product_count"),
        avgMoney(col("l_extendedprice")).as("avg_regular_price"),
        round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("avg_promo_price"))
      .orderBy(desc("product_count"), col("p_brand"))
  }

  /** J3+A3: supplier rollup with conditional distinct counts, inner-joined
    * back onto the dim (mart_location_sales.sql analog: suppliers with no
    * lineitems drop out). `when()` without otherwise yields NULL which
    * COUNT(DISTINCT ...) ignores — exact CASE-count semantics.
    */
  def supplierRollup(spark: SparkSession, dir: String): DataFrame = {
    val lf = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        countDistinct(col("l_partkey")).as("total_products"),
        countDistinct(when(col("l_returnflag") === "N", col("l_partkey")))
          .as("kept_products"),
        countDistinct(when(col("l_returnflag") === "R", col("l_partkey")))
          .as("returned_products"),
        avgMoney(col("l_extendedprice")).as("avg_price"))
    val s = Tables.supplier(spark, dir)
    s.join(lf, s("s_suppkey") === lf("l_suppkey"), "inner")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("total_products"), col("kept_products"), col("returned_products"),
        col("avg_price"))
  }

  def j3a3SupplierRollup(spark: SparkSession, dir: String): DataFrame =
    supplierRollup(spark, dir).orderBy("s_suppkey")

  /** J4: mart←dim join recovering a dim attribute (app.py:159-169 analog). */
  def j4MartDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val mart = supplierRollup(spark, dir)
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    mart.join(broadcast(n), mart("s_nationkey") === n("n_nationkey"), "left")
      .select(col("s_suppkey"), col("n_name"), col("total_products"), col("avg_price"))
      .orderBy("s_suppkey")
  }

  /** A4+O2: two-key rollup with exact percentiles
    * (mart_price_by_category.sql analog). Exact `percentile` (linear
    * interpolation) matches DuckDB PERCENTILE_CONT — never approx_percentile.
    */
  def a4PercentileRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .groupBy(col("p_brand"), col("l_returnflag"))
      .agg(
        avgMoney(col("l_extendedprice")).as("avg_regular_price"),
        round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("avg_effective_price"),
        round(avg(col("l_discount") * 100), 2).as("avg_discount_pct"),
        countDistinct(col("l_partkey")).as("product_count"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25_price"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("median_price"),
        round(percentile(col("l_extendedprice"), lit(0.75)), 4).as("p75_price"))
      .orderBy("p_brand", "l_returnflag")
  }

  /** W2: order groups by a per-group order statistic (app.py:118-124 analog:
    * categories ordered by median price desc).
    */
  def w2OrderByGroupStat(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .groupBy(col("p_brand"))
      .agg(round(median(col("l_extendedprice")), 4).as("median_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(desc("median_price"), col("p_brand"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_left_join_part"    -> (j1LeftJoinPart _),
    "j2_fact_build"        -> (j2FactBuild _),
    "j3_a3_supplier_rollup" -> (j3a3SupplierRollup _),
    "j4_mart_dim_join"     -> (j4MartDimJoin _),
    "a1_distinct_dim"      -> (a1DistinctDim _),
    "a2_category_rollup"   -> (a2CategoryRollup _),
    "a4_percentile_rollup" -> (a4PercentileRollup _),
    "w2_order_by_group_stat" -> (w2OrderByGroupStat _))

  val oracle: Map[String, String] = Map(
    "j1_left_join_part" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_type, l_extendedprice
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "j2_fact_build" ->
      """WITH prices AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(l_shipdate AS DATE) AS effective_date,
        |    l_extendedprice AS regular_price,
        |    l_extendedprice * (1 - l_discount) AS promo_price,
        |    l_extendedprice * l_discount AS discount_amount,
        |    CASE WHEN l_discount > 0 THEN round(l_discount * 100, 2) ELSE 0.0 END AS discount_pct
        |  FROM lineitem WHERE l_extendedprice > 0)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, effective_date,
        |  regular_price, promo_price, discount_amount, discount_pct,
        |  p_brand, p_type, s_name, s_nationkey
        |FROM prices
        |LEFT JOIN part ON l_partkey = p_partkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "j3_a3_supplier_rollup" ->
      """WITH lf AS (
        |  SELECT l_suppkey,
        |    COUNT(DISTINCT l_partkey) AS total_products,
        |    COUNT(DISTINCT CASE WHEN l_returnflag = 'N' THEN l_partkey END) AS kept_products,
        |    COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS returned_products,
        |    round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_price
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, s_nationkey, total_products, kept_products,
        |  returned_products, avg_price
        |FROM supplier JOIN lf ON s_suppkey = l_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "j4_mart_dim_join" ->
      """WITH lf AS (
        |  SELECT l_suppkey,
        |    COUNT(DISTINCT l_partkey) AS total_products,
        |    round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_price
        |  FROM lineitem GROUP BY l_suppkey),
        |mart AS (
        |  SELECT s_suppkey, s_nationkey, total_products, avg_price
        |  FROM supplier JOIN lf ON s_suppkey = l_suppkey)
        |SELECT s_suppkey, n_name, total_products, avg_price
        |FROM mart LEFT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "a1_distinct_dim" ->
      """SELECT DISTINCT p_brand, p_type FROM part
        |ORDER BY p_brand, p_type""".stripMargin,
    "a2_category_rollup" ->
      """SELECT p_brand,
        |  COUNT(DISTINCT l_partkey) AS product_count,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_regular_price,
        |  round(AVG(l_extendedprice * (1 - l_discount)), 2) AS avg_promo_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand IS NOT NULL
        |GROUP BY p_brand
        |ORDER BY product_count DESC, p_brand""".stripMargin,
    "a4_percentile_rollup" ->
      """SELECT p_brand, l_returnflag,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_regular_price,
        |  round(AVG(l_extendedprice * (1 - l_discount)), 2) AS avg_effective_price,
        |  round(AVG(l_discount * 100), 2) AS avg_discount_pct,
        |  COUNT(DISTINCT l_partkey) AS product_count,
        |  round(MIN(l_extendedprice), 2) AS min_price,
        |  round(MAX(l_extendedprice), 2) AS max_price,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_price,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand, l_returnflag
        |ORDER BY p_brand, l_returnflag""".stripMargin,
    "w2_order_by_group_stat" ->
      """SELECT p_brand,
        |  round(median(l_extendedprice), 4) AS median_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY median_price DESC, p_brand""".stripMargin)
}
