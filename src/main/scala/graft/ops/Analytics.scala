package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard-analytics operators: the reference's 5 charts' SQL + pandas
  * dataflows re-expressed as single Spark plans (window functions replace
  * pandas post-processing — reference portfolio_app/app.py).
  *
  * Scale notes: every pandas client-side step (share-of-group transform,
  * global medians, fillna, concat) is pushed *inside* the distributed plan:
  * Window.partitionBy for share-of-group, scalar-agg + broadcast cross join
  * for global statistics (never a single-partition global window over the
  * fact table, never a driver-side collect).
  */
object Analytics {

  /** A5: state rollup — avg-of-avgs over the mart, by design
    * (app.py:149-156 analog: nation plays state).
    */
  def a5AvgOfAvgs(spark: SparkSession, dir: String): DataFrame = {
    val mart = Marts.supplierRollup(spark, dir)
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    mart.join(broadcast(n), mart("s_nationkey") === n("n_nationkey"), "left")
      .filter(col("n_name").isNotNull)
      .groupBy(col("n_name"))
      .agg(Marts.avgMoney(col("avg_price")).as("nation_avg_price"),
        sum(col("total_products")).as("total_products"))
      .orderBy("n_name")
  }

  /** A6: two-key count (app.py:265-270 analog). */
  def a6TwoKeyCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isNotNull && col("l_linestatus").isNotNull)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A7+O3: filtered rollup + HAVING (post-agg filter) + sort on aggregate
    * (app.py:335-345 analog).
    */
  def a7FilteredHaving(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .filter(col("l_discount") > 0)
      .groupBy(col("p_brand"))
      .agg(round(avg(col("l_discount") * 100), 2).as("avg_discount_pct"),
        Marts.avgMoney(col("l_extendedprice")).as("avg_regular_price"),
        count(lit(1)).as("promo_items"))
      .filter(col("promo_items") >= 5)
      .orderBy(desc("avg_discount_pct"), col("p_brand"))
  }

  /** A8: conditional AVG / conditional COUNT — CASE-null rows excluded from
    * AVG and COUNT (app.py:383-395 analog). `when()` without otherwise is
    * deliberate (§7.5 hazard 4).
    */
  def a8ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .groupBy(col("p_brand"))
      .agg(
        round(avg(when(col("l_discount") > 0.05, col("l_discount") * 100)), 2)
          .as("avg_deep_discount_pct"),
        countDistinct(col("l_partkey")).as("product_count"),
        count(when(col("l_discount") > 0, lit(1))).as("promo_count"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= 5)
      .orderBy("p_brand")
  }

  /** A9+F8: global MIN/MAX dates + date_format labels (app.py:103-111). */
  def a9MinMaxDates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(min(to_date(col("l_shipdate"))).as("min_ship_date"),
        max(to_date(col("l_shipdate"))).as("max_ship_date"))
      .select(col("min_ship_date"), col("max_ship_date"),
        date_format(col("min_ship_date"), "MMM yyyy").as("min_label"),
        date_format(col("max_ship_date"), "MMM yyyy").as("max_label"))

  /** A10: global exact medians (app.py:432-435 analog). */
  def a10GlobalMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(round(median(col("o_totalprice")), 4).as("median_total_price"),
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25_total_price"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75_total_price"),
        count(lit(1)).as("n_orders"))

  /** A11: global max for scaling + arithmetic projection (app.py:223-224
    * bubble sizing). The scalar max is broadcast back — a 1-row cross join,
    * not a global window (which would single-partition the whole table at
    * scale).
    */
  def a11BubbleScale(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val mx = perNation.agg(max(col("n_suppliers")).as("mx"))
    perNation.crossJoin(broadcast(mx))
      .select(col("s_nationkey"), col("n_suppliers"),
        round(lit(8) + col("n_suppliers") / col("mx") * 30, 3).as("bubble_size"))
      .orderBy("s_nationkey")
  }

  /** W1: share-of-group via a partitioned window — replaces the pandas
    * groupby/transform("sum") (app.py:284-285).
    */
  def w1ShareOfGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("pct_of_flag",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("l_returnflag"))) * 100, 2))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P11: null-safe recode with pass-through fallback (app.py:277-282). */
  def p11Recode(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(
        when(col("l_returnflag") === "R", "Returned")
          .when(col("l_returnflag") === "A", "Accepted")
          .otherwise(col("l_returnflag")).as("flag_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("flag_label")

  /** P12: fillna after an outer join introduces nulls (app.py:177-178). */
  def p12FillNa(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .na.fill(Map("n_orders" -> 0L, "total_spend" -> 0.0))
      .select("c_custkey", "c_mktsegment", "n_orders", "total_spend")
      .orderBy("c_custkey")
  }

  /** U1: union of two numeric series → shared min/max (app.py:180-185). */
  def u1UnionMinMax(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_acctbal").as("bal"))
    val s = Tables.supplier(spark, dir).select(col("s_acctbal").as("bal"))
    c.unionByName(s)
      .na.drop()
      .agg(round(min(col("bal")), 2).as("min_bal"),
        round(max(col("bal")), 2).as("max_bal"),
        count(lit(1)).as("n"))
  }

  /** O4: first/last-of-array access (items[0] analog — main_pipeline.py:390). */
  def o4ElementAt(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        element_at(split(col("p_name"), " "), -1).as("last_word"))
      .orderBy("p_partkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a5_avg_of_avgs"     -> (a5AvgOfAvgs _),
    "a6_twokey_count"    -> (a6TwoKeyCount _),
    "a7_filtered_having" -> (a7FilteredHaving _),
    "a8_conditional_agg" -> (a8ConditionalAgg _),
    "a9_minmax_dates"    -> (a9MinMaxDates _),
    "a10_global_median"  -> (a10GlobalMedian _),
    "a11_bubble_scale"   -> (a11BubbleScale _),
    "w1_share_of_group"  -> (w1ShareOfGroup _),
    "p11_recode"         -> (p11Recode _),
    "p12_fillna"         -> (p12FillNa _),
    "u1_union_minmax"    -> (u1UnionMinMax _),
    "o4_element_at"      -> (o4ElementAt _))

  val oracle: Map[String, String] = Map(
    "a5_avg_of_avgs" ->
      """WITH lf AS (
        |  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS total_products,
        |    round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_price
        |  FROM lineitem GROUP BY l_suppkey),
        |mart AS (
        |  SELECT s_nationkey, total_products, avg_price
        |  FROM supplier JOIN lf ON s_suppkey = l_suppkey)
        |SELECT n_name, round(CAST(SUM(CAST(avg_price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(avg_price), 2) AS nation_avg_price,
        |  CAST(SUM(total_products) AS BIGINT) AS total_products
        |FROM mart LEFT JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IS NOT NULL
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "a6_twokey_count" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a7_filtered_having" ->
      """SELECT p_brand,
        |  round(AVG(l_discount * 100), 2) AS avg_discount_pct,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS avg_regular_price,
        |  COUNT(*) AS promo_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_discount > 0
        |GROUP BY p_brand
        |HAVING COUNT(*) >= 5
        |ORDER BY avg_discount_pct DESC, p_brand""".stripMargin,
    "a8_conditional_agg" ->
      """SELECT p_brand,
        |  round(AVG(CASE WHEN l_discount > 0.05 THEN l_discount * 100 END), 2) AS avg_deep_discount_pct,
        |  COUNT(DISTINCT l_partkey) AS product_count,
        |  COUNT(CASE WHEN l_discount > 0 THEN 1 END) AS promo_count,
        |  COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |HAVING COUNT(*) >= 5
        |ORDER BY p_brand""".stripMargin,
    "a9_minmax_dates" ->
      """SELECT MIN(CAST(l_shipdate AS DATE)) AS min_ship_date,
        |  MAX(CAST(l_shipdate AS DATE)) AS max_ship_date,
        |  strftime(MIN(CAST(l_shipdate AS DATE)), '%b %Y') AS min_label,
        |  strftime(MAX(CAST(l_shipdate AS DATE)), '%b %Y') AS max_label
        |FROM lineitem""".stripMargin,
    "a10_global_median" ->
      """SELECT round(median(o_totalprice), 4) AS median_total_price,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p25_total_price,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p75_total_price,
        |  COUNT(*) AS n_orders
        |FROM orders""".stripMargin,
    "a11_bubble_scale" ->
      """WITH per_nation AS (
        |  SELECT s_nationkey, COUNT(*) AS n_suppliers
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT s_nationkey, n_suppliers,
        |  round(8 + n_suppliers / (SELECT MAX(n_suppliers) FROM per_nation) * 30, 3) AS bubble_size
        |FROM per_nation
        |ORDER BY s_nationkey""".stripMargin,
    "w1_share_of_group" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, n,
        |  round(n / SUM(n) OVER (PARTITION BY l_returnflag) * 100, 2) AS pct_of_flag
        |FROM counts
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "p11_recode" ->
      """SELECT CASE WHEN l_returnflag = 'R' THEN 'Returned'
        |  WHEN l_returnflag = 'A' THEN 'Accepted'
        |  ELSE l_returnflag END AS flag_label, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY flag_label""".stripMargin,
    "p12_fillna" ->
      """WITH o AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    round(SUM(o_totalprice), 2) AS total_spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_mktsegment,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(total_spend, 0.0) AS total_spend
        |FROM customer LEFT JOIN o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "u1_union_minmax" ->
      """SELECT round(MIN(bal), 2) AS min_bal, round(MAX(bal), 2) AS max_bal,
        |  COUNT(*) AS n
        |FROM (SELECT c_acctbal AS bal FROM customer
        |      UNION ALL SELECT s_acctbal FROM supplier)
        |WHERE bal IS NOT NULL""".stripMargin,
    "o4_element_at" ->
      """SELECT p_partkey,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  string_split(p_name, ' ')[-1] AS last_word
        |FROM part
        |ORDER BY p_partkey""".stripMargin)
}
