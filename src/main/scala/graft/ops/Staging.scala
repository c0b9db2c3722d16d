package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staging-layer operators: null-guard projections, derived price columns,
  * tolerant casts, and range predicates.
  *
  * Mirrors the reference's staging models (semantics, not code):
  *   - stg_locations null-guard     (reference: dbt models/staging/stg_locations.sql:1-13)
  *   - stg_prices derived columns   (reference: models/staging/stg_prices.sql:8-11)
  *   - TRY_CAST tolerant date parse (reference: models/staging/stg_prices.sql:12-13)
  *   - positive-price filter        (reference: models/staging/stg_prices.sql:21)
  *   - dashboard date-range filter  (reference: portfolio_app/app.py:84-113)
  *
  * All are lazy DataFrame compositions (the reference materializes staging
  * as *views* — dbt_project.yml:35-37); Catalyst inlines the predicates
  * into downstream parquet scans (pushdown by construction).
  */
object Staging {

  /** P1: null-guard projection (stg_locations analog on supplier). */
  def p1NullguardProj(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .filter(col("s_suppkey").isNotNull && col("s_acctbal").isNotNull)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")

  /** P4+P5+P7: stg_prices analog over lineitem — derived discount columns
    * with the CASE/COALESCE semantics of stg_prices.sql:8-11 and the
    * positive-price filter of stg_prices.sql:21. Pure narrow projection:
    * no shuffle; filter + pruning push into the parquet scan.
    */
  def stgPrices(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 0)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("effective_date"),
        col("l_extendedprice").as("regular_price"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("promo_price"),
        (col("l_extendedprice") * col("l_discount")).as("discount_amount"),
        when(col("l_discount") > 0, round(col("l_discount") * 100, 2))
          .otherwise(lit(0.0)).as("discount_pct"))

  def p4p5DerivedPrices(spark: SparkSession, dir: String): DataFrame =
    stgPrices(spark, dir)
      .select("l_orderkey", "l_linenumber", "regular_price", "promo_price",
        "discount_amount", "discount_pct")
      .orderBy("l_orderkey", "l_linenumber")

  /** P6: tolerant date cast — TRY_CAST(str AS DATE) null-on-malformed.
    * user_id % 14 yields month tokens 0..13: '00' and '010'..'013' are
    * malformed (→ null), '01'..'09' parse.
    */
  def p6TryCast(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        expr("try_cast(concat('2024-0', cast(user_id % 14 as string), '-15') as date)")
          .as("parsed_date"))
      .orderBy("event_id")

  /** P7: positive-measure filter as its own scan-level predicate. */
  def p7PositiveFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 25 && col("l_extendedprice") > 0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** P10: date-range predicate (BETWEEN) on a timestamp-backed date. */
  def p10DateRange(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")).between("1998-01-01", "1998-03-31")
        && col("l_extendedprice") > 0 && col("l_returnflag").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_nullguard_proj"  -> (p1NullguardProj _),
    "p4p5_derived_prices" -> (p4p5DerivedPrices _),
    "p6_trycast"         -> (p6TryCast _),
    "p7_positive_filter" -> (p7PositiveFilter _),
    "p10_daterange"      -> (p10DateRange _))

  val oracle: Map[String, String] = Map(
    "p1_nullguard_proj" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IS NOT NULL AND s_acctbal IS NOT NULL
        |ORDER BY s_suppkey""".stripMargin,
    "p4p5_derived_prices" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice AS regular_price,
        |  l_extendedprice * (1 - l_discount) AS promo_price,
        |  l_extendedprice * l_discount AS discount_amount,
        |  CASE WHEN l_discount > 0 THEN round(l_discount * 100, 2) ELSE 0.0 END AS discount_pct
        |FROM lineitem
        |WHERE l_extendedprice > 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p6_trycast" ->
      """SELECT event_id,
        |  TRY_CAST(concat('2024-0', CAST(user_id % 14 AS VARCHAR), '-15') AS DATE) AS parsed_date
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "p7_positive_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 25 AND l_extendedprice > 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p10_daterange" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_shipdate AS DATE) AS ship_date, l_extendedprice
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1998-01-01' AND DATE '1998-03-31'
        |  AND l_extendedprice > 0 AND l_returnflag IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
