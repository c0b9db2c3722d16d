package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kroger-shaped raw tables DERIVED from the TPC-H testdata, with every
  * transform expressible identically in Spark and DuckDB — this is what
  * lets the actual-schema model DAG (KrogerModels: staging → dims → fact
  * → marts → 16 schema tests) be hash-gated against a DuckDB oracle
  * instead of rows-only-attested on generated data.
  *
  * The derivation keeps the reference's dirty-data surface
  * (main_pipeline.py DDL + staging models):
  *   - ~5% non-positive regular prices      (stg filter branch)
  *   - null promos and promo ≥ regular      (discount_pct → 0 branch)
  *   - ~14% malformed date strings          (TRY_CAST → null, incl. the
  *                                           NULL-date mart group)
  *   - null brands / null category arrays   (mart category filter)
  *   - ~4% null latitudes                   (stg_locations filter →
  *                                           fact rows with null store,
  *                                           dropped by the inner-join mart)
  * Dirt is injected with key arithmetic (k % m = 0), not hashes, because
  * the oracle must reproduce it bit-for-bit in SQL.
  */
object KrogerTpch {

  /** part → raw products: JSON category array built by string concat (not
    * to_json) so the DuckDB twin is the literal same bytes.
    */
  def rawProducts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      format_string("%013d", col("p_partkey")).as("product_id"),
      col("p_name").as("description"),
      when(col("p_partkey") % 33 === 0, lit(null).cast("string"))
        .otherwise(col("p_brand")).as("brand"),
      when(col("p_partkey") % 41 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("[\""), col("p_type"), lit("\",\""),
          col("p_name"), lit("\"]")))
        .as("categories"),
      to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))

  /** supplier ⋈ nation → raw locations. Latitude/longitude are derived
    * with integer-key arithmetic then a single double divide — the same
    * IEEE ops in both engines, so no rounding is needed anywhere.
    */
  def rawLocations(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"), "inner")
      .select(
        format_string("%08d", col("s_suppkey")).as("location_id"),
        col("s_name").as("name"),
        lit("Kroger").as("chain"),
        col("n_name").as("city"),
        substring(col("n_name"), 1, 2).as("state"),
        format_string("%05d", col("s_suppkey") * 7 % 100000).as("zip_code"),
        when(col("s_suppkey") % 25 === 0, lit(null).cast("double"))
          .otherwise(lit(25.0) + (col("s_suppkey") % 2000).cast("double") / lit(100.0))
          .as("latitude"),
        (lit(-125.0) + (col("s_suppkey") % 5500).cast("double") / lit(100.0))
          .as("longitude"),
        to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))
  }

  /** lineitem → raw prices at the (product, location, linenumber) grain. */
  def rawPrices(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      format_string("%013d", col("l_partkey")).as("product_id"),
      format_string("%08d", col("l_suppkey")).as("location_id"),
      format_string("%013d", col("l_partkey")).as("item_id"),
      concat(col("l_quantity").cast("int").cast("string"), lit(" oz")).as("size"),
      when(col("l_orderkey") % 20 === 0, lit(0.0))
        .otherwise(col("l_extendedprice")).as("regular_price"),
      when(col("l_discount") > 0, col("l_extendedprice") * (lit(1) - col("l_discount")))
        .when(col("l_orderkey") % 7 === 0, col("l_extendedprice") + lit(1.0))
        .as("promo_price"),
      when(col("l_linenumber") === 7, lit("not-a-date"))
        .otherwise(col("l_shipdate").cast("date").cast("string"))
        .as("effective_date"),
      lit("2026-12-31").as("expiration_date"),
      (col("l_orderkey") % 2 === 0).as("fulfillment_instore"),
      (col("l_partkey") % 3 === 0).as("fulfillment_delivery"),
      (col("l_suppkey") % 4 === 0).as("fulfillment_curbside"),
      ((col("l_orderkey") + col("l_linenumber")) % 5 === 0).as("fulfillment_shiptohome"),
      element_at(array(lit("HIGH"), lit("LOW"), lit("TEMPORARILY_OUT_OF_STOCK"),
          lit("MYSTERY_LEVEL")),
        ((col("l_partkey") + col("l_orderkey")) % 4 + 1).cast("int")).as("stock_level"),
      to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))

  /** The built DAG layers, shared by the gated queries. */
  private def dag(spark: SparkSession, dir: String) = {
    val stgPr = KrogerModels.stgPrices(rawPrices(spark, dir))
    val stgP  = KrogerModels.stgProducts(rawProducts(spark, dir))
    val stgL  = KrogerModels.stgLocations(rawLocations(spark, dir))
    val dimP  = KrogerModels.dimProducts(stgP)
    val dimL  = KrogerModels.dimLocations(stgL)
    val fact  = KrogerModels.factPrices(stgPr, dimP, dimL)
    (stgP, stgL, stgPr, dimP, dimL, fact)
  }

  /** mart_category_distribution over the derived DAG (hash-gated). */
  def xKrogerMartDemo(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, _, _, _, fact) = dag(spark, dir)
    KrogerModels.martCategoryDistribution(fact)
  }

  /** mart_location_sales over the derived DAG (hash-gated). */
  def xKrogerMartLocSales(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, _, _, dimL, fact) = dag(spark, dir)
    KrogerModels.martLocationSales(fact, dimL).orderBy("location_id")
  }

  /** mart_price_by_category over the derived DAG (hash-gated). */
  def xKrogerMartPriceCat(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, _, _, _, fact) = dag(spark, dir)
    KrogerModels.martPriceByCategory(fact)
  }

  /** All 16 dbt schema tests over the derived DAG (hash-gated: the oracle
    * recomputes every check in SQL and both must report zero violations
    * on identical data).
    */
  def xKrogerSchemaTests(spark: SparkSession, dir: String): DataFrame = {
    val (stgP, stgL, stgPr, dimP, dimL, fact) = dag(spark, dir)
    KrogerModels.schemaTests(stgP, stgL, stgPr, dimP, dimL, fact,
      KrogerModels.martCategoryDistribution(fact),
      KrogerModels.martLocationSales(fact, dimL),
      KrogerModels.martPriceByCategory(fact))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_kroger_mart_demo"     -> (xKrogerMartDemo _),
    "x_kroger_mart_locsales" -> (xKrogerMartLocSales _),
    "x_kroger_mart_pricecat" -> (xKrogerMartPriceCat _),
    "x_kroger_schema_tests"  -> (xKrogerSchemaTests _))

  /** Shared DuckDB CTE prefix: the raw derivation + the full model DAG,
    * mirroring KrogerModels semantics (and the float-determinism idioms:
    * DECIMAL(38,6) sums for money averages, percentiles rounded to 4).
    */
  private val dagSql: String =
    """WITH raw_products AS (
      |  SELECT printf('%013d', p_partkey) AS product_id,
      |    p_name AS description,
      |    CASE WHEN p_partkey % 33 = 0 THEN NULL ELSE p_brand END AS brand,
      |    CASE WHEN p_partkey % 41 = 0 THEN NULL
      |         ELSE '["' || p_type || '","' || p_name || '"]' END AS categories
      |  FROM part),
      |raw_locations AS (
      |  SELECT printf('%08d', s_suppkey) AS location_id,
      |    s_name AS name, 'Kroger' AS chain, n_name AS city,
      |    substr(n_name, 1, 2) AS state,
      |    printf('%05d', (s_suppkey * 7) % 100000) AS zip_code,
      |    CASE WHEN s_suppkey % 25 = 0 THEN NULL
      |         ELSE CAST(25.0 AS DOUBLE) + (s_suppkey % 2000) / CAST(100.0 AS DOUBLE) END AS latitude,
      |    CAST(-125.0 AS DOUBLE) + (s_suppkey % 5500) / CAST(100.0 AS DOUBLE) AS longitude
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
      |raw_prices AS (
      |  SELECT printf('%013d', l_partkey) AS product_id,
      |    printf('%08d', l_suppkey) AS location_id,
      |    printf('%013d', l_partkey) AS item_id,
      |    CASE WHEN l_orderkey % 20 = 0 THEN CAST(0.0 AS DOUBLE) ELSE l_extendedprice END AS regular_price,
      |    CASE WHEN l_discount > 0 THEN l_extendedprice * (1 - l_discount)
      |         WHEN l_orderkey % 7 = 0 THEN l_extendedprice + CAST(1.0 AS DOUBLE)
      |         END AS promo_price,
      |    CASE WHEN l_linenumber = 7 THEN 'not-a-date'
      |         ELSE CAST(CAST(l_shipdate AS DATE) AS VARCHAR) END AS effective_date,
      |    l_orderkey % 2 = 0 AS fulfillment_instore,
      |    l_partkey % 3 = 0 AS fulfillment_delivery,
      |    l_suppkey % 4 = 0 AS fulfillment_curbside,
      |    (l_orderkey + l_linenumber) % 5 = 0 AS fulfillment_shiptohome
      |  FROM lineitem),
      |stg_products AS (
      |  SELECT product_id, description, brand,
      |    json_extract_string(categories, '$[0]') AS primary_category, categories
      |  FROM raw_products WHERE product_id IS NOT NULL),
      |stg_locations AS (
      |  SELECT location_id, name, chain, city, state, zip_code, latitude, longitude
      |  FROM raw_locations WHERE location_id IS NOT NULL AND latitude IS NOT NULL),
      |stg_prices AS (
      |  SELECT product_id, location_id, item_id, regular_price, promo_price,
      |    regular_price - COALESCE(promo_price, regular_price) AS discount_amount,
      |    CASE WHEN promo_price IS NOT NULL AND promo_price < regular_price
      |      THEN round((regular_price - promo_price) / regular_price * 100, 2)
      |      ELSE CAST(0.0 AS DOUBLE) END AS discount_pct,
      |    TRY_CAST(effective_date AS DATE) AS effective_date,
      |    fulfillment_instore, fulfillment_delivery,
      |    fulfillment_curbside, fulfillment_shiptohome
      |  FROM raw_prices WHERE regular_price > 0),
      |dim_products AS (
      |  SELECT DISTINCT product_id, description, brand,
      |    primary_category AS category, categories
      |  FROM stg_products),
      |dim_locations AS (
      |  SELECT location_id, name, chain, city, state, zip_code, latitude, longitude
      |  FROM stg_locations),
      |fact_prices AS (
      |  SELECT sp.product_id, sp.location_id, sp.item_id,
      |    dp.description, dp.brand, dp.category,
      |    dl.city, dl.state, dl.latitude, dl.longitude,
      |    sp.regular_price, sp.promo_price, sp.discount_amount, sp.discount_pct,
      |    sp.effective_date, sp.fulfillment_instore, sp.fulfillment_delivery,
      |    sp.fulfillment_curbside, sp.fulfillment_shiptohome
      |  FROM stg_prices sp
      |  LEFT JOIN dim_products dp ON sp.product_id = dp.product_id
      |  LEFT JOIN dim_locations dl ON sp.location_id = dl.location_id)""".stripMargin

  /** SQL twin of KrogerModels.avgMoney6 — see its scaladoc for why this
    * is integer floor-division instead of round(double, 2).
    */
  private def avg6(x: String): String =
    s"CAST(CAST((2 * CAST(SUM(CAST($x AS DECIMAL(38,6))) * 1000000 AS HUGEINT) " +
      s"+ 10000 * COUNT($x)) // (20000 * COUNT($x)) AS BIGINT) AS DOUBLE) / 100"

  val oracle: Map[String, String] = Map(
    "x_kroger_mart_demo" ->
      s"""$dagSql
        |SELECT category,
        |  COUNT(DISTINCT product_id) AS product_count,
        |  ${avg6("regular_price")} AS avg_regular_price,
        |  ${avg6("promo_price")} AS avg_promo_price
        |FROM fact_prices
        |WHERE category IS NOT NULL
        |GROUP BY category
        |ORDER BY product_count DESC, category""".stripMargin,
    "x_kroger_mart_locsales" ->
      s"""$dagSql,
        |lf AS (
        |  SELECT location_id,
        |    COUNT(DISTINCT CASE WHEN fulfillment_instore OR fulfillment_curbside
        |      THEN product_id END) AS physical_count,
        |    COUNT(DISTINCT CASE WHEN fulfillment_delivery OR fulfillment_shiptohome
        |      THEN product_id END) AS online_count,
        |    COUNT(DISTINCT product_id) AS total_products,
        |    ${avg6("regular_price")} AS avg_price
        |  FROM fact_prices GROUP BY location_id)
        |SELECT dl.location_id, dl.name, dl.city, dl.state, dl.zip_code,
        |  dl.latitude, dl.longitude,
        |  lf.physical_count, lf.online_count, lf.total_products, lf.avg_price
        |FROM dim_locations dl JOIN lf ON dl.location_id = lf.location_id
        |ORDER BY dl.location_id""".stripMargin,
    "x_kroger_mart_pricecat" ->
      s"""$dagSql
        |SELECT category, effective_date,
        |  ${avg6("regular_price")} AS avg_regular_price,
        |  ${avg6("COALESCE(promo_price, regular_price)")} AS avg_promo_price,
        |  ${avg6("discount_pct")} AS avg_discount_pct,
        |  COUNT(DISTINCT product_id) AS product_count,
        |  MIN(regular_price) AS min_price,
        |  MAX(regular_price) AS max_price,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY regular_price), 4) AS q1_price,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY regular_price), 4) AS median_price,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY regular_price), 4) AS q3_price
        |FROM fact_prices
        |WHERE category IS NOT NULL AND regular_price > 0
        |GROUP BY category, effective_date
        |ORDER BY effective_date, category""".stripMargin,
    "x_kroger_schema_tests" ->
      s"""$dagSql,
        |mart_category_distribution AS (
        |  SELECT category FROM fact_prices WHERE category IS NOT NULL GROUP BY category),
        |mart_price_by_category AS (
        |  SELECT category, effective_date FROM fact_prices
        |  WHERE category IS NOT NULL AND regular_price > 0
        |  GROUP BY category, effective_date),
        |mart_location_sales AS (
        |  SELECT dl.location_id
        |  FROM dim_locations dl
        |  JOIN (SELECT location_id FROM fact_prices GROUP BY location_id) lf
        |    ON dl.location_id = lf.location_id)
        |SELECT * FROM (
        |  SELECT 'stg_products_pid_unique' AS check_name,
        |    (SELECT COUNT(*) FROM (SELECT product_id FROM stg_products GROUP BY 1 HAVING COUNT(*) > 1)) AS n_violations
        |  UNION ALL SELECT 'stg_products_pid_not_null',
        |    (SELECT COUNT(*) FROM stg_products WHERE product_id IS NULL)
        |  UNION ALL SELECT 'stg_locations_lid_unique',
        |    (SELECT COUNT(*) FROM (SELECT location_id FROM stg_locations GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'stg_locations_lid_not_null',
        |    (SELECT COUNT(*) FROM stg_locations WHERE location_id IS NULL)
        |  UNION ALL SELECT 'stg_prices_pid_not_null',
        |    (SELECT COUNT(*) FROM stg_prices WHERE product_id IS NULL)
        |  UNION ALL SELECT 'stg_prices_lid_not_null',
        |    (SELECT COUNT(*) FROM stg_prices WHERE location_id IS NULL)
        |  UNION ALL SELECT 'dim_products_pid_unique',
        |    (SELECT COUNT(*) FROM (SELECT product_id FROM dim_products GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'dim_products_pid_not_null',
        |    (SELECT COUNT(*) FROM dim_products WHERE product_id IS NULL)
        |  UNION ALL SELECT 'dim_locations_lid_unique',
        |    (SELECT COUNT(*) FROM (SELECT location_id FROM dim_locations GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'dim_locations_lid_not_null',
        |    (SELECT COUNT(*) FROM dim_locations WHERE location_id IS NULL)
        |  UNION ALL SELECT 'fact_prices_pid_not_null',
        |    (SELECT COUNT(*) FROM fact_prices WHERE product_id IS NULL)
        |  UNION ALL SELECT 'fact_prices_lid_not_null',
        |    (SELECT COUNT(*) FROM fact_prices WHERE location_id IS NULL)
        |  UNION ALL SELECT 'mart_category_distribution_category_not_null',
        |    (SELECT COUNT(*) FROM mart_category_distribution WHERE category IS NULL)
        |  UNION ALL SELECT 'mart_price_by_category_category_not_null',
        |    (SELECT COUNT(*) FROM mart_price_by_category WHERE category IS NULL)
        |  UNION ALL SELECT 'mart_location_sales_lid_unique',
        |    (SELECT COUNT(*) FROM (SELECT location_id FROM mart_location_sales GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'mart_location_sales_lid_not_null',
        |    (SELECT COUNT(*) FROM mart_location_sales WHERE location_id IS NULL)
        |) ORDER BY check_name""".stripMargin)
}
