package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dbt models over the ACTUAL kroger-shaped schema —
  * staging views, dims, fact, and marts exactly as declared in
  * dbt_pipeline_demo/models (semantics, not SQL text). Inputs are the
  * flattened raw tables produced by KrogerIngest (or KrogerDataGen /
  * KrogerTpch).
  *
  * Staging stays lazy (dbt views); callers materialize dims/fact/marts
  * (dbt tables) as they choose — same tiering as Pipeline.
  *
  * Float determinism: averages of 2-decimal money go through exact
  * DECIMAL(38,6) sums (see Marts.avgMoney rationale) so the DuckDB oracle
  * matches bitwise regardless of partitioning; interpolated percentiles
  * are rounded to 4 decimals per the repo-wide invariant.
  */
object KrogerModels {

  /** Exact-sum average rounded half-up to 2 decimals, entirely in integer
    * arithmetic: inputs quantize to micros via DECIMAL(38,6) (exact for
    * money, 1e-6 — below money resolution — for off-grid products like
    * price×(1−discount)), and with S = Σ micros the rounded-cent average
    * is cents = ⌊(2·S + 10⁴·n) / (2·10⁴·n)⌋. No double round() anywhere:
    * round(double, 2) is NOT engine-portable — Spark rounds the shortest
    * decimal representation (BigDecimal.valueOf) while DuckDB rounds the
    * scaled binary value, and a quotient like 70160.805 (binary
    * …80499999…) flips the last cent between them. Integer floor-div is
    * bitwise identical everywhere; 38 digits keeps 100 TB row counts from
    * overflowing the accumulator, and cents fits a long.
    * SQL twin: CAST(CAST((2 * CAST(SUM(CAST(x AS DECIMAL(38,6))) * 1000000 AS HUGEINT)
    *   + 10000 * COUNT(x)) // (20000 * COUNT(x)) AS BIGINT) AS DOUBLE) / 100
    */
  private[ops] def avgMoney6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val micros = (sum(c.cast("decimal(38,6)")) * lit(1000000L)).cast("decimal(38,0)")
    val n = count(c)
    val cents = call_function("div",
      micros * lit(2) + n * lit(10000L), n * lit(20000L))
    cents.cast("double") / lit(100)
  }

  /** stg_locations (stg_locations.sql:1-13): null-guard projection. */
  def stgLocations(rawLocations: DataFrame): DataFrame =
    rawLocations
      .filter(col("location_id").isNotNull && col("latitude").isNotNull)
      .select("location_id", "name", "chain", "city", "state", "zip_code",
        "latitude", "longitude", "fetched_at")

  /** stg_products (stg_products.sql:1-9): first JSON category + null
    * guard. No dedup here — the reference model is a plain projection
    * (uniqueness is dim_products' job, and the stg unique test watches
    * the raw feed).
    */
  def stgProducts(rawProducts: DataFrame): DataFrame =
    rawProducts
      .filter(col("product_id").isNotNull)
      .select(col("product_id"), col("description"), col("brand"),
        get_json_object(col("categories"), "$[0]").as("primary_category"),
        col("categories"), col("fetched_at"))

  /** stg_prices (stg_prices.sql:1-21): derived discount columns, tolerant
    * date casts, positive-price filter.
    */
  def stgPrices(rawPrices: DataFrame): DataFrame =
    rawPrices
      .filter(col("regular_price") > 0)
      .select(col("product_id"), col("location_id"), col("item_id"),
        col("size"), col("regular_price"), col("promo_price"),
        (col("regular_price") - coalesce(col("promo_price"), col("regular_price")))
          .as("discount_amount"),
        when(col("promo_price").isNotNull && col("promo_price") < col("regular_price"),
          round((col("regular_price") - col("promo_price")) / col("regular_price") * 100, 2)
            .cast("double"))
          .otherwise(0.0).as("discount_pct"),
        expr("try_cast(effective_date as date)").as("effective_date"),
        expr("try_cast(expiration_date as date)").as("expiration_date"),
        col("fulfillment_instore"), col("fulfillment_delivery"),
        col("fulfillment_curbside"), col("fulfillment_shiptohome"),
        col("stock_level"), col("fetched_at"))

  /** dim_products (dim_products.sql:1-7): row-level SELECT DISTINCT with
    * primary_category aliased to category.
    */
  def dimProducts(stgProducts: DataFrame): DataFrame =
    stgProducts.select(col("product_id"), col("description"), col("brand"),
      col("primary_category").as("category"), col("categories"))
      .distinct()

  /** dim_locations (dim_locations.sql:1-10): plain projection — the raw
    * feed is already one row per store (ingest upserts), which the
    * unique schema test asserts rather than a defensive dedup hiding.
    */
  def dimLocations(stgLocations: DataFrame): DataFrame =
    stgLocations.select("location_id", "name", "chain", "city", "state",
      "zip_code", "latitude", "longitude")

  /** fact_prices (fact_prices.sql:1-24): left joins keep every price row;
    * the reference's exact column list.
    */
  def factPrices(stgPrices: DataFrame, dimProducts: DataFrame,
      dimLocations: DataFrame): DataFrame =
    stgPrices.as("sp")
      .join(broadcast(dimProducts.as("dp")), col("sp.product_id") === col("dp.product_id"), "left")
      .join(broadcast(dimLocations.as("dl")), col("sp.location_id") === col("dl.location_id"), "left")
      .select(col("sp.product_id"), col("sp.location_id"), col("sp.item_id"),
        col("dp.description"), col("dp.brand"), col("dp.category"),
        col("dl.city"), col("dl.state"), col("dl.latitude"), col("dl.longitude"),
        col("sp.regular_price"), col("sp.promo_price"), col("sp.discount_amount"),
        col("sp.discount_pct"), col("sp.effective_date"),
        col("sp.fulfillment_instore"), col("sp.fulfillment_delivery"),
        col("sp.fulfillment_curbside"), col("sp.fulfillment_shiptohome"),
        col("sp.stock_level"))

  /** mart_category_distribution (mart_category_distribution.sql:1-9). */
  def martCategoryDistribution(factPrices: DataFrame): DataFrame =
    factPrices
      .filter(col("category").isNotNull)
      .groupBy(col("category"))
      .agg(countDistinct(col("product_id")).as("product_count"),
        avgMoney6(col("regular_price")).as("avg_regular_price"),
        avgMoney6(col("promo_price")).as("avg_promo_price"))
      .orderBy(desc("product_count"), col("category"))

  /** mart_location_sales (mart_location_sales.sql:1-24): conditional
    * distinct counts per store, inner join back onto the dim.
    */
  def martLocationSales(factPrices: DataFrame, dimLocations: DataFrame): DataFrame = {
    val lf = factPrices.groupBy(col("location_id")).agg(
      countDistinct(when(col("fulfillment_instore") || col("fulfillment_curbside"),
        col("product_id"))).as("physical_count"),
      countDistinct(when(col("fulfillment_delivery") || col("fulfillment_shiptohome"),
        col("product_id"))).as("online_count"),
      countDistinct(col("product_id")).as("total_products"),
      avgMoney6(col("regular_price")).as("avg_price"))
    dimLocations.join(lf, Seq("location_id"), "inner")
      .select("location_id", "name", "city", "state", "zip_code",
        "latitude", "longitude",
        "physical_count", "online_count", "total_products", "avg_price")
  }

  /** mart_price_by_category (mart_price_by_category.sql:1-16): two-key
    * rollup with exact percentiles; the reference keeps NULL-date groups
    * (only category IS NOT NULL AND regular_price > 0 filter).
    */
  def martPriceByCategory(factPrices: DataFrame): DataFrame =
    factPrices
      .filter(col("category").isNotNull && col("regular_price") > 0)
      .groupBy(col("category"), col("effective_date"))
      .agg(
        avgMoney6(col("regular_price")).as("avg_regular_price"),
        avgMoney6(coalesce(col("promo_price"), col("regular_price")))
          .as("avg_promo_price"),
        avgMoney6(col("discount_pct")).as("avg_discount_pct"),
        countDistinct(col("product_id")).as("product_count"),
        min(col("regular_price")).as("min_price"),
        max(col("regular_price")).as("max_price"),
        round(percentile(col("regular_price"), lit(0.25)), 4).as("q1_price"),
        round(percentile(col("regular_price"), lit(0.5)), 4).as("median_price"),
        round(percentile(col("regular_price"), lit(0.75)), 4).as("q3_price"))
      .orderBy("effective_date", "category")

  /** The 16 dbt schema tests (schema.yml:19-248; SURVEY §2.11) over built
    * models: returns (check_name, n_violations) — all must be 0.
    */
  def schemaTests(stgProducts: DataFrame, stgLocations: DataFrame,
      stgPrices: DataFrame, dimP: DataFrame, dimL: DataFrame, fact: DataFrame,
      martCat: DataFrame, martLoc: DataFrame, martPrice: DataFrame): DataFrame = {
    def unique(df: DataFrame, k: String, name: String) =
      Quality.uniqueViolations(df, k, name)
    def notNull(df: DataFrame, k: String, name: String) =
      Quality.notNullViolations(df, col(k), name)
    Seq(
      unique(stgProducts, "product_id", "stg_products_pid_unique"),
      notNull(stgProducts, "product_id", "stg_products_pid_not_null"),
      unique(stgLocations, "location_id", "stg_locations_lid_unique"),
      notNull(stgLocations, "location_id", "stg_locations_lid_not_null"),
      notNull(stgPrices, "product_id", "stg_prices_pid_not_null"),
      notNull(stgPrices, "location_id", "stg_prices_lid_not_null"),
      unique(dimP, "product_id", "dim_products_pid_unique"),
      notNull(dimP, "product_id", "dim_products_pid_not_null"),
      unique(dimL, "location_id", "dim_locations_lid_unique"),
      notNull(dimL, "location_id", "dim_locations_lid_not_null"),
      notNull(fact, "product_id", "fact_prices_pid_not_null"),
      notNull(fact, "location_id", "fact_prices_lid_not_null"),
      notNull(martCat, "category", "mart_category_distribution_category_not_null"),
      notNull(martPrice, "category", "mart_price_by_category_category_not_null"),
      unique(martLoc, "location_id", "mart_location_sales_lid_unique"),
      notNull(martLoc, "location_id", "mart_location_sales_lid_not_null")
    ).reduce(_ unionByName _).orderBy("check_name")
  }
}
