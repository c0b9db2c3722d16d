package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dbt models over the ACTUAL kroger-shaped schema —
  * staging views, dims, fact, and marts exactly as declared in
  * dbt_pipeline_demo/models (semantics, not SQL text). Inputs are the
  * flattened raw tables produced by KrogerIngest (or KrogerDataGen).
  *
  * Staging stays lazy (dbt views); callers materialize dims/fact/marts
  * (dbt tables) as they choose — same tiering as Pipeline.
  */
object KrogerModels {

  /** stg_locations (stg_locations.sql:1-13): null-guard projection. */
  def stgLocations(rawLocations: DataFrame): DataFrame =
    rawLocations
      .filter(col("location_id").isNotNull && col("latitude").isNotNull)
      .select("location_id", "name", "chain", "city", "state", "zip_code",
        "latitude", "longitude", "fetched_at")

  /** stg_products (stg_products.sql): first JSON category + null guard. */
  def stgProducts(rawProducts: DataFrame): DataFrame =
    rawProducts
      .filter(col("product_id").isNotNull)
      .select(col("product_id"), col("description"), col("brand"),
        get_json_object(col("categories"), "$[0]").as("primary_category"),
        col("fetched_at"))
      .dropDuplicates("product_id")

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

  /** dim_products / dim_locations (SELECT DISTINCT / projection). */
  def dimProducts(stgProducts: DataFrame): DataFrame =
    stgProducts.select("product_id", "description", "brand", "primary_category")
      .dropDuplicates("product_id")

  def dimLocations(stgLocations: DataFrame): DataFrame =
    stgLocations.select("location_id", "name", "chain", "city", "state",
      "zip_code", "latitude", "longitude")
      .dropDuplicates("location_id")

  /** fact_prices (fact_prices.sql:22-24): left joins keep every price row. */
  def factPrices(stgPrices: DataFrame, dimProducts: DataFrame,
      dimLocations: DataFrame): DataFrame =
    stgPrices
      .join(broadcast(dimProducts.select(col("product_id"),
        col("primary_category").as("category"), col("brand"))),
        Seq("product_id"), "left")
      .join(broadcast(dimLocations.select("location_id", "city", "state", "zip_code")),
        Seq("location_id"), "left")

  /** mart_category_distribution (mart_category_distribution.sql:1-9). */
  def martCategoryDistribution(factPrices: DataFrame): DataFrame =
    factPrices
      .filter(col("category").isNotNull)
      .groupBy(col("category"))
      .agg(countDistinct(col("product_id")).as("product_count"),
        round(avg(col("regular_price")), 2).as("avg_regular_price"),
        round(avg(col("promo_price")), 2).as("avg_promo_price"))
      .orderBy(desc("product_count"), col("category"))

  /** mart_location_sales (mart_location_sales.sql:1-24): conditional
    * distinct counts per store, inner join back onto the dim.
    */
  def martLocationSales(factPrices: DataFrame, dimLocations: DataFrame): DataFrame = {
    val lf = factPrices.groupBy(col("location_id")).agg(
      countDistinct(when(col("fulfillment_instore") || col("fulfillment_curbside"),
        col("product_id"))).as("physical_products"),
      countDistinct(when(col("fulfillment_delivery") || col("fulfillment_shiptohome"),
        col("product_id"))).as("online_products"),
      countDistinct(col("product_id")).as("total_products"),
      round(avg(col("regular_price")), 2).as("avg_price"))
    dimLocations.join(lf, Seq("location_id"), "inner")
      .select("location_id", "name", "city", "state", "zip_code",
        "physical_products", "online_products", "total_products", "avg_price")
  }

  /** mart_price_by_category (mart_price_by_category.sql:1-16): two-key
    * rollup with exact percentiles.
    */
  def martPriceByCategory(factPrices: DataFrame): DataFrame =
    factPrices
      .filter(col("category").isNotNull && col("effective_date").isNotNull)
      .groupBy(col("category"), col("effective_date"))
      .agg(
        round(avg(col("regular_price")), 2).as("avg_regular_price"),
        round(avg(coalesce(col("promo_price"), col("regular_price"))), 2)
          .as("avg_effective_price"),
        round(avg(col("discount_pct")), 2).as("avg_discount_pct"),
        countDistinct(col("product_id")).as("product_count"),
        round(min(col("regular_price")), 2).as("min_price"),
        round(max(col("regular_price")), 2).as("max_price"),
        round(percentile(col("regular_price"), lit(0.25)), 4).as("p25_price"),
        round(percentile(col("regular_price"), lit(0.5)), 4).as("median_price"),
        round(percentile(col("regular_price"), lit(0.75)), 4).as("p75_price"))
      .orderBy("effective_date", "category")

  /** Rows-only gated query: the full actual-schema DAG on generated data
    * (ignores the testdata dir — the kroger path has its own distributed
    * generator). Returns the category mart; the driver checks rows exist.
    */
  def xKrogerMartDemo(spark: SparkSession, dir: String): DataFrame = {
    val stgPr = stgPrices(KrogerDataGen.rawPrices(spark, 1000, 20))
    val dimP = dimProducts(stgProducts(KrogerDataGen.rawProducts(spark, 1000)))
    val dimL = dimLocations(stgLocations(KrogerDataGen.rawLocations(spark, 20)))
    martCategoryDistribution(factPrices(stgPr, dimP, dimL))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_kroger_mart_demo" -> (xKrogerMartDemo _))

  val oracle: Map[String, String] = Map()

  /** The 16 dbt schema tests (schema.yml; SURVEY §2.11) over built models:
    * returns (check_name, n_violations) — all must be 0.
    */
  def schemaTests(stgProducts: DataFrame, stgLocations: DataFrame,
      stgPrices: DataFrame, dimP: DataFrame, dimL: DataFrame,
      fact: DataFrame, martLoc: DataFrame): DataFrame = {
    def unique(df: DataFrame, k: String, name: String) =
      Quality.uniqueViolations(df, k, name)
    def notNull(df: DataFrame, k: String, name: String) =
      Quality.notNullViolations(df, col(k), name)
    Seq(
      unique(stgProducts, "product_id", "stg_products_pid_unique"),
      unique(stgLocations, "location_id", "stg_locations_lid_unique"),
      unique(dimP, "product_id", "dim_products_pid_unique"),
      unique(dimL, "location_id", "dim_locations_lid_unique"),
      unique(martLoc, "location_id", "mart_location_sales_lid_unique"),
      notNull(stgProducts, "product_id", "stg_products_pid_not_null"),
      notNull(stgLocations, "location_id", "stg_locations_lid_not_null"),
      notNull(stgPrices, "product_id", "stg_prices_pid_not_null"),
      notNull(stgPrices, "location_id", "stg_prices_lid_not_null"),
      notNull(fact, "product_id", "fact_prices_pid_not_null"),
      notNull(fact, "location_id", "fact_prices_lid_not_null")
    ).reduce(_ unionByName _).orderBy("check_name")
  }
}
