package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Spark-native generator for kroger-shaped raw data —
  * distributed data generation via spark.range + hash-derived columns (no
  * driver-side loops, no RNG state): the same ids always produce the same
  * rows, at any parallelism, at any scale.
  *
  * Shapes match FIXTURES.md §A / main_pipeline.py DDL, including the
  * dirty-data paths the staging models must handle: null promo prices,
  * promo ≥ regular (discount→0 branch), non-positive regular prices
  * (filtered), malformed date strings (TRY_CAST→null), null brands, and
  * unknown stock levels.
  */
object KrogerDataGen {

  private def h(seed: Int, cols: org.apache.spark.sql.Column*) =
    abs(xxhash64((lit(seed) +: cols): _*))

  /** Flattened raw product_prices-ish rows (post-ingest shape), nProducts
    * × nLocations grain with a composite (product_id, location_id,
    * item_id) key.
    */
  def rawPrices(spark: SparkSession, nProducts: Long, nLocations: Int): DataFrame = {
    val base = spark.range(nProducts * nLocations)
      .withColumn("pid", col("id") % nProducts)
      .withColumn("lid", expr(s"id div $nProducts"))
    base.select(
      format_string("%013d", col("pid")).as("product_id"),
      format_string("%08d", col("lid")).as("location_id"),
      format_string("%013d", col("pid")).as("item_id"),
      concat((h(1, col("id")) % 32 + 1).cast("string"), lit(" oz")).as("size"),
      // ~5% non-positive regular prices (staging must filter them)
      when(h(2, col("id")) % 20 === 0, lit(0.0))
        .otherwise(round((h(3, col("id")) % 10000) / 100.0 + 0.99, 2))
        .as("regular_price"),
      // ~40% promo, sometimes above regular (discount_pct → 0 branch)
      when(h(4, col("id")) % 5 < 2,
        round((h(5, col("id")) % 11000) / 100.0 + 0.49, 2)).as("promo_price"),
      // ~10% malformed date strings (TRY_CAST → null)
      when(h(6, col("id")) % 10 === 0, lit("not-a-date"))
        .otherwise(concat(lit("2026-0"), (h(7, col("id")) % 9 + 1).cast("string"),
          lit("-"), format_string("%02d", h(8, col("id")) % 28 + 1)))
        .as("effective_date"),
      lit("2026-12-31").as("expiration_date"),
      (h(9, col("id")) % 2 === 0).as("fulfillment_instore"),
      (h(10, col("id")) % 3 === 0).as("fulfillment_delivery"),
      (h(11, col("id")) % 4 === 0).as("fulfillment_curbside"),
      (h(12, col("id")) % 5 === 0).as("fulfillment_shiptohome"),
      element_at(array(lit("HIGH"), lit("LOW"), lit("TEMPORARILY_OUT_OF_STOCK"),
        lit("MYSTERY_LEVEL")), (h(13, col("id")) % 4 + 1).cast("int")).as("stock_level"),
      to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))
  }

  /** Flattened raw products (one per product id; ~3% null brands,
    * categories as a JSON string array like json.dumps produced).
    */
  def rawProducts(spark: SparkSession, nProducts: Long): DataFrame = {
    val cats = array(lit("produce"), lit("dairy"), lit("bakery"), lit("meat"),
      lit("frozen"), lit("pantry"), lit("beverages"), lit("snacks"))
    spark.range(nProducts).select(
      format_string("%013d", col("id")).as("product_id"),
      concat(lit("Product "), col("id").cast("string")).as("description"),
      when(h(20, col("id")) % 33 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("Brand#"), (h(21, col("id")) % 25).cast("string")))
        .as("brand"),
      to_json(array(element_at(cats, (h(22, col("id")) % 8 + 1).cast("int")),
        element_at(cats, (h(23, col("id")) % 8 + 1).cast("int"))))
        .as("categories"),
      to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))
  }

  /** Flattened raw locations (~4% null latitude — staging filters them). */
  def rawLocations(spark: SparkSession, nLocations: Int): DataFrame = {
    val states = array(lit("OH"), lit("KY"), lit("TX"), lit("CA"), lit("WA"))
    spark.range(nLocations).select(
      format_string("%08d", col("id")).as("location_id"),
      concat(lit("Store "), col("id").cast("string")).as("name"),
      lit("Kroger").as("chain"),
      concat(col("id").cast("string"), lit(" Main St")).as("address_line1"),
      concat(lit("City"), (h(30, col("id")) % 40).cast("string")).as("city"),
      element_at(states, (h(31, col("id")) % 5 + 1).cast("int")).as("state"),
      format_string("%05d", h(32, col("id")) % 100000).as("zip_code"),
      when(h(33, col("id")) % 25 === 0, lit(null).cast("double"))
        .otherwise(round(lit(25.0) + (h(34, col("id")) % 2000) / 100.0, 4))
        .as("latitude"),
      round(lit(-125.0) + (h(35, col("id")) % 5500) / 100.0, 4).as("longitude"),
      to_timestamp(lit("2026-06-01 00:00:00")).as("fetched_at"))
  }
}
