package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's model DAG over its actual schema, driven end-to-end on
  * generated dirty data — staging filters, CASE branches, TRY_CAST nulls,
  * join survival, and the schema tests.
  */
class KrogerModelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftTest.spark

  private lazy val rawPrices = ops.KrogerDataGen.rawPrices(spark, 500, 10)
  private lazy val rawProducts = ops.KrogerDataGen.rawProducts(spark, 500)
  private lazy val rawLocations = ops.KrogerDataGen.rawLocations(spark, 10)
  private lazy val stgP = ops.KrogerModels.stgProducts(rawProducts)
  private lazy val stgL = ops.KrogerModels.stgLocations(rawLocations)
  private lazy val stgPr = ops.KrogerModels.stgPrices(rawPrices)
  private lazy val dimP = ops.KrogerModels.dimProducts(stgP)
  private lazy val dimL = ops.KrogerModels.dimLocations(stgL)
  private lazy val fact = ops.KrogerModels.factPrices(stgPr, dimP, dimL)

  test("generator is deterministic") {
    val a = ops.KrogerDataGen.rawPrices(spark, 100, 3).collect().toSet
    val b = ops.KrogerDataGen.rawPrices(spark, 100, 3).collect().toSet
    assert(a == b)
  }

  test("staging filters non-positive prices and computes discount branches") {
    assert(stgPr.filter(col("regular_price") <= 0).count() == 0)
    // promo >= regular must yield discount_pct 0 (the CASE else-branch)
    val bad = stgPr.filter(col("promo_price") >= col("regular_price")
      && col("discount_pct") =!= 0.0)
    assert(bad.count() == 0)
    // promo < regular must yield positive discount and exact amount
    val pos = stgPr.filter(col("promo_price") < col("regular_price"))
    assert(pos.filter(col("discount_pct") <= 0).count() == 0)
    assert(pos.filter(
      abs(col("discount_amount") - (col("regular_price") - col("promo_price"))) > 1e-9)
      .count() == 0)
  }

  test("try_cast nulls malformed dates, parses the rest") {
    val total = stgPr.count()
    val parsed = stgPr.filter(col("effective_date").isNotNull).count()
    assert(parsed > 0 && parsed < total, s"expected a mix, got $parsed/$total")
  }

  test("fact keeps every staged price row (left joins drop nothing)") {
    assert(fact.count() == stgPr.count())
  }

  test("json first-category extraction populates the dim") {
    assert(dimP.filter(col("primary_category").isNull).count() == 0)
    assert(dimP.count() == 500)
  }

  test("marts aggregate and schema tests pass on generated data") {
    assert(ops.KrogerModels.martCategoryDistribution(fact).count() > 0)
    val martLoc = ops.KrogerModels.martLocationSales(fact, dimL)
    assert(martLoc.count() > 0)
    assert(ops.KrogerModels.martPriceByCategory(fact).count() > 0)
    val tests = ops.KrogerModels.schemaTests(stgP, stgL, stgPr, dimP, dimL, fact,
      ops.KrogerModels.martCategoryDistribution(fact), martLoc,
      ops.KrogerModels.martPriceByCategory(fact))
    assert(tests.count() == 16)
    assert(tests.filter(col("n_violations") > 0).count() == 0)
  }

  test("stock recode maps known levels and passes unknowns through") {
    val recoded = stgPr.select(col("stock_level"),
      when(col("stock_level") === "HIGH", "In stock (high)")
        .when(col("stock_level") === "LOW", "Low stock")
        .when(col("stock_level") === "TEMPORARILY_OUT_OF_STOCK", "Out of stock")
        .otherwise(col("stock_level")).as("label"))
    assert(recoded.filter(col("stock_level") === "MYSTERY_LEVEL"
      && col("label") =!= "MYSTERY_LEVEL").count() == 0)
    assert(recoded.filter(col("label") === "In stock (high)").count() > 0)
  }
}
