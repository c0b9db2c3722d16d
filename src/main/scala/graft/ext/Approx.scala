package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregation fallbacks for the statistics that stop scaling
  * exactly at 100 TB: HyperLogLog++ distinct counts and t-digest-style
  * quantiles (SCALE.md §Aggregations). The sketch halves have no SQL
  * oracle — sketch algorithms are engine-specific; the spec bounds their
  * relative error against the exact values computed in the same query.
  * The EXACT halves are split into their own oracle-gated query
  * (`x_approx_stats_exact`) so the hash-checkable surface is actually
  * hash-checked — only the by-definition-engine-native sketches stay
  * rows-only.
  */
object Approx {

  /** Exact vs approximate distinct counts and medians per return flag.
    * Spec-gated (relative error bounds), not oracle-gated: the HLL++ and
    * t-digest values have no cross-engine twin.
    */
  def xApproxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_distinct"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_distinct"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("exact_median"),
        round(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)), 4)
          .as("approx_median"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** The exact half alone — distinct count, interpolated median (rounded
    * to 4 decimals, the a4 idiom), row count per return flag — which IS
    * cross-engine-checkable, so it gets a DuckDB twin and the bitwise
    * gate.
    */
  def xApproxStatsExact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_distinct"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("exact_median"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_approx_stats" -> (xApproxStats _),
    "x_approx_stats_exact" -> (xApproxStatsExact _))

  val oracle: Map[String, String] = Map(
    "x_approx_stats_exact" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_distinct,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS exact_median,
        |  COUNT(1) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
