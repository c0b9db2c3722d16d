package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregation fallbacks for the statistics that stop scaling
  * exactly at 100 TB: HyperLogLog++ distinct counts and t-digest-style
  * quantiles (SCALE.md §Aggregations). No SQL oracle — sketch algorithms
  * are engine-specific; the spec bounds their relative error against the
  * exact values computed in the same query.
  */
object Approx {

  /** Exact vs approximate distinct counts and medians per return flag. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_approx_stats" -> (xApproxStats _))

  val oracle: Map[String, String] = Map()
}
