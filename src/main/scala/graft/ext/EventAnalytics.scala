package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the `events` stream table: funnel
  * conversion and weekly cohort retention — the aggregate shapes a
  * product data pipeline serves next to the price marts.
  *
  * Scale notes: both shuffle once on user_id (high-cardinality key), then
  * roll up to tiny outputs; the funnel's step join is per-user (no
  * cross-user fan-out). Event times are compared at µs precision
  * (`ts div 1000` on the epoch-nano Long ↔ epoch_us(CAST AS TIMESTAMP)).
  */
object EventAnalytics {

  private def withTsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts div 1000"))

  /** Funnel: signup → first purchase at-or-after the signup. One row:
    * users entering the funnel, conversions, conversion percent, median
    * hours to convert.
    */
  def xFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(Tables.events(spark, dir))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_signup"))
    val conversions = ev.filter(col("event_type") === "purchase")
      .join(signups, Seq("user_id"))
      .filter(col("ts_us") >= col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_convert"))
    signups.join(conversions, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("signup_users"),
        count(col("t_convert")).as("converted_users"),
        round(count(col("t_convert")) / count(lit(1)) * 100, 2).as("conversion_pct"),
        round(percentile((col("t_convert") - col("t_signup")) / 3600000000.0, lit(0.5)), 3)
          .as("median_hours_to_convert"))
  }

  /** Weekly cohort retention: users grouped by first-seen week; for each
    * (cohort, week-offset), how many distinct users were active.
    */
  def xRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(Tables.events(spark, dir))
      .withColumn("week",
        to_date(date_trunc("week", timestamp_micros(col("ts_us")))))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.select(col("user_id"), col("week")).distinct()
      .join(cohorts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** As-of join: each purchase matched to the user's most recent click
    * at-or-before it. Composed from built-ins as union + sorted window
    * (`last(..., ignoreNulls)` over rows-unbounded-preceding) — ONE
    * shuffle on user_id and a per-partition sort, instead of a per-user
    * range join whose fan-out is |purchases|×|clicks|. Ties at the same
    * microsecond resolve click-before-purchase, then higher event_id —
    * fully deterministic.
    */
  def xAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(Tables.events(spark, dir))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "click", col("ts_us")).as("click_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_click_id"),
        round((col("ts_us") - col("asof_click_ts")) / 60000000.0, 3)
          .as("minutes_since_click"))
      .orderBy("purchase_id")
  }

  /** Last-touch revenue attribution: each purchase's value is credited
    * to the user's most recent preceding touch event (click / view /
    * signup) within a 7-day horizon, else to 'direct'. Same single-
    * shuffle union + sorted-window shape as the as-of join (no per-user
    * range join), rolled up to revenue per channel. Revenue is summed
    * in EXACT fixed-point: trunc(value·10⁴) per purchase (multiply is
    * one correctly-rounded IEEE op, trunc is exact, and positive-value
    * floor == trunc in both engines), so the rollup is a long sum —
    * bitwise across engines and partition orders, where a double sum
    * would drift with partial-agg order (the avgMoney idiom for event
    * values).
    */
  def xAttribution(spark: SparkSession, dir: String): DataFrame = {
    val horizonUs = 7L * 24 * 3600 * 1000000L
    val ev = withTsUs(Tables.events(spark, dir))
      .filter(col("event_type").isin("click", "view", "signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("tag"),
        when(col("event_type") =!= "purchase", col("event_type")).as("touch_type"),
        when(col("event_type") =!= "purchase", col("ts_us")).as("touch_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev
      .withColumn("last_touch", last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("last_touch_ts", last(col("touch_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        when(col("last_touch_ts") >= col("ts_us") - horizonUs, col("last_touch"))
          .otherwise("direct").as("channel"),
        // cast(double as bigint) TRUNCATES toward zero in Spark — pair
        // it with the twin's trunc() (DuckDB's bare cast ROUNDS) so the
        // fixed-point step stays exact even on negative refund values.
        expr("cast(value * 10000d as bigint)").as("value_e4"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value_e4")).as("revenue_e4"))
      .orderBy("channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_funnel"           -> (xFunnel _),
    "x_retention_cohort" -> (xRetentionCohort _),
    "x_asof_join"        -> (xAsofJoin _),
    "x_attribution"      -> (xAttribution _))

  val oracle: Map[String, String] = Map(
    "x_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |signups AS (
        |  SELECT user_id, MIN(ts_us) AS t_signup
        |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
        |conversions AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t_convert
        |  FROM ev e JOIN signups s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us >= s.t_signup
        |  GROUP BY e.user_id)
        |SELECT COUNT(*) AS signup_users,
        |  COUNT(t_convert) AS converted_users,
        |  round(COUNT(t_convert) / COUNT(*) * 100, 2) AS conversion_pct,
        |  round(percentile_cont(0.5) WITHIN GROUP (
        |    ORDER BY (t_convert - t_signup) / CAST(3600000000.0 AS DOUBLE)), 3)
        |    AS median_hours_to_convert
        |FROM signups LEFT JOIN conversions USING (user_id)""".stripMargin,
    "x_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
        |    CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |    CASE WHEN event_type = 'click' THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS click_ts
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |win AS (
        |  SELECT user_id, event_id, ts_us, tag,
        |    last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
        |    last_value(click_ts IGNORE NULLS) OVER w AS asof_click_ts
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS purchase_id, user_id, asof_click_id,
        |  round((ts_us - asof_click_ts) / CAST(60000000.0 AS DOUBLE), 3) AS minutes_since_click
        |FROM win WHERE tag = 1
        |ORDER BY purchase_id""".stripMargin,
    "x_retention_cohort" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week,
        |  CAST((week - cohort_week) / 7 AS BIGINT) AS week_offset,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM active JOIN cohorts USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // Attribution twin: same sorted-window last-touch walk; revenue in
    // exact fixed-point (trunc(value·1e4) longs; DuckDB SUM(BIGINT) is
    // HUGEINT → cast back), horizon arithmetic in µs longs.
    "x_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
        |    CASE WHEN event_type <> 'purchase' THEN event_type END AS touch_type,
        |    CASE WHEN event_type <> 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS touch_ts
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'signup', 'purchase')),
        |win AS (
        |  SELECT user_id, ts_us, tag, value,
        |    last_value(touch_type IGNORE NULLS) OVER w AS last_touch,
        |    last_value(touch_ts IGNORE NULLS) OVER w AS last_touch_ts
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |attr AS (
        |  SELECT CASE WHEN last_touch_ts >= ts_us - 604800000000 THEN last_touch
        |    ELSE 'direct' END AS channel,
        |    CAST(trunc(value * 10000) AS BIGINT) AS value_e4
        |  FROM win WHERE tag = 1)
        |SELECT channel, COUNT(*) AS n_purchases,
        |  CAST(SUM(value_e4) AS BIGINT) AS revenue_e4
        |FROM attr
        |GROUP BY channel
        |ORDER BY channel""".stripMargin)
}
