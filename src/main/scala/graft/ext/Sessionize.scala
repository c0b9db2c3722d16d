package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization over the `events` table: a new session starts when
  * the gap to the previous event of the same user exceeds 30 minutes.
  * Classic lag + running-sum window pattern — one shuffle on user_id, then
  * two narrow window passes over the same partitioning (Spark reuses the
  * sort/exchange across the lag and the running sum).
  *
  * `ts` is read as epoch-nanos (Tables.eventsRaw) and truncated to µs for
  * gap arithmetic; the oracle truncates identically via epoch_us(CAST ...).
  */
object Sessionize {

  private val gapUs = 1800L * 1000 * 1000 // 30 minutes in microseconds

  /** Per-session assignment (exposed for reuse / tests). */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir) // ts arrives as Long epoch-nanos
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
  }

  /** Per-user session stats: session count, events, span of the longest
    * session in minutes.
    */
  def xSessionize(spark: SparkSession, dir: String): DataFrame =
    sessions(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_session_events"),
        round(max(col("end_us") - col("start_us")) / lit(60000000.0), 3)
          .as("max_session_minutes"))
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_sessionize" -> (xSessionize _))

  val oracle: Map[String, String] = Map(
    "x_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sessions AS (
        |  SELECT user_id, ts_us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_id
        |  FROM flagged),
        |per_session AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |    MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        |  FROM sessions GROUP BY 1, 2)
        |SELECT user_id,
        |  COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS total_events,
        |  MAX(n_events) AS max_session_events,
        |  round(MAX(end_us - start_us) / CAST(60000000.0 AS DOUBLE), 3) AS max_session_minutes
        |FROM per_session
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)
}
