package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-layer semantics: JSON path extraction, nested flatten,
  * JSON serialization, and the keyed last-write-wins upsert.
  *
  * Reference semantics (not code):
  *   - json_extract_string(categories,'$[0]') (dbt stg_products.sql:5)
  *   - items[0] nested flatten                (main_pipeline.py:390-418)
  *   - json.dumps serialization               (main_pipeline.py:387)
  *   - INSERT OR REPLACE keyed upsert         (main_pipeline.py:326-352, 420-440)
  *
  * Scale notes: the upsert is reproduced as dedup-on-write — a window
  * row_number over the key ordered by recency, which shuffles once on the
  * key. At 100 TB the same plan holds: the shuffle is on the upsert key
  * (high cardinality → even partitions), and AQE handles skewed keys.
  */
object Ingest {

  /** P2/F5: JSON path extraction with null-on-miss semantics. */
  def p2JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.missing").as("missing_str"))
      .orderBy("event_id")

  /** P9/F6: parse JSON into a struct, access a nested field, and
    * re-serialize a struct to a JSON string (flatten + json.dumps analog).
    */
  def s6FlattenToJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_val"),
        to_json(struct(col("event_type"), col("user_id"))).as("payload_json"))
      .orderBy("event_id")

  /** W3/S5/S6: last-write-wins keyed upsert as dedup-on-write. One row per
    * (user_id, event_type), newest ts wins, event_id desc as the total
    * tiebreak (§7.5 hazard 5). ts is compared at full nanosecond precision
    * (read as epoch-nanos Long — Tables.eventsRaw).
    */
  def w3UpsertDedup(spark: SparkSession, dir: String): DataFrame = {
    // Order on µs-truncated ts: DuckDB reads the TIMESTAMP(NANOS) column
    // at µs precision, so ranking on raw nanos would tie-break differently
    // from the oracle whenever two events share a microsecond.
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(expr("ts div 1000").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy("user_id", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p2_json_extract"  -> (p2JsonExtract _),
    "s6_flatten_tojson" -> (s6FlattenToJson _),
    "w3_upsert_dedup"  -> (w3UpsertDedup _))

  val oracle: Map[String, String] = Map(
    "p2_json_extract" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS missing_str
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "s6_flatten_tojson" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  to_json(struct_pack(event_type := event_type, user_id := user_id))::VARCHAR AS payload_json
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "w3_upsert_dedup" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, value
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin)
}
