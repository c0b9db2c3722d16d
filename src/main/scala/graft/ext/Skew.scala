package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the big side into `salts`
  * sub-keys and replicate the small side across every salt, so one hot key
  * spreads over `salts` tasks instead of one straggler.
  *
  * AQE's skew-join splitting covers most cases at runtime; explicit
  * salting is the deterministic fallback when a key is so hot that even a
  * split partition exceeds executor memory, or when AQE is unavailable
  * (e.g. inside a cached subtree). Join results are identical to the
  * unsalted join for equi-joins on `key`.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `salts` partitions. The small side is exploded ×salts (keep it small).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full joins would emit the exploded small-side replicas as
    // extra null-extended rows — only big-side-preserving joins are sound.
    val ok = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(ok.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "_")),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then merge per key — the manual form of Spark's partial aggregation,
    * useful when a custom aggregation can't map-side combine.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
