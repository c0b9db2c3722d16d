package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental mart maintenance — the 100 TB alternative to the
  * reference's `--full-refresh` rebuild (dbt_project.yml:38-40): keep the
  * mart in a *mergeable* form (sum/count/min/max per key), roll up only
  * the delta batch, and merge — O(delta + mart) instead of O(history).
  *
  * Non-additive aggregates need mergeable sketches instead: COUNT(DISTINCT)
  * → HLL (approx_count_distinct's sketch), exact percentiles → t-digest.
  * The exact marts stay available through Pipeline's full rebuild;
  * incremental is the fast path between rebuilds.
  */
object Incremental {

  private def mergeable(c: String) = Seq(
    sum(col(c)).as(s"sum_$c"),
    count(col(c)).as(s"n_$c"),
    min(col(c)).as(s"min_$c"),
    max(col(c)).as(s"max_$c"))

  /** Roll a batch up into mergeable per-key state for one value column. */
  def additiveRollup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(mergeable(valueCol).head, mergeable(valueCol).tail: _*)

  /** Merge two mergeable states (old mart + delta rollup). Associative and
    * commutative, so it also merges partial states from parallel batches.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val c = valueCol
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(s"sum_$c")).as(s"sum_$c"),
        sum(col(s"n_$c")).as(s"n_$c"),
        min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"))
  }

  /** Derive the serving view (avg etc.) from the mergeable state. */
  def finalizeView(state: DataFrame, valueCol: String): DataFrame = {
    val c = valueCol
    state.withColumn(s"avg_$c", round(col(s"sum_$c") / col(s"n_$c"), 2))
  }

  /** Mergeable distinct counts: per-key HLL sketches (binary state).
    * HLL merge is a per-register max — associative and commutative — so
    * delta sketches union into the mart sketch exactly like the additive
    * sums above; `hll_sketch_estimate` serves the approximate
    * COUNT(DISTINCT) without ever rescanning history.
    */
  def distinctSketch(df: DataFrame, keys: Seq[String], col_ : String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(col_)).as(s"hll_$col_"))

  def mergeSketches(a: DataFrame, b: DataFrame, keys: Seq[String], col_ : String): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(s"hll_$col_")).as(s"hll_$col_"))

  def estimateDistinct(state: DataFrame, col_ : String): DataFrame =
    state.withColumn(s"approx_distinct_$col_",
      hll_sketch_estimate(col(s"hll_$col_")))
}
