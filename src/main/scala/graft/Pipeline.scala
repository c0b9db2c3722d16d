package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's end-to-end model DAG as one runnable pipeline:
  * raw parquet → staging (lazy views) → dims + fact → marts, with marts
  * materialized full-refresh to parquet (reference: dbt_project.yml
  * materializations + `dbt run --full-refresh`,
  * portfolio_app/scripts/main_pipeline.py:463-467).
  *
  * Staging stays virtual (composed lazily, like dbt views) so its
  * predicates inline into downstream scans; dim/fact/mart are written
  * `overwrite` (idempotent rebuild). Data-quality checks (§2.11) run after
  * the build and fail the pipeline on violations, like `dbt test`.
  *
  * Usage: runMain graft.Pipeline [sfDir] [outDir]
  */
object Pipeline {

  /** Build + materialize every layer; returns the mart row counts. */
  def run(spark: SparkSession, sfDir: String, outDir: String): Map[String, Long] = {
    val layers: Seq[(String, DataFrame)] = Seq(
      "dim_parts"     -> ops.Marts.a1DistinctDim(spark, sfDir),
      "fact_prices"   -> ops.Marts.factBuild(spark, sfDir),
      "mart_category_distribution" -> ops.Marts.a2CategoryRollup(spark, sfDir),
      "mart_supplier_sales"        -> ops.Marts.supplierRollup(spark, sfDir),
      "mart_price_by_category"     -> ops.Marts.a4PercentileRollup(spark, sfDir),
      "clean_documents" -> ext.Dedup.dedupCorpus(Tables.documents(spark, sfDir)),
      "clean_documents_neardup" -> {
        val pairs = ext.Dedup.ngramJaccardPairs(spark, sfDir)
          .filter(col("jaccard") >= 0.5).select("d1", "d2")
        ext.Dedup.dedupCorpusNearDup(
          Tables.documents(spark, sfDir),
          ext.Dedup.connectedComponents(pairs)._1)
      })
    val counts = layers.map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      name -> spark.read.parquet(s"$outDir/$name").count()
    }.toMap
    val violations = ops.Quality.dqChecks(spark, sfDir)
      .filter(col("n_violations") > 0).count()
    require(violations == 0, s"$violations data-quality checks failed")
    counts
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = run(spark, sfDir, outDir)
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k: $v rows") }
    spark.stop()
  }
}
