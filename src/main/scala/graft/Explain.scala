package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the given
  * query keys (or the Bench headline set by default) so partitioning /
  * pushdown / broadcast / codegen decisions can be reviewed.
  *
  * Usage: runMain graft.Explain [sfDir] [queryKey ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      def show(df: org.apache.spark.sql.DataFrame): Unit =
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      if (k == "fact_date_window") {
        // Not a SparkEntry query: materialize the Hive-partitioned fact
        // and explain the date-window scan so PartitionFilters are
        // inspectable (the partition-pruning story in SCALE.md).
        println(s"\n========== $k ==========")
        val path = Pipeline.materializeFactPartitioned(spark, sfDir,
          "/tmp/graft_explain_fact")
        show(Pipeline.factDateWindow(spark, path, "1995-01-01", "1995-02-28"))
      } else SparkEntry.queries.get(k) match {
        case Some(fn) =>
          println(s"\n========== $k ==========")
          show(fn(spark, sfDir))
        case None => println(s"\n========== $k: NOT FOUND ==========")
      }
    }
    spark.stop()
  }
}
