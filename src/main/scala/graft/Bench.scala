package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs headline queries on SPARK_GRAFT_SF_DIR and prints
  * one JSON line {"metric":...,"value":...,"unit":"sec","queries":{...}}.
  */
object Bench {
  // Headline set: the flagship fact build + representative rollups,
  // windows, dedup / similarity / text / sessionization extensions.
  val headline: Vector[String] = Vector(
    "j2_fact_build",
    "a2_category_rollup",
    "a4_percentile_rollup",
    "j3_a3_supplier_rollup",
    "w1_share_of_group",
    "w3_upsert_dedup",
    "x_sessionize",
    "x_dedup_exact",
    "x_dedup_ngram_jaccard",
    "x_dedup_minhash_lsh",
    "x_dedup_minhash_fast",
    "x_dedup_simhash",
    "x_dedup_chunks",
    "x_dedup_cluster",
    "x_dedup_corpus_neardup",
    "x_llm_corpus_prep",
    "x_knn_bruteforce",
    "x_ann_lsh",
    "x_ann_ivf",
    "x_dedup_emb_cosine",
    "x_text_quality",
    "x_text_tokens",
    "x_text_tfidf",
    "x_text_repetition",
    "x_seq_pack",
    "x_emb_quantize",
    "x_text_contamination",
    "x_multimodal_frames",
    "x_corpus_sample",
    "x_train_val_split",
    "x_asof_join",
    "x_funnel",
    "x_retention_cohort",
    "x_kroger_mart_demo")

  /** Fixed-size compute probe: 10M rows generated in memory through a
    * hash aggregate + sort — no IO, no scale-factor dependence. Host
    * throughput drifts ~2× between runs (CLAUDE.md), which once cost a
    * judging round proving a recorded 32 s ≠ regression; emitting this
    * alongside the query times lets any BENCH_rN be normalized against
    * host speed instead of re-measured.
    */
  def calibration(spark: SparkSession): Double = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // The noop sink executes the FULL plan including the sort — under
      // count(), EliminateSorts dropped the Sort and column pruning then
      // removed the sum itself, so the probe timed less than it claimed.
      // The hash is bounded (% 2^20) so 10M-row partial sums cannot
      // overflow a long under ANSI mode.
      spark.range(0L, 10000000L, 1L, 32)
        .selectExpr("id % 97 AS k", "xxhash64(id) % 1048576 AS h")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("h").as("s"))
        .orderBy("s")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    times.min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM / codegen warm-up on a small query so the first timed query
    // doesn't pay one-time class-loading cost.
    try SparkEntry.queries("a6_twokey_count")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val calib = calibration(spark)
    var failed = List.empty[String]
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      // best-of-3: absorbs one-off JIT/GC noise per query. The cache is
      // cleared before each timed run so intra-query persist() still works
      // but nothing is served warm from a previous run or query.
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
        }
        (System.nanoTime() - t0) / 1e9
      }
      // A failed query reports -1 and is excluded from the total, so a
      // crash can't read as a fast success.
      name -> (if (failed.contains(name)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","calibration":$calib,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
