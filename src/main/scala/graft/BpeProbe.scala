package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE tokenizer-training probes — the two claims the gated 3/6-round
  * oracle pair cannot itself prove:
  *
  *  - `depth`: real vocab builds run 10³–10⁴ merge rounds, and each round
  *    stacks one `aggregate(...)` projection onto `toks`, so without
  *    lineage truncation the per-round pair-count pays re-evaluating every
  *    prior recode and plan depth grows O(K). textBpe localCheckpoints
  *    every `bpeCheckpointEvery` rounds (a reliable checkpoint on a real
  *    cluster), so per-round wall must stay ~flat in K. This mode runs
  *    K rounds, records each round's pair-count wall, and requires the
  *    second-half median within 3× of the first-half median (the 4×
  *    host-noise band from CLAUDE.md is per-query wall; medians over 8+
  *    rounds are far tighter).
  *
  *  - `utf8`: the merge loop embeds the round's top pair into a generated
  *    Spark-SQL literal (escaped via sqlLit), and the DuckDB twin
  *    recomputes its pairs in SQL; both sides must agree BITWISE on a
  *    corpus whose top pairs are accented/CJK/quote-bearing — including
  *    U+0130 İ and final-sigma Σ, where only simple_lower keeps the two
  *    engines on the same case mapping. This mode writes a planted
  *    non-ASCII documents table plus the Spark result and the oracle SQL;
  *    tools/utf8_bpe_check.py replays the SQL in DuckDB and diffs.
  *
  * Usage:
  *   runMain graft.BpeProbe depth [sfDir] [rounds]
  *   runMain graft.BpeProbe utf8 [workDir]
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("depth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "depth" =>
        val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
        val rounds = if (args.length > 2) args(2).toInt else 24
        val cadence = if (args.length > 3) args(3).toInt else 8
        depth(spark, dir, rounds, cadence)
      case "utf8" =>
        val work = if (args.length > 1) args(1) else "/tmp/graft_bpe_utf8"
        utf8(spark, work)
      case other => sys.error(s"unknown mode '$other' (depth|utf8)")
    }
    spark.stop()
  }

  private def depth(spark: SparkSession, dir: String, rounds: Int,
      cadence: Int): Unit = {
    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    val t0All = System.nanoTime()
    val df = ext.TextAnalysis.textBpe(spark, dir, rounds,
      (_, w) => walls += w, cadence)
    // Construction wall = all per-round collects PLUS the eager
    // checkpoints between them — the number that adjudicates cadence
    // choices (per-round timers alone exclude checkpoint cost).
    val buildWall = (System.nanoTime() - t0All) / 1e9
    val t0 = System.nanoTime()
    val n = df.count()
    val finalWall = (System.nanoTime() - t0) / 1e9
    // Lineage-depth evidence alongside the timings: the final plan's node
    // count must reflect only the rounds SINCE the last checkpoint, not
    // all K (an unbounded tree here is exactly the analyzer/codegen wall
    // the checkpoint cadence exists to avoid).
    val planNodes = df.queryExecution.optimizedPlan.collect { case p => p }.size
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    val done = walls.size // may stop early if the corpus merges to 1-token docs
    val (h1, h2) = walls.splitAt(done / 2)
    val (m1, m2) = (median(h1.toSeq), median(h2.toSeq))
    println(f"""{"mode":"depth","rounds_requested":$rounds,"rounds_run":$done,"cadence":$cadence,"build_wall":$buildWall%.3f,"per_round_wall":[${walls.map(w => f"$w%.3f").mkString(",")}],"median_first_half":$m1%.3f,"median_second_half":$m2%.3f,"final_action_wall":$finalWall%.3f,"plan_nodes":$planNodes,"out_rows":$n}""")
    // The flatness gate needs both halves populated (≥2 rounds each);
    // shallow runs still print the report line above.
    if (done >= 4)
      require(m2 <= 3.0 * m1 + 0.05,
        f"per-round wall grew with depth: first-half median $m1%.3f s, second-half $m2%.3f s — lineage truncation not holding")
  }

  /** Deterministic planted corpus: accented / CJK / quote-bearing vocab
    * arranged so the top merge pairs are all non-ASCII, plus raw İstanbul
    * and ΑΣ (the U+0130 / final-sigma divergence cases). ~200 docs keeps
    * the DuckDB replay instant while every round's top pair is planted.
    */
  private def utf8(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    val vocab = Vector("日本語", "プレ", "トレーニング", "héllø", "wörld",
      "l'été", "データ", "モデル", "ağaç", "über", "œuvre", "ελληνικά",
      "İstanbul", "ΑΣ", "don't", "naïve")
    // LCG so the corpus is reproducible run to run; planted bigrams give
    // each round an unambiguous non-ASCII winner.
    var seed = 1234567L
    def next(n: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % n) + n).toInt % n
    }
    val docs = (0 until 200).map { id =>
      val planted = id % 4 match {
        case 0 => "日本語 プレ トレーニング"
        case 1 => "héllø wörld 日本語 プレ"
        case 2 => "l'été über İstanbul ΑΣ"
        case _ => "日本語 プレ データ モデル"
      }
      val tail = (0 until 6).map(_ => vocab(next(vocab.size))).mkString(" ")
      val text = s"$planted $tail"
      (id.toLong, text, "multi", "planted", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val out = ext.TextAnalysis.textBpe(spark, work, 3)
    out.coalesce(1).write.mode("overwrite").parquet(s"$work/out/x_text_bpe")
    // The frozen-merge admission arm on the same planted corpus: trains
    // on the lower-id half (whose top pairs are equally non-ASCII) and
    // encodes the upper half — the UTF-8 × admission cross product.
    val admit = ext.TextAnalysis.xTextBpeAdmit(spark, work)
    admit.coalesce(1).write.mode("overwrite")
      .parquet(s"$work/out/x_text_bpe_admit")
    def esc(s: String) = s.replace("\\", "\\\\")
      .replace("\"", "\\\"").replace("\n", "\\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/out/oracle_sql.json"),
      (s"""{"x_text_bpe": "${esc(SparkEntry.oracleSql("x_text_bpe"))}",""" +
        s""" "x_text_bpe_admit": "${esc(SparkEntry.oracleSql("x_text_bpe_admit"))}"}""")
        .getBytes("UTF-8"))
    println(s"""{"mode":"utf8","work":"$work","rows":${out.count()},"admit_rows":${admit.count()}}""")
  }
}
