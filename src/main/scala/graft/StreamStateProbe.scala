package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Measures the streaming near-dup index's state-size plateau — the
  * evidence behind SCALE.md's "state is O(buckets active within one TTL
  * horizon), not O(all history)" claim, which through round 5 was only
  * functionally spec'd (eviction works) but never MEASURED (a user sizing
  * executor memory for a streaming dedup deployment needs the plateau,
  * not the mechanism).
  *
  * Method: feed N unique documents through `StreamOps.dedupNearDupDocs`
  * (TTL = 60 simulated minutes) at a FIXED simulated arrival rate (10
  * docs/min), reading `lastProgress.stateOperators.numRowsTotal` after
  * every micro-batch. Each doc occupies 16 (band, sig) buckets while
  * inside the horizon. Because the rate is fixed, the active-horizon
  * population is the same no matter how long the stream runs — so if
  * eviction really bounds state, max state at 10N must equal max state
  * at N (a plateau), while without eviction it would be 10× (16 rows per
  * doc forever). Both `require`s encode exactly that.
  *
  * Usage: runMain graft.StreamStateProbe [nSmall] — runs N and 10N.
  * Prints one JSON line with max/final state rows at both scales.
  */
object StreamStateProbe {

  /** "ingest" mode — state SIZING for the composed one-topology ingest
    * gates (ingestDocsFull / ingestVectors). Unlike the TTL'd operators
    * above, admission state is PERMANENT by design (a frozen gate must
    * remember every verdict it issued — re-admitting a replayed doc
    * would flip downstream corpora), so the claim to measure is not a
    * plateau but the SLOPE: exactly ONE state row per ingested doc
    * (resp. per distinct vector content), at a fixed byte cost — the
    * executor-memory sizing input for a 100 TB ingest (state rows ∝
    * corpus, so a deployment budgets bytes/doc × docs, sharded by the
    * state store the same way the data shuffles). Both structural
    * gates are `require`d: state rows == docs ingested (== distinct
    * contents for vectors, dups and replays adding NOTHING), and the
    * probe prints measured bytes/row for the record.
    *
    * Usage: runMain graft.StreamStateProbe ingest [nDocs] [nVecs]
    */
  private def ingestMain(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 5000
    val nVecs = if (args.length > 1) args(1).toInt else 5000
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Frozen admission state from the SAME trainers the shelf ships —
    // sf0.001-sized, localCheckpointed so micro-batches re-join a
    // materialized static side instead of re-running trainer chains.
    val (_, spanIdx0) = ext.Dedup.spanAdmitState(spark, sf)
    val spanIdx = spanIdx0.localCheckpoint()
    val hubFps = ext.TextAnalysis.boilerplateHubIndex(spark, sf)
      .localCheckpoint()
    val winnowIdx = ext.TextAnalysis.winnowAdmitState(spark, sf)._2
      .localCheckpoint()
    val cuts = ext.TextAnalysis
      .mixCuts(ext.TextAnalysis.wsMixToks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rates = ext.TextAnalysis.sampleRates(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (ratios, unseen, cutW, cutId) = ext.Selection.dsirFrozen(spark, sf)
    val ratiosDf = ratios.toSeq.toDF("tok", "ln_ratio").localCheckpoint()
    val nb = ext.Selection.nbFrozen(spark, sf)
    val nbMeta = nb.map { case (c, p, d, _) => (c, p, d) }
    val termsDf = nb.flatMap { case (c, _, _, t) =>
      t.toSeq.map { case (tok, v) => (c, tok, v) } }
      .toDF("cls", "tok", "term").localCheckpoint()
    val cents = ext.Similarity.knnAdmitState(spark, sf)._2
    val cbs = ext.Similarity.pqAdmitState(spark, sf)._2
    val evalIndex = ext.Similarity.contaminationEvalIndex(spark, sf)
      .localCheckpoint()

    def stateOf(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Long, Long) = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) (0L, 0L)
      else (p.stateOperators(0).numRowsTotal,
        p.stateOperators(0).memoryUsedBytes)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Doc gate: n synthetic docs (base-lang so the mix branch is live),
    // fed in id order, then ONE full replay — rows must not move.
    val (docGate, docSecs) = timed {
      val input = MemoryStream[streaming.StreamOps.IngestDoc]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ingest_probe_docs").toString
      val q = streaming.StreamOps.ingestDocsFull(input.toDS(), spanIdx,
          hubFps, winnowIdx, cuts, rates, ratiosDf, unseen, cutW, cutId,
          nbMeta, termsDf)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt).start()
      val t0 = new Timestamp(1700000000000L)
      def doc(k: Int) = streaming.StreamOps.IngestDoc(1000000L + k, t0,
        s"alpha$k beta$k gamma row scan key value part $k", "en")
      var i = 0
      while (i < nDocs) {
        val hi = math.min(i + 500, nDocs)
        input.addData((i until hi).map(doc): _*)
        q.processAllAvailable()
        i = hi
      }
      val (rows, bytes) = stateOf(q)
      input.addData((0 until math.min(500, nDocs)).map(doc): _*)
      q.processAllAvailable()
      val (rowsReplay, _) = stateOf(q)
      q.stop()
      (rows, bytes, rowsReplay)
    }
    // Vector gate: 90% distinct contents + 10% exact dups, then a
    // replayed batch — state rows must equal DISTINCT contents both
    // times (dups and replays share or skip existing state).
    val (vecGate, vecSecs) = timed {
      val input = MemoryStream[streaming.StreamOps.VecIn]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ingest_probe_vecs").toString
      val q = streaming.StreamOps
        .ingestVectors(input.toDS(), cents, cbs, evalIndex)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt).start()
      def vec(k: Int): streaming.StreamOps.VecIn = {
        // every 10th vector duplicates its predecessor's content
        val g = if (k % 10 == 9) k - 1 else k
        streaming.StreamOps.VecIn(1000000L + k, Array.tabulate(64) { j =>
          (((g * 64 + j) * 2654435761L % 1000003L).toFloat / 500001.5f) - 1f
        })
      }
      val distinct = (0 until nVecs).count(k => k % 10 != 9)
      var i = 0
      while (i < nVecs) {
        val hi = math.min(i + 500, nVecs)
        input.addData((i until hi).map(vec): _*)
        q.processAllAvailable()
        i = hi
      }
      val (rows, bytes) = stateOf(q)
      input.addData((0 until math.min(500, nVecs)).map(vec): _*)
      q.processAllAvailable()
      val (rowsReplay, _) = stateOf(q)
      q.stop()
      (rows, bytes, rowsReplay, distinct.toLong)
    }
    val (dRows, dBytes, dReplay) = docGate
    val (vRows, vBytes, vReplay, vDistinct) = vecGate
    println(s"""{"probe":"ingest_gate_state","n_docs":$nDocs,""" +
      s""""doc_state_rows":$dRows,"doc_state_bytes":$dBytes,""" +
      f""""doc_bytes_per_row":${dBytes.toDouble / math.max(1L, dRows)}%.1f,""" +
      s""""doc_rows_after_replay":$dReplay,""" +
      f""""doc_ingest_per_s":${nDocs / docSecs}%.0f,""" +
      s""""n_vecs":$nVecs,"vec_distinct":$vDistinct,""" +
      s""""vec_state_rows":$vRows,"vec_state_bytes":$vBytes,""" +
      f""""vec_bytes_per_row":${vBytes.toDouble / math.max(1L, vRows)}%.1f,""" +
      s""""vec_rows_after_replay":$vReplay,""" +
      f""""vec_ingest_per_s":${nVecs / vecSecs}%.0f}""")
    require(dRows == nDocs.toLong && dReplay == nDocs.toLong,
      s"doc gate state must be exactly one row per ingested doc " +
        s"(got $dRows/$dReplay for $nDocs, replay must add nothing)")
    require(vRows == vDistinct && vReplay == vDistinct,
      s"vector gate state must be one row per DISTINCT content " +
        s"(got $vRows/$vReplay for $vDistinct distinct)")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("ingest")) return ingestMain(args.drop(1))
    val nSmall = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder()
      .master("local[8]")
      // keyed state shuffles once per micro-batch; small partition count
      // keeps per-batch overhead low so the probe runs hundreds of
      // batches in minutes (state semantics are partition-independent)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ttlMs = 60L * 60 * 1000 // 60-minute dedup horizon
    val docsPerSimMinute = 10
    val docsPerBatch = 200 // = 20 simulated minutes per micro-batch

    def run(n: Int, tag: String): (Long, Long) = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[streaming.StreamOps.DocIn]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_state_probe_$tag").toString
      val q = streaming.StreamOps.dedupNearDupDocs(input.toDS(), ttlMs)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt)
        .start()
      val t0 = 1700000000000L
      var maxState = 0L
      var finalState = 0L
      var i = 0
      while (i < n) {
        val hi = math.min(i + docsPerBatch, n)
        // 5 unique words -> 3 word-3-grams -> one signature, 16 buckets;
        // texts are all distinct so buckets don't coalesce across docs.
        input.addData((i until hi).map { k =>
          streaming.StreamOps.DocIn(k.toLong,
            new Timestamp(t0 + (k / docsPerSimMinute) * 60000L),
            s"alpha$k beta$k gamma$k delta$k epsilon$k")
        }: _*)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          finalState = p.stateOperators(0).numRowsTotal
          if (finalState > maxState) maxState = finalState
        }
        i = hi
      }
      q.stop()
      (maxState, finalState)
    }

    /** Generic plateau runner for the per-user keyed operators: feeds n
      * synthetic events (one user per event, ts advancing at a fixed
      * simulated rate) through `op`, sampling numRowsTotal per batch.
      * With the rate fixed, the population inside the operator's horizon
      * (7-day attribution horizon / 30-min session gap) is constant, so
      * a 10× longer stream must NOT grow peak state — state is O(active
      * users in one horizon), not O(users ever seen).
      */
    def runUsers(n: Int, tag: String, msPerUser: Long,
        eventType: String,
        op: org.apache.spark.sql.Dataset[streaming.StreamOps.Event] =>
           org.apache.spark.sql.Dataset[_]): (Long, Long) = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[streaming.StreamOps.Event]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_state_probe_$tag").toString
      val q = op(input.toDS())
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt)
        .start()
      val t0 = 1700000000000L
      var maxState = 0L
      var finalState = 0L
      var i = 0
      val perBatch = 200
      while (i < n) {
        val hi = math.min(i + perBatch, n)
        input.addData((i until hi).map { k =>
          streaming.StreamOps.Event(k.toLong,
            new Timestamp(t0 + k * msPerUser), k.toLong, eventType, 1.5)
        }: _*)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          finalState = p.stateOperators(0).numRowsTotal
          if (finalState > maxState) maxState = finalState
        }
        i = hi
      }
      q.stop()
      (maxState, finalState)
    }

    val (max1, fin1) = run(nSmall, "x1")
    val (max10, fin10) = run(nSmall * 10, "x10")
    // Attribution: one click per user, users arriving at a fixed 100/
    // simulated-day rate; a touch is evictable once the 7-day horizon
    // passes, so active state ≈ 700 users + batch-boundary slack at ANY
    // stream length.
    val attrMsPerUser = 24L * 3600 * 1000 / 100
    val (amax1, afin1) = runUsers(nSmall, "attr_x1", attrMsPerUser, "click",
      streaming.StreamOps.attribute(_))
    val (amax10, afin10) = runUsers(nSmall * 10, "attr_x10", attrMsPerUser,
      "click", streaming.StreamOps.attribute(_))
    // Sessionize: one event per user at 10 users/simulated-minute; the
    // 30-min inactivity gap bounds active state ≈ 300 users.
    val sessMsPerUser = 60000L / 10
    val (smax1, sfin1) = runUsers(nSmall, "sess_x1", sessMsPerUser, "view",
      streaming.StreamOps.sessionize(_))
    val (smax10, sfin10) = runUsers(nSmall * 10, "sess_x10", sessMsPerUser,
      "view", streaming.StreamOps.sessionize(_))
    println(s"""{"probe":"stream_neardup_state","ttl_min":60,"rate_docs_per_min":$docsPerSimMinute,""" +
      s""""n_x1":$nSmall,"max_state_x1":$max1,"final_state_x1":$fin1,""" +
      s""""n_x10":${nSmall * 10},"max_state_x10":$max10,"final_state_x10":$fin10,""" +
      s""""unbounded_would_be_x10":${16L * nSmall * 10},""" +
      s""""attr_max_state_x1":$amax1,"attr_final_x1":$afin1,""" +
      s""""attr_max_state_x10":$amax10,"attr_final_x10":$afin10,""" +
      s""""sess_max_state_x1":$smax1,"sess_final_x1":$sfin1,""" +
      s""""sess_max_state_x10":$smax10,"sess_final_x10":$sfin10}""")
    // Plateau: 10x the stream length must not grow peak state (1.5x slack
    // for micro-batch boundary effects), and peak state must sit far
    // below the no-eviction bound of 16 rows per doc ever seen.
    require(max10 <= (max1 * 1.5).toLong,
      s"state did not plateau: max at 10x = $max10 vs $max1 at 1x")
    require(max10 <= 16L * nSmall * 10 / 4,
      s"peak state $max10 is within 4x of the unbounded bound — TTL eviction suspect")
    // Same gates for the per-user operators: peak state bounded by the
    // horizon population (users ever seen would be n, 10n).
    require(amax10 <= (amax1 * 3 / 2),
      s"attribution state did not plateau: $amax10 at 10x vs $amax1 at 1x")
    require(amax10 <= (nSmall * 10L) / 4,
      s"attribution peak $amax10 within 4x of unbounded (one row per user ever)")
    require(smax10 <= (smax1 * 3 / 2),
      s"sessionize state did not plateau: $smax10 at 10x vs $smax1 at 1x")
    require(smax10 <= (nSmall * 10L) / 4,
      s"sessionize peak $smax10 within 4x of unbounded (one row per user ever)")
    spark.stop()
  }
}
