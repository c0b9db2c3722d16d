package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (the reference is batch-only — SURVEY.md
  * §2.9; these are the streaming shape of its analytics, plus streaming
  * sessionization mirroring ext.Sessionize).
  *
  * Scale notes: watermark + tumbling window keeps state bounded
  * (late events beyond 10 min are dropped); sessionization state is one
  * small struct per active user key, expired by event-time timeout.
  */
object StreamOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, n_events: Int, duration_minutes: Double)

  // 30-minute inactivity gap, in µs: the batch Sessionize compares
  // ts_us gaps at µs precision (`> gapUs` starts a new session), so the
  // streaming twin must too — ms-truncated gap arithmetic diverges
  // exactly at the 30:00.000 boundary when events carry sub-ms parts.
  private val gapUs = 1800L * 1000 * 1000

  /** Watermarked tumbling-window counts per event_type — the streaming
    * form of the A6/A2 rollups.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: drop replayed events by id, with state bounded
    * by the watermark (ids older than the watermark are forgotten — the
    * streaming form of the keyed upsert's dedup guarantee).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class DocIn(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class BandHit(bucket: Long, doc_id: Long, ts: java.sql.Timestamp)
  case class BucketState(keeper: Long, lastMs: Long)
  case class DupOut(bucket: Long, kept_doc_id: Long, dup_doc_id: Long)

  /** Streaming NEAR-dup dedup: each arriving document is banded by the
    * same MinHash+LSH signature the batch operator uses (bitwise — see
    * Dedup.minhashBandKeys), and per-bucket state retains the first
    * (lowest-id within a micro-batch) document ever seen there; later
    * arrivals emit (kept, dup) candidate pairs online. The batch operator
    * answers "which docs near-duplicate each other"; this answers the
    * streaming-ingest question "is THIS new doc a near-dup of anything
    * retained so far" without re-scanning the corpus.
    *
    * State IS the online LSH index — one (keeper, lastSeen) pair per
    * occupied (band, sig) bucket, exactly what any online near-dup filter
    * must remember. At cluster scale that's 16 small entries per retained
    * doc in the state store (RocksDB-backed, partitioned by bucket key),
    * and it is BOUNDED: each bucket carries an event-time timeout `ttlMs`
    * past its last arrival (the dedup horizon), so once the watermark
    * passes keeper+TTL the bucket is evicted and the next arrival there
    * is re-admitted as keeper — exactly the semantics of "dedup against
    * the trailing TTL window", and state size is O(buckets active within
    * one horizon) instead of O(all history). A pair may be emitted once
    * per shared band — consumers treat the output as a set (the drop
    * decision is idempotent), mirroring the batch side's dropDuplicates
    * over band collisions.
    */
  def dedupNearDupDocs(docs: Dataset[DocIn],
      ttlMs: Long = 60L * 60 * 1000): Dataset[DupOut] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => graft.ext.Dedup.minhashBandKeys(d.text)
        .map(k => BandHit(k, d.doc_id, d.ts)))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateBuckets(ttlMs))
  }

  private[streaming] def updateBuckets(ttlMs: Long)(bucket: Long,
      hits: Iterator[BandHit], state: GroupState[BucketState]): Iterator[DupOut] = {
    if (state.hasTimedOut) {
      // Dedup horizon passed with no arrivals: forget the bucket; the
      // next doc landing here is re-admitted as keeper.
      state.remove()
      Iterator.empty
    } else {
      // Sort within the micro-batch so the retained doc is the minimum id
      // (matching the batch keep-lowest convention) regardless of partition
      // arrival order; across micro-batches, first-arrival wins.
      val rows = hits.toSeq
      val sorted = rows.map(_.doc_id).distinct.sorted
      val maxMs = rows.map(_.ts.getTime).max
      val out = scala.collection.mutable.Buffer[DupOut]()
      var keeper = state.getOption.map(_.keeper).getOrElse(Long.MaxValue)
      sorted.foreach { id =>
        if (keeper == Long.MaxValue) keeper = id
        else if (id != keeper) out += DupOut(bucket, keeper, id)
      }
      if (keeper != Long.MaxValue) {
        val last = math.max(maxMs, state.getOption.map(_.lastMs).getOrElse(Long.MinValue))
        state.update(BucketState(keeper, last))
        // Timeout must sit strictly past the current watermark, or Spark
        // rejects it — a straggler arriving with an old ts inside an
        // already-nearly-expired bucket keeps at least a 1 ms grace.
        state.setTimeoutTimestamp(
          math.max(last + ttlMs, state.getCurrentWatermarkMs + 1))
      }
      out.iterator
    }
  }

  case class VecTs(vec_id: Long, ts: java.sql.Timestamp,
    embedding: Array[Float])

  /** Streaming embedding near-dup admission — the online half of
    * x_dedup_emb_cosine_lsh(_admit): each arriving vector is signed by
    * the SAME 12 codegen'd hyperplane expressions the batch inverted
    * list uses (Similarity.streamBandHits — a stateless narrow map, no
    * shuffle before the state store), and the shared per-bucket state
    * machine (updateBuckets — the text near-dup path's TTL'd keeper
    * index, reused wholesale) retains the first vector seen per occupied
    * (table, signature) bucket and emits (kept, candidate-dup) pairs
    * online. Same semantics as the text arm: candidates, not verdicts —
    * the exact-cosine check is one narrow join downstream at the
    * consumer's threshold (state stores 16 bytes/bucket, not 64 floats;
    * at cosine ≥ 0.8 the signature collision probability is ≈ 1.0 across
    * 12 tables, so the candidate stream's recall is the batch arm's).
    * State is bounded by the same TTL horizon; parity with the batch
    * candidate join is spec-gated on planted near-dups.
    */
  def dedupNearDupVecs(vecs: Dataset[VecTs],
      ttlMs: Long = 60L * 60 * 1000): Dataset[DupOut] = {
    import vecs.sparkSession.implicits._
    graft.ext.Similarity.streamBandHits(vecs.toDF())
      .as[BandHit]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateBuckets(ttlMs))
  }

  /** Stateful streaming sessionization: a 30-minute inactivity gap closes a
    * session; closed sessions are emitted (Append mode). State per user is
    * one (start, last, n) triple; event-time timeout flushes idle users.
    */
  // STATE-SCHEMA COMPATIBILITY: adding eventId (r8, the same-µs tie fix)
  // changed the flatMapGroupsWithState state encoder from a 2-field to a
  // 3-field product — a deployment restarting from a checkpoint written
  // by the older shape will fail state deserialization and must restart
  // with a fresh checkpoint dir (or migrate state offline). Spark offers
  // no built-in state-schema evolution for case-class encoders; version
  // any future field change the same way.
  case class TouchState(touchType: String, tsUs: Long, eventId: Long)
  case class AttrOut(user_id: Long, purchase_id: Long, channel: String,
    value_e4: Long)

  private val attrHorizonUs = 7L * 24 * 3600 * 1000000L

  /** Scala twin of Spark's `round(double, 4)` — BigDecimal.valueOf is
    * the shortest-decimal repr, setScale HALF_UP the same rounding, so
    * a Scala-side fold rounds bitwise like the codegen'd expression
    * (the dedupSemanticOnline precedent).
    */
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  /** Event-time µs from a Timestamp: getTime carries ms, getNanos the
    * full sub-second part — combine for the same µs arithmetic the batch
    * xAttribution runs on ts_us, so same-ms/different-µs events sort and
    * compare identically to the batch window order.
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming last-touch attribution — the streaming form of
    * EventAnalytics.xAttribution: state is ONE small (touch_type, ts)
    * struct per active user (not an event buffer), expired by
    * event-time timeout once the attribution horizon passes with no new
    * touch, so state is O(users active within the horizon) regardless
    * of stream length. Each purchase emits immediately with the channel
    * decided by the latest in-horizon touch (else 'direct') and its
    * value in the same trunc(value·10⁴) fixed-point longs as the batch
    * operator. Events inside a micro-batch sort by (ts, touch-first,
    * event_id) — the batch window order — so a single-batch replay is
    * exactly batch-parity (spec-gated); cross-batch late touches are
    * bounded by the watermark like every other streaming op here.
    */
  def attribute(events: Dataset[Event]): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "view" ||
        e.event_type == "signup" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateAttribution)
  }

  private[streaming] def updateAttribution(userId: Long,
      events: Iterator[Event],
      state: GroupState[TouchState]): Iterator[AttrOut] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = scala.collection.mutable.Buffer[AttrOut]()
      var cur = state.getOption
      events.toSeq
        .sortBy(e => (tsMicros(e.ts), if (e.event_type == "purchase") 1 else 0,
          e.event_id))
        .foreach { e =>
          val t = tsMicros(e.ts)
          if (e.event_type == "purchase") {
            // Causality guard: a touch stored from a LATER micro-batch
            // arrival must never be credited for an earlier purchase —
            // last-PRECEDING-touch only, matching the batch window order.
            val channel = cur match {
              case Some(s) if s.tsUs <= t && t - s.tsUs <= attrHorizonUs =>
                s.touchType
              case _ => "direct"
            }
            // toLong truncates toward zero — same fixed-point step as the
            // batch operator's double→bigint cast
            out += AttrOut(userId, e.event_id, channel,
              (e.value * 10000d).toLong)
          } else if (cur.forall(s => s.tsUs < t ||
              (s.tsUs == t && s.eventId < e.event_id))) {
            // Out-of-order touch older than the tracked one never wins;
            // on an exactly-equal-µs tie the HIGHER event_id wins — the
            // batch window's (ts_us, tag, event_id) last-wins order —
            // independent of which micro-batch each touch arrived in.
            cur = Some(TouchState(e.event_type, t, e.event_id))
          }
        }
      cur.foreach { s =>
        state.update(s)
        // Timeout API is ms-granular; round the horizon UP so a touch is
        // never evicted while still (sub-ms) inside it.
        state.setTimeoutTimestamp(s.tsUs / 1000L + attrHorizonUs / 1000L + 1L)
      }
      out.iterator
    }
  }

  case class VecIn(vec_id: Long, embedding: Array[Float])

  /** Streaming frozen-quantizer admission — the RUNTIME shape of the
    * batch admission family (xAnnIvfAdmit etc.): the coarse centroids
    * are trained once batch-side, frozen, and embedded as literals in
    * the codegen'd nearest_centroid expression, so each arriving vector
    * is assigned to its inverted-list cell in a STATELESS narrow map —
    * no state store, no watermark, no shuffle; at cluster scale this is
    * a pure per-executor pass over the ingest stream, which is exactly
    * why admission freezes quantizer state instead of re-clustering
    * (re-training inside a stream would need a corpus-wide iterative
    * job no streaming runtime can express incrementally). Batch parity
    * is spec-gated: streaming assignments == xAnnIvfAdmit's rows.
    */
  def assignVectors(vecs: Dataset[VecIn],
      centroids: Array[Array[Double]]): DataFrame =
    vecs.select(col("vec_id"), cellExpr(centroids).as("cell"))

  /** The frozen-centroid cell assignment over an `embedding` column —
    * ONE expression behind the standalone assign surface and the
    * composed vector ingest gate (the mixKeptExpr rule).
    */
  private def cellExpr(centroids: Array[Array[Double]])
      : org.apache.spark.sql.Column =
    graft.functions.VectorFunctions
      .nearestCentroid(col("embedding"), centroids).cast("long")

  /** Streaming PQ encode — the COMPRESSION family's streaming half,
    * completing the admission matrix's streaming column (IVF-assign,
    * BPE, DSIR, NB, kNN-attach all have one): the m subspace codebooks
    * are trained ONCE batch-side (Similarity.pqAdmitState — the
    * x_ann_pq_admit artifact a production ingest freezes and versions)
    * and each arriving vector is encoded to its m codes by the SAME
    * shared codegen'd nearest_centroid pass the batch gate runs
    * (Similarity.pqEncode — one implementation, so stream and batch
    * cannot desync) as a STATELESS narrow map: no state store, no
    * watermark, no shuffle, O(batch·m·k·sub) per ingest. Re-training
    * codebooks in-stream would silently re-code every admitted vector,
    * invalidating persisted ADC structures — the frozen-quantizer
    * argument, which is the whole design of the admission family.
    * Batch parity is spec-gated code-for-code across micro-batch
    * splits (the assignVectors idiom).
    */
  def encodeVectors(vecs: Dataset[VecIn],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    graft.ext.Similarity.pqEncode(vecs.toDF(), codebooks)

  /** Streaming SQ8 encode — the scalar-quantization member of the
    * compression family's streaming column (PQ: encodeVectors): each
    * arriving vector is quantized to its int8 code list by THE ONE
    * sq8Codes expression (x_emb_quantize / the SQ8 search ops — one
    * implementation, so stream and batch cannot desync) as a STATELESS
    * narrow map — no training, no state, no shuffle; the "frozen
    * state" is the fixed ×127 grid, which is the production appeal:
    * an SQ8 column never needs quantizer versioning. The coded stream
    * is what a 100 TB ingest persists next to (or instead of) raw
    * floats — 4× smaller scans for every downstream integer-dot pass
    * (x_ann_sq8's deployed shape). Batch parity spec-gated against
    * the gated x_emb_quantize summaries across micro-batch splits.
    */
  def encodeVectorsSq8(vecs: Dataset[VecIn]): DataFrame =
    vecs.select(col("vec_id"),
      graft.ext.Similarity.sq8Codes("embedding").as("sq8_codes"))

  /** Streaming JL reduction — the dimensionality-reduction family's
    * streaming half (the encodeVectors idiom): the ±1 sign matrix is a
    * compile-time frozen artifact (no training at all — the one family
    * whose "frozen state" is free), and each arriving vector is
    * projected 64→32 by the SAME shared fixed-fold pass the gated
    * x_emb_rp_reduce relation runs (Similarity.rpProjectWide — one
    * implementation, so stream and batch cannot desync) as a STATELESS
    * narrow map: no state store, no watermark, no shuffle. The
    * projected stream is what a 100 TB ingest persists next to the raw
    * vectors: half the scan bytes for every downstream shortlist pass
    * (x_ann_rp's deployed shape). Batch parity spec-gated across
    * micro-batch splits.
    */
  def reduceVectors(vecs: Dataset[VecIn]): DataFrame =
    graft.ext.Similarity.rpProjectWide(vecs.toDF())

  case class EdgeOut(vec_id: Long, nn_rank: Long, nn_id: Long,
    cos_sim: Double)
  case class GraphCand(vec_id: Long, nn_id: Long, cos_sim: Double)

  /** Streaming kNN-graph attach — the RUNTIME half of xKnnGraphAdmit,
    * the assignVectors idiom extended one stage: each arriving vector is
    * (1) cell-assigned by the codegen'd nearest_centroid over the FROZEN
    * batch-trained centroids (stateless narrow map), (2) joined
    * stream-static against the persisted admitted inverted list on its
    * cell — the production shape: the static side is the inverted-list
    * table a 100 TB ingest keeps partitioned by cell, so each
    * micro-batch pays one bounded equi-join, never a corpus scan — and
    * (3) ranked to its top-k admitted neighbors by the SAME rounded-
    * cosine/id order as the batch gate. The rank runs in a per-vector
    * group that lives only inside the vector's own micro-batch (all of a
    * vector's candidates join in the batch it arrives; state is never
    * stored — the group function emits immediately), so the state store
    * stays empty and attachment is O(batch × cell occupancy), the
    * admission arm's cost, incrementally. Admitted edges are immutable
    * under frozen centroids, which is why attach-once is sound. Batch
    * parity is spec-gated: streamed edges == xKnnGraphAdmit's rows,
    * split across micro-batches to prove batching cannot matter.
    */
  def attachGraph(vecs: Dataset[VecIn], centroids: Array[Array[Double]],
      admitted: DataFrame, kNeighbors: Int = 5): Dataset[EdgeOut] = {
    import vecs.sparkSession.implicits._
    val vf = graft.functions.VectorFunctions
    val cands = vecs.toDF()
      .withColumn("cell", vf.nearestCentroid(col("embedding"), centroids))
      .withColumn("n1", sqrt(vf.dotProduct(col("embedding"), col("embedding"))))
      .join(admitted, Seq("cell"))
      .select(col("vec_id"), col("id2").as("nn_id"),
        round(vf.dotProduct(col("embedding"), col("v2"))
          / (col("n1") * col("n2")), 4).as("cos_sim"))
      .as[GraphCand]
    cands.groupByKey(_.vec_id)
      .flatMapGroupsWithState[Long, EdgeOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (vecId: Long, rows: Iterator[GraphCand], _: GroupState[Long]) =>
          // sparkDescKey: the NaN-ordering parity guard (see
          // searchVectors) — identical real-number order, NaN-first
          // like the batch window's DESC on degenerate inputs.
          rows.toSeq.sortBy(c => (sparkDescKey(c.cos_sim), c.nn_id))
            .take(kNeighbors).zipWithIndex.map { case (c, i) =>
              EdgeOut(vecId, i + 1L, c.nn_id, c.cos_sim) }.iterator
      }
  }

  case class SearchOut(query_id: Long, rank: Long, neighbor_id: Long,
    cosine: Double)
  case class SearchCand(query_id: Long, neighbor_id: Long, r6: Double,
    cosine: Double)

  /** Streaming ANN SEARCH — the SERVING half of the ANN family (the
    * one member every other family already had in streaming form:
    * assign/encode/attach run at ingest; this runs at QUERY time):
    * each arriving query vector walks its nProbe nearest frozen cells
    * (the codegen'd nearest_cells over the batch-trained x_ann_ivf
    * centroids — Similarity.annServeState, one construction), joins
    * stream-static against the persisted corpus inverted list on the
    * cell key — at 100 TB the static side is the cell-partitioned
    * index table, so each micro-batch of queries reads nProbe/k of the
    * corpus, never a scan — and is exactly re-ranked to its top-k by
    * the SAME (round(cosine, 6) DESC, neighbor_id) order the batch
    * rerankTopK window uses, with the rounding done by the SAME Spark
    * expressions (bitwise parity by construction, no JVM re-rounding).
    * The rank runs in a per-query group living only inside the query's
    * own micro-batch (all of a query's candidates join in its arrival
    * batch; the group emits immediately) — the attachGraph idiom: the
    * state store stays empty, results are deterministic per query, and
    * a replayed query re-emits the same rows (an upsert sink keyed on
    * (query_id, rank) absorbs at-least-once upstreams). Batch parity
    * is spec-gated: streaming the gated queries yields x_ann_ivf's
    * rows exactly, split across micro-batches.
    */
  def searchVectors(queries: Dataset[VecIn],
      centroids: Array[Array[Double]], invList: DataFrame,
      nProbe: Int = 4, kTop: Int = 5): Dataset[SearchOut] = {
    import queries.sparkSession.implicits._
    val vf = graft.functions.VectorFunctions
    val cands = queries.toDF()
      .withColumn("n1",
        sqrt(vf.dotProduct(col("embedding"), col("embedding"))))
      .select(col("vec_id").as("query_id"), col("embedding"), col("n1"),
        explode(vf.nearestCells(col("embedding"), centroids, nProbe))
          .as("cell"))
      .join(invList, Seq("cell"))
      .filter(col("query_id") =!= col("id2"))
      .withColumn("cosine_raw", vf.dotProduct(col("embedding"), col("v2"))
        / (col("n1") * col("n2")))
      .select(col("query_id"), col("id2").as("neighbor_id"),
        round(col("cosine_raw"), 6).as("r6"),
        round(col("cosine_raw"), 4).as("cosine"))
      .as[SearchCand]
    cands.groupByKey(_.query_id)
      .flatMapGroupsWithState[Long, SearchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[SearchCand], _: GroupState[Long]) =>
          // A corpus vector owns ONE cell, so each neighbor arrives at
          // most once per query; the in-group distinct is the dedup-
          // inside-the-group convention (never a stateful distinct).
          rows.toSeq.distinct
            .sortBy(c => (sparkDescKey(c.r6), c.neighbor_id))
            .take(kTop).zipWithIndex.map { case (c, i) =>
              SearchOut(qid, i + 1L, c.neighbor_id, c.cosine) }.iterator
      }
  }

  case class Sq8Cand(query_id: Long, neighbor_id: Long, idot: Long,
    r6: Double, cosine: Double)

  /** Streaming ANN search over the COMPRESSED (SQ8) inverted list —
    * the serving half of x_ann_ivfsq8, completing the serving column
    * for the index a 100 TB deployment actually ships (the r14 verdict:
    * searchVectors serves the uncompressed list; production serves
    * int8 codes): each arriving query is quantized by THE ONE sq8Codes
    * expression, walks its nProbe frozen cells, joins stream-static
    * against the cell-partitioned CODED inverted list
    * (Similarity.annServeStateSq8 — each micro-batch scans nProbe/k of
    * the corpus as 4×-smaller integer codes), shortlists per query by
    * the EXACT integer dot (portable longs — no float fold to pin,
    * x_ann_sq8's own argument), and exactly re-ranks the shortlist by
    * the batch tail's (round(cosine, 6) DESC, neighbor_id) order. Both
    * stages run inside the query's own micro-batch group (the
    * searchVectors idiom — state store stays empty, replays re-emit
    * identical rows); a candidate probed through several cells enters
    * once (in-group distinct == the batch dropDuplicates). Batch
    * parity is spec-gated: streaming the gated queries yields
    * x_ann_ivfsq8's rows exactly, split across micro-batches.
    */
  def searchVectorsSq8(queries: Dataset[VecIn],
      centroids: Array[Array[Double]], invList: DataFrame,
      nProbe: Int = 4, kTop: Int = 5,
      shortlist: Int = graft.ext.Similarity.sq8Shortlist): Dataset[SearchOut] = {
    import queries.sparkSession.implicits._
    val vf = graft.functions.VectorFunctions
    val cands = queries.toDF()
      .withColumn("n1",
        sqrt(vf.dotProduct(col("embedding"), col("embedding"))))
      .withColumn("qc", graft.ext.Similarity.sq8Codes("embedding"))
      .select(col("vec_id").as("query_id"), col("embedding"), col("n1"),
        col("qc"),
        explode(vf.nearestCells(col("embedding"), centroids, nProbe))
          .as("cell"))
      .join(invList, Seq("cell"))
      .filter(col("query_id") =!= col("id2"))
      .withColumn("idot",
        expr("aggregate(zip_with(qc, cc, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"))
      .withColumn("cosine_raw", vf.dotProduct(col("embedding"), col("v2"))
        / (col("n1") * col("n2")))
      .select(col("query_id"), col("id2").as("neighbor_id"), col("idot"),
        round(col("cosine_raw"), 6).as("r6"),
        round(col("cosine_raw"), 4).as("cosine"))
      .as[Sq8Cand]
    cands.groupByKey(_.query_id)
      .flatMapGroupsWithState[Long, SearchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[Sq8Cand], _: GroupState[Long]) =>
          // Integer shortlist (idot DESC, id — exact longs, no NaN
          // guard needed), then the exact tail's double order.
          rows.toSeq.distinct
            .sortBy(c => (-c.idot, c.neighbor_id)).take(shortlist)
            .sortBy(c => (sparkDescKey(c.r6), c.neighbor_id))
            .take(kTop).zipWithIndex.map { case (c, i) =>
              SearchOut(qid, i + 1L, c.neighbor_id, c.cosine) }.iterator
      }
  }

  /** Ascending sort key replicating Spark's DESCENDING double order
    * inside a JVM group sort: Spark's nanSafeCompare treats NaN as the
    * LARGEST double, so `ORDER BY x DESC` ranks NaN first — a negated
    * Scala TotalOrdering key would rank it last (−NaN is NaN, which
    * TotalOrdering sorts greatest). Canonicalizing NaN to +∞ before
    * negation keeps the batch-window parity exact even on degenerate
    * inputs (a zero vector's 0/0 cosine).
    */
  private def sparkDescKey(x: Double): Double =
    if (x.isNaN) Double.NegativeInfinity else -x

  case class ScreenOut(vec_id: Long, eval_id: Long, cosine: Double)

  /** Streaming contamination screen — the online half of
    * x_emb_contamination, the production shape for "reject leaking
    * examples at ingest": the EVAL holdout's banded inverted list is
    * built ONCE batch-side (Similarity.contaminationEvalIndex — frozen
    * between benchmark updates, the admission-matrix argument) and each
    * arriving TRAIN vector is signed by the same 12 codegen'd
    * hyperplane expressions, joined stream-static on the flat bucket,
    * and verified by the exact rounded cosine ≥ 0.8 — the batch gate's
    * verdict per arriving pair. A pair colliding in several tables
    * dedups INSIDE the vector's own micro-batch (the attachGraph
    * idiom: the static side is complete, so all of a pair's collisions
    * join in the batch the vector arrives). A flagged pair also SETS its
    * group state (one Long per emitted pair), so a vector re-ingested in
    * a later micro-batch — a replayed source, an at-least-once upstream
    * — cannot double-flag: idempotence is the operator's own, not a
    * once-per-id precondition on the topology. State is bounded by the
    * number of FLAGGED pairs (contamination hits, the small relation by
    * construction — leak screening exists because leaks are rare), not
    * by the stream. Runs downstream of the exact-collapse online
    * gate in a production topology (dedupVectorsExactOnline), mirroring
    * the batch clean staging. Batch parity is spec-gated: streamed
    * flags == x_emb_contamination's pairs, split across micro-batches,
    * with a replayed batch emitting nothing new.
    */
  def screenVectors(vecs: Dataset[VecIn],
      evalIndex: DataFrame,
      planes: Array[Array[Array[Double]]] =
        graft.ext.Similarity.tablePlanes): Dataset[ScreenOut] = {
    import vecs.sparkSession.implicits._
    graft.ext.Similarity.streamScreenCands(vecs.toDF(), evalIndex,
        planes = planes)
      .as[ScreenOut]
      .groupByKey(c => (c.vec_id, c.eval_id))
      .flatMapGroupsWithState[Long, ScreenOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), rows: Iterator[ScreenOut], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else { state.update(1L); rows.take(1) }
      }
  }

  case class DocScreenOut(doc_id: Long, hub_id: Long, n_shared: Long)

  /** Streaming boilerplate screen — the TEXT side's "reject at ingest"
    * gate, the screenVectors idiom aimed at templates: the flagged
    * centrality hubs' fingerprint index is built ONCE batch-side
    * (TextAnalysis.boilerplateHubIndex — selectN docs' distinct winnow
    * prints, frozen and versioned per corpus build), each arriving doc
    * is fingerprinted by the same codegen'd winnow expression, joined
    * stream-static on the print, and flagged per (doc, hub) when the
    * shared count clears the batch threshold. All of a doc's prints
    * explode inside its own micro-batch, so the count is complete when
    * the group fires (the attachGraph argument); the flagged pairs set
    * group state, so a re-ingested doc cannot double-flag (the
    * screenVectors idempotence contract). Batch parity is spec-gated:
    * streamed flags == x_text_boilerplate_screen's rows, split across
    * micro-batches, replays emitting nothing new. Hub docs themselves
    * are excluded INSIDE the operator (the batch gate left_anti-joins
    * hub ids; a hub — or an admitted doc on the winnow-admission
    * surface — fed back through the stream would otherwise self-flag
    * with rows the batch gate never emits): arriving doc_ids anti-join
    * the index's distinct hub_id set, cheap because the index is
    * broadcast-sized by construction. The threshold default is THE
    * one TextAnalysis constant (winnowShareThreshold's own contract),
    * so the streaming screen cannot silently desync from the batch
    * gate if the constant ever moves.
    */
  def screenDocsBoilerplate(docs: Dataset[DocIn], hubFps: DataFrame,
      shareThreshold: Int = graft.ext.TextAnalysis.winnowShareThreshold)
      : Dataset[DocScreenOut] = {
    import docs.sparkSession.implicits._
    hubCandRows(docs.toDF(), hubFps)
      .as[(Long, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, DocScreenOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: (Long, Long), rows: Iterator[(Long, Long)],
         state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val n = rows.size.toLong
            if (n >= shareThreshold) {
              state.update(1L)
              Iterator.single(DocScreenOut(k._1, k._2, n))
            } else Iterator.empty
          }
      }
  }

  case class LangDoc(doc_id: Long, lang: String)

  /** Streaming temperature-sampling gate — the online half of
    * x_corpus_sample, the selectDocs idiom for language rebalancing:
    * the per-language alpha=0.5 keep rates are computed ONCE batch-side
    * (TextAnalysis.sampleRates — the #langs-row artifact a production
    * gate broadcasts and versions), FROZEN, and each arriving doc's
    * membership is the batch rule verbatim — md5 id bucket below
    * rate x 10000 — as a STATELESS narrow map: no state store, no
    * watermark, no shuffle. Growth-stable by the same argument as the
    * split/sample family: membership depends only on (doc_id, frozen
    * rate), so admitted verdicts never change as the corpus grows;
    * re-estimating rates in-stream would flip earlier verdicts (the
    * frozen-quantizer argument), so production versions the rate table
    * instead. A doc whose language is absent from the frozen table is
    * never kept (null comparison -> 0), the conservative default until
    * the next batch re-estimate ships. Batch parity is spec-gated:
    * per-language kept counts replayed through the stream equal
    * xCorpusSample's rollup, split across micro-batches.
    */
  def sampleDocs(docs: Dataset[LangDoc],
      rates: Map[String, Double]): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      sampleKeptExpr(rates).as("kept"))

  /** The frozen temperature-sampling membership expression over
    * (doc_id, lang) — ONE construction behind the standalone gate and
    * the composed ingest topology (the mixKeptExpr rule).
    */
  private def sampleKeptExpr(rates: Map[String, Double])
      : org.apache.spark.sql.Column = {
    val rmap = typedlit(rates)
    when(graft.ext.TextAnalysis.md5Bucket(10000, col("doc_id"))
        < element_at(rmap, col("lang")) * 10000, lit(1L))
      .otherwise(lit(0L))
  }

  /** Streaming token-budget mix gate — the online half of x_corpus_mix
    * (and, fed BPE-unit cuts, of x_corpus_mix_bpe): the per-language
    * quota fill reduces to a per-language (bucket, doc_id) THRESHOLD
    * (TextAnalysis.mixCuts — the fill order is (bucket, doc_id) and
    * the token cumsum is monotone along it, so "cum ≤ quota" is
    * exactly "(bucket, doc_id) ≤ cut"), computed ONCE batch-side as a
    * #langs-row artifact, FROZEN, and applied to each arriving doc as
    * a STATELESS narrow map — no state store, no watermark, no
    * shuffle. Like every budget artifact (and unlike the split/sample
    * gates) the cut is a function of the corpus SNAPSHOT — growing the
    * corpus moves the quota — so production versions the cut table per
    * mixture build instead of re-deriving it in-stream (the
    * frozen-quantizer argument: re-deriving would flip already-shipped
    * membership). A doc whose language has no cut row (absent, or the
    * language kept nothing) is never kept — the conservative default.
    * Batch parity is spec-gated: per-language kept counts replayed
    * through the stream equal the batch rollup's n_kept, split across
    * micro-batches.
    */
  def mixDocs(docs: Dataset[LangDoc],
      cuts: Map[String, (Long, Long)]): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      mixKeptExpr(cuts).as("kept"))

  /** The frozen-cut mix membership expression over (doc_id, lang) —
    * ONE construction behind the standalone gate and both composed
    * ingest topologies (the spanCandRows rule): kept iff the doc's md5
    * bucket sits strictly below the language's cut bucket, or ties it
    * with doc_id at or below the cut id.
    */
  private def mixKeptExpr(cuts: Map[String, (Long, Long)])
      : org.apache.spark.sql.Column = {
    val bmap = typedlit(cuts.map { case (l, c) => l -> c._1 })
    val imap = typedlit(cuts.map { case (l, c) => l -> c._2 })
    val b = graft.ext.TextAnalysis.md5Bucket(10000, col("doc_id"))
    when(b < element_at(bmap, col("lang")) ||
      (b === element_at(bmap, col("lang")) &&
        col("doc_id") <= element_at(imap, col("lang"))),
      lit(1L)).otherwise(lit(0L))
  }

  /** (doc_id, hub_id) winnow-fingerprint collisions against the frozen
    * hub index, hub docs themselves excluded — the boilerplate screen's
    * join chain, factored as the ONE construction behind the standalone
    * screen and both composed ingest topologies.
    */
  private def hubCandRows(docs: DataFrame, hubFps: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(
        graft.functions.VectorFunctions.winnowFingerprints(col("text"))))
        .as("fp"))
      .join(hubFps.select(col("hub_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .join(hubFps, Seq("fp"))
      .select(col("doc_id"), col("hub_id"))

  case class ExactVerdict(vec_id: Long, keeper_id: Long, is_dup: Long)

  /** Online exact vector dedup — the ingest half of the collapse-first
    * guard (SCALE.md's 100× lesson: bit-identical replicas defeat every
    * similarity blocking, so they must die at the door): each arrival's
    * verdict is the batch rule verbatim — keeper = the minimum id of
    * its bit-identical group, is_dup for everyone else. The state-store
    * KEY is a 128-bit md5 of the embedding's float bits (embContentKey
    * below), the VALUE the 8-byte keeper id, so state is a FIXED
    * 16+8 bytes per distinct vector regardless of dims — the persisted
    * content-hash set a production ingest keeps, never the vectors
    * themselves (keying the group on the raw embedding would store
    * ~4·dims bytes per distinct vector as the state key). Bit-equality
    * semantics are preserved: the digest folds the exact float bits
    * (±0.0 normalized, NaNs canonicalized — the same
    * NormalizeFloatingNumbers treatment Spark applies to the batch
    * window's partition key), and a 128-bit digest collision between
    * two DISTINCT corpus vectors (~2⁻⁶⁴ odds at billions of rows) is
    * the standard content-address tradeoff every dedup store makes.
    * Replay contract: batches in nondecreasing vec_id order (ids
    * assigned at ingest); within a batch the operator sorts, so the
    * first arrival of a group IS its minimum and admitted keepers never
    * flip. Replaying the corpus reproduces every xDedupEmbExact verdict
    * (spec-gated on planted replicas). Downstream similarity stages
    * (banded dedup, clustering, the kNN graph) then see keepers only —
    * the composed clean arms' staging, online.
    */
  def dedupVectorsExactOnline(
      vecs: Dataset[VecIn]): Dataset[ExactVerdict] = {
    import vecs.sparkSession.implicits._
    vecs.groupByKey(v => embContentKey(v.embedding))
      .flatMapGroupsWithState[Long, ExactVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), rows: Iterator[VecIn], state: GroupState[Long]) =>
          var keeper = if (state.exists) state.get else Long.MaxValue
          val out = rows.toSeq.sortBy(_.vec_id).map { r =>
            if (r.vec_id < keeper) keeper = r.vec_id
            ExactVerdict(r.vec_id, keeper,
              if (r.vec_id == keeper) 0L else 1L)
          }
          state.update(keeper)
          out.iterator
      }
  }

  /** 128-bit content key of an embedding: md5 over the concatenated
    * float bits, ±0.0 collapsed to +0.0 and every NaN to the canonical
    * bit pattern (floatToIntBits) — exactly the float normalization
    * Spark's NormalizeFloatingNumbers applies to the batch operator's
    * window partition key, so stream and batch group the same vectors
    * together. Returned as two longs (a fixed-width state-store key).
    */
  private[graft] def embContentKey(e: Array[Float]): (Long, Long) = {
    val bb = java.nio.ByteBuffer.allocate(e.length * 4)
    e.foreach { f =>
      bb.putInt(java.lang.Float.floatToIntBits(if (f == 0f) 0f else f))
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(bb.array())
    val w = java.nio.ByteBuffer.wrap(d)
    (w.getLong, w.getLong)
  }

  case class SpanIn(doc_id: Long, span_id: Long, h: String)
  case class SpanVerdict(doc_id: Long, span_id: Long, owner_doc: Long,
    owner_span: Long, kept: Long)

  /** Online duplicated-span dedup — the EVOLVING-state member of the
    * span family's streaming column (dedupVectorsExactOnline's idiom
    * at sub-document granularity, next to the FROZEN-index gate
    * cleanDocsSpans): each arriving span's verdict is the batch
    * keep-first rule verbatim — owner = the minimum (doc_id, span_id)
    * ever seen for its hash, kept only by the owner. Spans are cut
    * in-row by the SAME construction the batch window consumes
    * (Dedup.spanHashes — one implementation, stream and batch cannot
    * desync); the state-store key is the span's md5 (a fixed 32-char
    * content address, the dedup-store tradeoff documented on the
    * vector twin), the value the 16-byte owner — state is fixed-width
    * per DISTINCT span regardless of span length, never the tokens.
    * Replay contract: batches in nondecreasing doc_id order (ids
    * assigned at ingest); within a batch the group sorts, so the first
    * arrival of a hash IS its minimum and admitted owners never flip —
    * replaying the corpus reproduces every batch verdict (parity
    * spec-gated against spanKeepVerdicts' keep_ids across micro-batch
    * splits). Emits per-SPAN verdicts: the cleaned-text rebuild is the
    * consumer's narrow map over its own kept spans (the batch
    * reconstructClean shape), not a second stateful stage.
    */
  def dedupSpansOnline(docs: Dataset[DocIn]): Dataset[SpanVerdict] = {
    import docs.sparkSession.implicits._
    val spans = graft.ext.Dedup.spanHashes(docs.toDF()).as[SpanIn]
    spans.groupByKey(_.h)
      .flatMapGroupsWithState[(Long, Long), SpanVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SpanIn], state: GroupState[(Long, Long)]) =>
          var owner =
            if (state.exists) state.get else (Long.MaxValue, Long.MaxValue)
          val out = rows.toSeq.sortBy(r => (r.doc_id, r.span_id)).map { r =>
            val k = (r.doc_id, r.span_id)
            if (Ordering[(Long, Long)].lt(k, owner)) owner = k
            SpanVerdict(r.doc_id, r.span_id, owner._1, owner._2,
              if (k == owner) 1L else 0L)
          }
          state.update(owner)
          out.iterator
      }
  }

  case class SemVerdict(vec_id: Long, cell: Long, kept: Long)
  case class CellVec(cell: Long, vec_id: Long, embedding: Array[Float])
  case class SemCellState(members: List[(Long, Array[Float])])

  /** Online SemDeDup — the EVOLVING-state member of the streaming
    * family, and the only one whose replay reproduces a FULL batch
    * operator rather than an admission arm: each cell's state is its
    * complete seen-vector list (the growing inverted list a production
    * ingest persists), and an arriving vector's keep/drop verdict is
    * the batch rule verbatim — any lower-id cell-mate whose rounded
    * cosine clears the threshold drops it. Replay contract: batches
    * arrive in nondecreasing vec_id order (the admission convention —
    * ids are assigned at ingest); WITHIN a batch the operator sorts by
    * vec_id itself, so micro-batch boundaries cannot matter, and
    * replaying the corpus reproduces every xDedupSemantic verdict
    * bitwise (spec-gated). The per-cell work is the batch pair join's
    * Σ cell² done incrementally — O(batch × cell occupancy) per ingest
    * — and the state's growth is bounded by the same two guards the
    * batch family carries: the exact collapse upstream (bit-identical
    * vectors never reach the stream twice) and the k ~ √N cell-density
    * knob. The Scala fold mirrors DotProduct's nullSafeEval (left fold
    * of double products) and Spark's HALF_UP shortest-decimal round, so
    * stream and batch arithmetic are the same IEEE steps.
    */
  def dedupSemanticOnline(vecs: Dataset[VecIn],
      centroids: Array[Array[Double]],
      threshold: Double = 0.4): Dataset[SemVerdict] = {
    import vecs.sparkSession.implicits._
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    vecs.select(
        graft.functions.VectorFunctions
          .nearestCentroid(col("embedding"), centroids)
          .cast("long").as("cell"),
        col("vec_id"), col("embedding"))
      .as[CellVec]
      .groupByKey(_.cell)
      .flatMapGroupsWithState[SemCellState, SemVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: Long, rows: Iterator[CellVec], state: GroupState[SemCellState]) =>
          var seen: Vector[(Long, Array[Float], Double)] =
            (if (state.exists) state.get.members else Nil)
              .map(m => (m._1, m._2, math.sqrt(dot(m._2, m._2)))).toVector
          val out = rows.toSeq.sortBy(_.vec_id).map { r =>
            val nrm = math.sqrt(dot(r.embedding, r.embedding))
            val hit = seen.exists { case (id, v, n2) =>
              id < r.vec_id && round4(dot(r.embedding, v) / (nrm * n2)) >= threshold
            }
            seen = seen :+ ((r.vec_id, r.embedding, nrm))
            SemVerdict(r.vec_id, cell, if (hit) 0L else 1L)
          }
          state.update(SemCellState(seen.map(t => (t._1, t._2)).toList))
          out.iterator
      }
  }

  /** Streaming frozen-merge BPE tokenizer — the RUNTIME half of
    * x_text_bpe_admit, the assignVectors idiom for text: the merge list
    * is trained once batch-side (TextAnalysis.admitMergeList — the
    * x_text_bpe_vocab artifact a production system ships to tokenizer
    * workers), frozen, and replayed in training order through the SAME
    * codegen'd greedy-merge expression the batch admission arm applies
    * (bpeMergeExpr), composed as a STATELESS narrow map over the ingest
    * stream — no state store, no watermark, no shuffle; each executor
    * holds only the K-entry merge list. Re-training inside the stream
    * would need corpus-wide pair counts per round (a batch job by
    * nature) AND would move every existing document's token sequence —
    * the same reason quantizer admission freezes centroids. Batch
    * parity is spec-gated bitwise: per-doc token counts and sequence
    * md5s equal the frozen-merge batch path on the same documents,
    * independent of micro-batch boundaries (the map is stateless, so
    * batching cannot matter — the spec splits the corpus mid-stream to
    * prove it).
    */
  def tokenizeDocs(docs: Dataset[DocIn],
      merges: Seq[(String, String)]): DataFrame = {
    var df = docs.select(col("doc_id"),
      split(graft.functions.VectorFunctions.simpleLower(col("text")), " ")
        .as("toks"))
      .withColumn("n_before", size(col("toks")).cast("long"))
    merges.foreach { case (a, b) =>
      df = df.withColumn("toks", graft.ext.TextAnalysis.bpeMergeExpr(a, b))
    }
    df.select(col("doc_id"), col("n_before"),
      size(col("toks")).cast("long").as("n_after"),
      md5(concat_ws("|", col("toks"))).as("tok_hash"))
  }

  /** Streaming DSIR selection gate, LITERAL arm — the selection
    * family's online half, the assignVectors idiom for importance
    * resampling: the per-token log-ratio table, the unseen-token
    * default, and the Nth-(weight, id) cutoff are computed ONCE
    * batch-side (Selection.dsirFrozen), frozen, and applied to each
    * arriving document as a STATELESS narrow map — the token fold is
    * one codegen'd `aggregate` over the doc's own tokens, so there is
    * no state store, no watermark, and no shuffle; at cluster scale
    * this is a pure per-executor pass over the ingest stream.
    * Re-estimating the distributions inside the stream would move
    * every previously admitted document's weight (the frozen-quantizer
    * argument), so production DSIR gates version the ratio table
    * instead of updating it. Tokenless docs report a null weight
    * and are never selected, mirroring the batch left join; ties at the
    * frozen cutoff resolve by the same lexicographic (weight, id) rule,
    * so replaying the training corpus reproduces the batch cut exactly
    * (spec-gated, split across micro-batches to prove statelessness).
    *
    * VOCAB CEILING (the r11 verdict's one weak grade): `typedlit(ratios)`
    * is NOT a broadcast — the whole term table serializes into the
    * physical plan and the codegen constant pool, so this arm is only
    * correct engineering while the frozen vocabulary is literal-sized
    * (≲ 10⁵ entries; beyond that the plan itself reaches tens of MB and
    * codegen constant-pool limits). A 100 TB corpus vocabulary
    * (10⁶–10⁷ whitespace tokens) must use [[selectDocsJoin]], the
    * stream-static JOIN arm over the shelf's `art_dsir_ratios`
    * relation — parity-spec'd row-for-row against this arm.
    */
  def selectDocs(docs: Dataset[DocIn], ratios: Map[String, Double],
      unseenRatio: Double, cutW: Double, cutId: Long): DataFrame = {
    val toks = filter(
      split(graft.functions.VectorFunctions.simpleLower(col("text")), " "),
      t => t =!= "")
    val rmap = typedlit(ratios)
    docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        when(size(toks) === 0, lit(null).cast("double"))
          .otherwise(round(aggregate(toks, lit(0.0),
            (acc, t) => acc + coalesce(element_at(rmap, t), lit(unseenRatio))), 4))
          .as("dsir_weight"))
      .withColumn("selected",
        when(col("dsir_weight") > lit(cutW) ||
          (col("dsir_weight") === lit(cutW) && col("doc_id") <= lit(cutId)),
          lit(1L)).otherwise(lit(0L)))
  }

  case class DsirCand(doc_id: Long, pos: Option[Long], r: Option[Double])
  case class DsirOut(doc_id: Long, n_tokens: Long,
    dsir_weight: Option[Double], selected: Long)

  /** (doc_id [, extra...], pos, tok) — every non-empty whitespace token
    * of the simple-lowered text, exploded IN-ROW with its position;
    * posexplode_outer emits one null-pos row for a tokenless doc so
    * every doc survives the explode. ONE construction behind both join
    * arms and the composed ingest gate (the spanCandRows rule).
    */
  private def tokPosRows(docs: DataFrame, extra: org.apache.spark.sql.Column*)
      : DataFrame = {
    val toks = filter(
      split(graft.functions.VectorFunctions.simpleLower(col("text")), " "),
      t => t =!= "")
    docs.select(col("doc_id") +: extra :+
      posexplode_outer(toks).as(Seq("pos", "tok")): _*)
  }

  /** Token rows joined stream-static on the frozen ratio relation
    * (`art_dsir_ratios`' (tok, ln_ratio) shape) → (doc_id, pos, r). */
  private def dsirCandRows(tokPos: DataFrame, ratios: DataFrame): DataFrame =
    tokPos
      .join(ratios.select(col("tok"), col("ln_ratio")), Seq("tok"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("ln_ratio").as("r"))

  /** Token rows joined stream-static on the frozen term relation
    * (`art_nb_terms`' (cls, tok, term) shape) → one row per (position,
    * class-holding-the-token), null cls where no class holds it. */
  private def nbCandRows(tokPos: DataFrame, terms: DataFrame): DataFrame =
    tokPos
      .join(terms.select(col("cls"), col("tok"), col("term")),
        Seq("tok"), "left")
      .withColumn("pos", col("pos").cast("long"))

  /** The DSIR left fold over a doc's (pos-sorted) joined ratio rows —
    * the literal arm's `aggregate` arithmetic verbatim: same order,
    * same IEEE adds, unseen default where the join missed, HALF_UP
    * round. Returns (n_tokens, weight — None for a tokenless doc).
    */
  private def foldDsir(tokRows: Seq[DsirCand], unseenRatio: Double)
      : (Long, Option[Double]) = {
    val sorted = tokRows.filter(_.pos.isDefined).sortBy(_.pos.get)
    val w =
      if (sorted.isEmpty) None
      else {
        var acc = 0.0
        sorted.foreach(c => acc += c.r.getOrElse(unseenRatio))
        Some(round4(acc))
      }
    (sorted.size.toLong, w)
  }

  /** The NB per-class fold + argmax over a doc's joined term rows —
    * the literal arm's arithmetic verbatim: per class, fold token
    * positions ascending with the class's joined term where present
    * and its frozen default where not, round(prior + sum, 4), argmax
    * by (rounded score DESC, class ASC). `byPos` maps every token
    * position (including ones no class's vocabulary holds — empty
    * inner map) to its class → term hits.
    */
  private def foldNb(meta: Seq[(String, Double, Double)],
      byPos: Map[Long, Map[String, Double]]): (String, Double) = {
    val positions = byPos.keys.toSeq.sorted
    meta.map { case (cls, lnPrior, dflt) =>
      var acc = 0.0
      positions.foreach(p => acc += byPos(p).getOrElse(cls, dflt))
      (cls, round4(lnPrior + acc))
    }.minBy { case (cls, s) => (-s, cls) }
  }

  /** Streaming DSIR selection gate, JOIN arm — the large-vocabulary
    * shape of [[selectDocs]], closing the literal arm's vocab ceiling:
    * the frozen token → ln-ratio table rides as a RELATION (the shelf's
    * `art_dsir_ratios` — columns (tok, ln_ratio), exactly what
    * `ArtifactShelf.table(_, _, "art_dsir_ratios")` returns), so it
    * never enters the plan: tokens are exploded IN-ROW with their
    * positions, joined stream-static on `tok` (AQE broadcasts the
    * table while it measures small and shuffles it once the vocabulary
    * is genuinely huge — the batch arms' shape, measured flat in
    * SCALE.md), and re-aggregated per doc by ONE stateful group whose
    * fold replays the literal arm's arithmetic exactly: candidates
    * sort by token position and fold left with the same IEEE double
    * adds the codegen'd `aggregate` runs, unseen tokens taking the
    * frozen default, the sum rounded by the Scala twin of Spark's
    * HALF_UP round — so the two arms are equal row-for-row, not just
    * approximately (parity spec-gated across micro-batch splits).
    * All of a doc's token rows land in its own micro-batch (the
    * static side is complete — the attachGraph argument), so the
    * group fires complete and holds NO state; like the literal arm
    * the gate is stateless and deterministic, batching cannot matter.
    * Scale shape per micro-batch: one narrow explode + one bounded
    * equi-join + one shuffle to the doc group — O(batch tokens),
    * vocabulary never on the driver, never in the plan. Cutover
    * guidance: literal arm below ~10⁵ vocab entries (plan-embedded,
    * zero joins), this arm beyond.
    */
  def selectDocsJoin(docs: Dataset[DocIn], ratios: DataFrame,
      unseenRatio: Double, cutW: Double, cutId: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val cands = dsirCandRows(tokPosRows(docs.toDF()), ratios).as[DsirCand]
    cands.groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, DsirOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[DsirCand], _: GroupState[Long]) =>
          // posexplode_outer emits one null-pos row for a tokenless doc,
          // so every arriving doc fires exactly one verdict.
          val (n, w) = foldDsir(rows.toSeq, unseenRatio)
          val sel = w.exists(wv =>
            wv > cutW || (wv == cutW && docId <= cutId))
          Iterator.single(DsirOut(docId, n, w, if (sel) 1L else 0L))
      }.toDF()
  }

  case class LabeledDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
    source: String)

  /** Streaming frozen-count NB classifier, LITERAL arm — the selection
    * family's other online half, completing the admission matrix's
    * streaming column (quantizer/BPE/DSIR gates all have one): the class
    * priors, unseen-token defaults, and per-(class, token) smoothed-ln
    * terms are trained ONCE batch-side (Selection.nbFrozen —
    * |classes| × vocab entries), frozen, and each arriving
    * document is scored against every class in a STATELESS narrow map —
    * one codegen'd `aggregate` fold per class over the doc's own tokens,
    * no state store, no watermark, no shuffle. Re-counting admitted docs
    * inside the stream would shift every score the moment a batch
    * arrived (the frozen-quantizer argument), so production classifier
    * gates version the count table instead of updating it. The argmax
    * folds over the per-class struct list with the batch tiebreak
    * (rounded score DESC, class name ASC), so replaying the held-out
    * half reproduces the batch admission rows exactly (spec-gated, split
    * across micro-batches to prove statelessness).
    *
    * VOCAB CEILING (the selectDocs caveat, per class): each class's
    * `typedlit(terms)` serializes the whole token map into the plan and
    * codegen constant pool — correct only while |classes| × vocab is
    * literal-sized. Beyond that use [[classifyDocsJoin]], the
    * stream-static JOIN arm over the shelf's `art_nb_terms` relation.
    */
  def classifyDocs(docs: Dataset[LabeledDoc],
      classes: Seq[(String, Double, Double, Map[String, Double])]): DataFrame = {
    require(classes.nonEmpty, "frozen NB state must carry at least one class")
    val toks = filter(
      split(graft.functions.VectorFunctions.simpleLower(col("text")), " "),
      t => t =!= "")
    val scored = classes.map { case (cls, lnPrior, dflt, terms) =>
      val tmap = typedlit(terms)
      val s = round(lit(lnPrior) + aggregate(toks, lit(0.0),
        (acc, t) => acc + coalesce(element_at(tmap, t), lit(dflt))), 4)
      // Negated leading field turns struct MIN into the batch argmax
      // order (rounded score DESC, class ASC). A when-chain fold would
      // embed the accumulator 3× per class — exponential expression
      // size at 20 classes; array_min keeps each class's subtree once.
      struct((-s).as("neg_score"), lit(cls).as("cls"), s.as("nb_score"))
    }
    val best = array_min(array(scored: _*))
    docs.select(col("doc_id"), col("source").as("true_source"),
        best.getField("cls").as("pred_source"),
        best.getField("nb_score").as("nb_score"))
      .withColumn("hit",
        when(col("pred_source") === col("true_source"), lit(1L))
          .otherwise(lit(0L)))
  }

  case class NbCand(doc_id: Long, true_source: String, pos: Option[Long],
    cls: Option[String], term: Option[Double])
  case class NbOut(doc_id: Long, true_source: String, pred_source: String,
    nb_score: Double, hit: Long)

  /** Streaming frozen-count NB classifier, JOIN arm — the
    * large-vocabulary shape of [[classifyDocs]] (the selectDocsJoin
    * idiom): the per-(class, token) smoothed-ln table rides as a
    * RELATION (the shelf's `art_nb_terms` — columns (cls, tok, term));
    * only the |classes|-row metadata (class name, ln prior, unseen
    * default — `art_nb_classes`' rows, bounded by the label set, never
    * the vocabulary) stays driver-side. Tokens explode IN-ROW with
    * positions, join stream-static on `tok` (fanning out one row per
    * class whose frozen vocabulary holds the token — the batch arm's
    * (class, token) join shape), and ONE stateful doc group replays the
    * literal arm's per-class fold exactly: for each class, candidates
    * fold in token-position order with the class's joined term where
    * present and its frozen default where not — the same IEEE adds as
    * the codegen'd `aggregate`, the same HALF_UP round, the same
    * (rounded score DESC, class ASC) argmax — so the arms are equal
    * row-for-row (parity spec-gated across micro-batch splits). All of
    * a doc's rows land in its own micro-batch (static side complete),
    * the group holds no state, batching cannot matter. Scale shape:
    * one explode + one equi-join + one doc-group shuffle per batch —
    * O(batch tokens × classes-holding-the-token), vocabulary never in
    * the plan. Cutover guidance: literal arm below ~10⁵ total term
    * entries, this arm beyond.
    */
  def classifyDocsJoin(docs: Dataset[LabeledDoc],
      classMeta: Seq[(String, Double, Double)],
      terms: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    require(classMeta.nonEmpty,
      "frozen NB state must carry at least one class")
    val meta = classMeta.sortBy(_._1)
    val cands = nbCandRows(
        tokPosRows(docs.toDF(), col("source").as("true_source")), terms)
      .select(col("doc_id"), col("true_source"), col("pos"), col("cls"),
        col("term"))
      .as[NbCand]
    cands.groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, NbOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[NbCand], _: GroupState[Long]) =>
          val rs = rows.toSeq
          val trueSource = rs.head.true_source
          // pos → (class → term) for every token position the join
          // matched; positions whose token is outside every class's
          // vocabulary still appear (null cls from the left join) and
          // contribute each class's default — the literal arm's
          // coalesce semantics.
          val byPos = nbByPos(rs.map(c => (c.pos, c.cls, c.term)))
          val (bestCls, bestScore) = foldNb(meta, byPos)
          Iterator.single(NbOut(docId, trueSource, bestCls, bestScore,
            if (bestCls == trueSource) 1L else 0L))
      }.toDF()
  }

  /** pos → (class → term) from a doc's joined (pos, cls, term) rows —
    * shared by the standalone join arm and the composed ingest gate.
    */
  private def nbByPos(rs: Seq[(Option[Long], Option[String], Option[Double])])
      : Map[Long, Map[String, Double]] =
    rs.filter(_._1.isDefined).groupBy(_._1.get)
      .map { case (p, cs) =>
        p -> cs.collect { case (_, Some(c), Some(t)) => c -> t }.toMap
      }

  case class SessAttrState(start: Long, last: Long, n: Int,
    touchType: String, touchTs: Long, touchEvent: Long,
    hasSess: Boolean, hasTouch: Boolean)
  case class SessAttrOut(kind: String, user_id: Long,
    purchase_id: Long, channel: String, value_e4: Long,
    n_events: Int, duration_minutes: Double, session_start_us: Long)

  /** Sessionization → attribution in ONE topology — the production
    * composition (attribution consumes sessions): a single
    * groupByKey(user_id) pass holds BOTH the open-session struct and
    * the last-touch struct in one state value, so the composed
    * pipeline pays one shuffle and one state store where running the
    * two gated operators side by side would pay two of each — and the
    * attribution rows carry their SESSION context (session_start_us =
    * the start of the session the purchase BELONGS to: the live open
    * session for in-reach purchases, the purchase's own timestamp for
    * a too-late purchase emitted as its own single-event session),
    * which two disjoint operators could only reconstruct with a
    * downstream join. Output is a tagged union:
    * kind = 'session' rows are closed sessions (sessionize's exact
    * semantics — same µs gap arithmetic, same out-of-order handling),
    * kind = 'attr' rows are purchases credited by the last preceding
    * in-horizon touch (attribute's exact semantics — same causality
    * guard, same (ts, touch-first, event_id) batch order, same
    * trunc(value·10⁴) fixed point). Per-key timeout is the MINIMUM of
    * the two live deadlines (session gap, touch horizon); a firing
    * clears exactly the parts whose deadline the watermark passed and
    * re-arms for the survivor, so neither half can evict the other
    * early. State is one flat struct per active user — the sum of the
    * two operators' states, nothing more. Batch parity is spec-gated
    * against BOTH batch operators across micro-batch splits.
    */
  def sessionAttribute(events: Dataset[Event]): Dataset[SessAttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessAttrState, SessAttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSessAttr)
  }

  private def sessDeadlineMs(s: SessAttrState): Long =
    s.last / 1000L + gapUs / 1000L + 1L
  private def touchDeadlineMs(s: SessAttrState): Long =
    s.touchTs / 1000L + attrHorizonUs / 1000L + 1L

  private[graft] def updateSessAttr(userId: Long,
      events: Iterator[Event],
      state: GroupState[SessAttrState]): Iterator[SessAttrOut] = {
    val out = scala.collection.mutable.Buffer[SessAttrOut]()
    def closed(start: Long, last: Long, n: Int): SessAttrOut =
      SessAttrOut("session", userId, -1L, "", 0L, n,
        (last - start) / 60000000.0, start)
    def rearm(s: SessAttrState): Unit =
      if (!s.hasSess && !s.hasTouch) state.remove()
      else {
        state.update(s)
        val dls = (if (s.hasSess) Seq(sessDeadlineMs(s)) else Nil) ++
          (if (s.hasTouch) Seq(touchDeadlineMs(s)) else Nil)
        state.setTimeoutTimestamp(
          math.max(dls.min, state.getCurrentWatermarkMs + 1))
      }
    if (state.hasTimedOut) {
      val wm = state.getCurrentWatermarkMs
      var s = state.get
      if (s.hasSess && sessDeadlineMs(s) <= wm) {
        out += closed(s.start, s.last, s.n)
        s = s.copy(hasSess = false)
      }
      if (s.hasTouch && touchDeadlineMs(s) <= wm)
        s = s.copy(hasTouch = false)
      rearm(s)
    } else {
      var s = state.getOption.getOrElse(SessAttrState(0L, 0L, 0,
        "", 0L, 0L, hasSess = false, hasTouch = false))
      // The attribution batch order (ts, touch-before-purchase,
      // event_id): session outcomes are order-independent at equal µs
      // (the min/max widening), so one sort serves both halves.
      events.toSeq
        .sortBy(e => (tsMicros(e.ts),
          if (e.event_type == "purchase") 1 else 0, e.event_id))
        .foreach { e =>
          val t = tsMicros(e.ts)
          // Session half — updateSessions' cases verbatim. evSessStart
          // is the start of the session THIS event belongs to: for the
          // too-late branch (beyond the open session's backward reach)
          // the event is its own single-event session starting at t —
          // the open session's s.start is strictly later and claiming it
          // on the attr row would assert session context the purchase
          // doesn't have.
          var evSessStart = t
          if (!s.hasSess)
            s = s.copy(start = t, last = t, n = 1, hasSess = true)
          else if (t >= s.start - gapUs && t - s.last <= gapUs) {
            s = s.copy(start = math.min(s.start, t),
              last = math.max(s.last, t), n = s.n + 1)
            evSessStart = s.start
          } else if (t > s.last + gapUs) {
            out += closed(s.start, s.last, s.n)
            s = s.copy(start = t, last = t, n = 1)
          } else
            out += closed(t, t, 1)
          // Attribution half — updateAttribution's cases verbatim.
          if (e.event_type == "purchase") {
            val channel =
              if (s.hasTouch && s.touchTs <= t && t - s.touchTs <= attrHorizonUs)
                s.touchType
              else "direct"
            out += SessAttrOut("attr", userId, e.event_id, channel,
              (e.value * 10000d).toLong, 0, 0.0, evSessStart)
          } else if (e.event_type == "click" || e.event_type == "view" ||
              e.event_type == "signup") {
            if (!s.hasTouch || s.touchTs < t ||
                (s.touchTs == t && s.touchEvent < e.event_id))
              s = s.copy(touchType = e.event_type, touchTs = t,
                touchEvent = e.event_id, hasTouch = true)
          }
        }
      rearm(s)
    }
    out.iterator
  }

  case class KbCand(doc_id: Long, quality_score: Double, nsz: Long,
    gram: Option[Long], doc_adm: Option[Long], asz: Option[Long],
    label: Option[Long])
  case class KbAttach(doc_id: Long, cluster_id: Long,
    quality_score: Double, kept: Long)

  /** Streaming keep-best admission — the quality-argmax retention
    * policy's ingest gate, completing the admission matrix's streaming
    * column for the text retention family (every vector retention
    * policy already has one): the frozen state is
    * Dedup.keepBestAdmitState's relations verbatim (the admitted
    * rare-gram index with sizes + frozen cluster labels, and the
    * frozen keepers) — one state builder, two surfaces, so batch and
    * stream cannot desync. Each arriving doc's distinct grams
    * (wordGramArray — the batch gram construction kept in-row, no
    * stateful distinct) left-join the index stream-static; all of a
    * doc's candidate rows land in its own micro-batch (the static
    * side is complete — the attachGraph argument), so the per-doc
    * group computes each admitted candidate's intersection, applies
    * the batch 0.5 Jaccard rule with the SAME double arithmetic, and
    * attaches to the minimum frozen label — or passes (kept = 1)
    * when nothing clears the bar. The frozen keeper joins back
    * stream-static after the group, and an attached arrival is NEVER
    * kept — the frozen keeper cannot be displaced (the batch gate's
    * contract). Flagged group state is one Long per seen doc, so a
    * replayed doc emits nothing (the screenVectors idempotence
    * contract). O(batch × bounded fan-out) per ingest: each gram
    * joins ≤ 50 admitted docs by the frozen df bound. Batch parity is
    * spec-gated row-for-row against xDedupKeepBestAdmit across
    * micro-batch splits with a replayed batch emitting nothing.
    */
  def admitDocsKeepBest(docs: Dataset[DocIn], idx: DataFrame,
      keepers: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cands = docs.toDF()
      .withColumn("quality_score",
        graft.ext.TextAnalysis.qualityScoreColumn)
      .withColumn("grams", graft.ext.Dedup.wordGramArray)
      .select(col("doc_id"), col("quality_score"),
        size(col("grams")).cast("long").as("nsz"),
        explode_outer(col("grams")).as("gram"))
      .join(idx, Seq("gram"), "left")
      .select(col("doc_id"), col("quality_score"), col("nsz"),
        col("gram"), col("doc_adm"), col("asz"), col("label"))
      .as[KbCand]
    val attached = cands.groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, KbAttach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[KbCand], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(1L)
            val rs = rows.toSeq
            val q = rs.head.quality_score
            val nsz = rs.head.nsz
            // Distinct (gram, adm) pairs — exploded occurrences are
            // already per-distinct-gram (wordGramArray dedups in-row),
            // but a defensive distinct keeps the count exact if an
            // upstream ever re-partitions candidate rows.
            val att = rs.collect {
              case KbCand(_, _, _, Some(g), Some(a), Some(sz), Some(l)) =>
                (g, a, sz, l)
            }.distinct
              .groupBy(t => (t._2, t._3, t._4))
              .collect { case ((_, asz, label), hits)
                if hits.size.toDouble / (nsz + asz - hits.size) >= 0.5 =>
                label
              }
            if (att.isEmpty) Iterator.single(KbAttach(docId, docId, q, 1L))
            else Iterator.single(KbAttach(docId, att.min, q, 0L))
          }
      }
    attached.toDF()
      .join(keepers.withColumnRenamed("cluster_id", "kc"),
        col("cluster_id") === col("kc") && col("kept") === 0L, "left")
      .select(col("doc_id"), col("cluster_id"), col("quality_score"),
        col("keeper_id"), col("keeper_quality"), col("kept"))
  }

  case class SpanCand(doc_id: Long, span_id: Long, h: String,
    in_idx: Boolean, ntoks: Long, stoks: String)
  case class SpanCleanOut(doc_id: Long, n_spans: Long, n_removed: Long,
    n_clean_tokens: Long, clean_hash: String)

  /** Streaming duplicated-span removal — the Lee-et-al span family's
    * ingest gate (Dedup.xDedupSpanAdmit's runtime half): the frozen
    * state is the admitted span-hash index (Dedup.spanAdmitState —
    * one builder, two surfaces) joined stream-static per arriving
    * span, so each micro-batch pays one bounded equi-join on the
    * 32-token span hash — O(1) fan-out per span, no df guard needed.
    * Spans are cut IN-ROW (the wordGramArray rule: no stateful
    * distinct), each carrying its original-case token window; the
    * per-doc group then applies the batch rule — keep iff NOT in the
    * frozen index AND the doc's own first occurrence of the hash — and
    * rebuilds the cleaned text (span joins compose associatively, so
    * the group's string concat equals the batch flatten+join
    * bitwise; md5 over UTF-8 bytes is the same function both sides).
    * Cross-arrival duplicates deliberately PASS — deduping arrivals
    * against each other is evolving state (the batch contract,
    * documented on the gate); the next corpus build's spanRemove sweep
    * reclaims them. Flagged group state is one Long per seen doc —
    * a replayed doc emits nothing (the screenVectors idempotence
    * contract). Batch parity is spec-gated row-for-row across
    * micro-batch splits with a replayed batch emitting nothing.
    */
  /** The in-row span candidate relation — span cuts carrying their
    * original-case token windows, left-joined stream-static against the
    * frozen admitted-hash index: ONE construction behind the standalone
    * span gate and the composed ingest topology (the bpeTrain
    * single-loop rule), so the two surfaces cannot desync on how spans
    * are cut or flagged.
    */
  private def spanCandRows(docs: DataFrame, idx: DataFrame): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("lws", split(
        graft.functions.VectorFunctions.simpleLower(col("text")), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast((size(lws) - 1) / 32 as int)),
          |  i -> struct(cast(i as bigint) as span_id,
          |    md5(concat_ws(' ', slice(lws, cast(i * 32 + 1 as int), 32))) as h,
          |    size(slice(ws, cast(i * 32 + 1 as int), 32)) as ntoks,
          |    concat_ws(' ', slice(ws, cast(i * 32 + 1 as int), 32)) as stoks))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("s.span_id").as("span_id"),
        col("s.h").as("h"), col("s.ntoks").cast("long").as("ntoks"),
        col("s.stoks").as("stoks"))
      .join(idx.withColumn("in_idx_i", lit(1)), Seq("h"), "left")
      .select(col("doc_id"), col("span_id"), col("h"),
        col("in_idx_i").isNotNull.as("in_idx"), col("ntoks"), col("stoks"))

  /** The per-doc span-clean fold shared by the standalone gate and the
    * composed ingest verdict: batch keep rule (not in the frozen index
    * AND own first in-doc occurrence), cleaned text rebuilt in span
    * order and md5'd over UTF-8 bytes — the same function both engines
    * hash with.
    */
  private def foldSpanClean(docId: Long,
      rs: Seq[SpanCand]): SpanCleanOut = {
    val sorted = rs.sortBy(_.span_id)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val kept = sorted.filter { c =>
      val first = seen.add(c.h)
      !c.in_idx && first
    }
    val clean = kept.map(_.stoks).mkString(" ")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(clean.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    SpanCleanOut(docId, sorted.size.toLong,
      (sorted.size - kept.size).toLong, kept.map(_.ntoks).sum, hash)
  }

  def cleanDocsSpans(docs: Dataset[DocIn], idx: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cands = spanCandRows(docs.toDF(), idx).as[SpanCand]
    cands.groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, SpanCleanOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[SpanCand], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(1L)
            Iterator.single(foldSpanClean(docId, rows.toSeq))
          }
      }.toDF()
  }

  case class IngestDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
    lang: String)
  case class IngestCand(doc_id: Long, kind: Int, span_id: Long, h: String,
    in_idx: Boolean, ntoks: Long, stoks: String, hub_id: Long,
    lang: String, mix_kept: Long)
  case class IngestVerdict(doc_id: Long, lang: String, n_spans: Long,
    n_removed: Long, n_clean_tokens: Long, clean_hash: String,
    n_hub_flags: Long, mix_kept: Long, admitted: Long)

  /** The COMPOSED document ingest gate — the production text ingest
    * path as ONE streaming topology over shelf-loaded frozen state
    * (the sessionize→attribution one-topology precedent, applied to
    * the admission matrix): each arriving doc flows through three
    * verdict branches — duplicated-span cleaning against the frozen
    * admitted span-hash index (`art_span_admit_index`), the
    * boilerplate screen against the frozen hub fingerprint index
    * (`art_boilerplate_hub_index`, hub ids excluded in-branch exactly
    * as the standalone gate does), and the stateless token-budget mix
    * cut (`art_mix_cuts`) — unioned into one doc_id-keyed candidate
    * stream and folded by a SINGLE stateful stage into one per-doc
    * admission verdict. Each branch IS the standalone surface's
    * construction (spanCandRows / the screen's fp join / mixDocs'
    * threshold expression — shared code, not re-derivations), so the
    * composed verdicts provably equal the composition of the gated
    * operators (spec-pinned against xDedupSpanAdmit + the batch screen
    * + the mix cut rule, micro-batch-split and shelf-loaded). The
    * admission POLICY is the prep composition's:
    * admitted = no hub flag AND mix-kept AND NOT span-majority-
    * duplicated (2·n_removed > n_spans, the x_llm_corpus_prep_spans
    * cut — the gate's cleaned text is still emitted for flagged docs,
    * the caller decides what to do with rejects). Scale shape per
    * micro-batch: two bounded stream-static hash joins (span index,
    * hub prints) + one narrow map (mix) + ONE shuffle to the doc_id
    * group — state one Long per seen doc (flagged ⇒ replay-idempotent).
    * The span branch emits ≥ 1 row per doc (every text has a span), so
    * every arriving doc fires exactly one verdict.
    */
  def ingestDocs(docs: Dataset[IngestDoc], spanIdx: DataFrame,
      hubFps: DataFrame, cuts: Map[String, (Long, Long)],
      shareThreshold: Int = graft.ext.TextAnalysis.winnowShareThreshold)
      : Dataset[IngestVerdict] = {
    import docs.sparkSession.implicits._
    val base = docs.toDF()
    val blank = Seq(lit(-1L).as("span_id"), lit("").as("h"),
      lit(false).as("in_idx"), lit(0L).as("ntoks"), lit("").as("stoks"))
    val spanB = spanCandRows(base, spanIdx)
      .select(col("doc_id"), lit(0).as("kind"), col("span_id"), col("h"),
        col("in_idx"), col("ntoks"), col("stoks"), lit(-1L).as("hub_id"),
        lit("").as("lang"), lit(0L).as("mix_kept"))
    val hubB = hubCandRows(base, hubFps)
      .select((col("doc_id") +: lit(1).as("kind") +: blank) ++
        Seq(col("hub_id"), lit("").as("lang"), lit(0L).as("mix_kept")): _*)
    val mixB = base
      .select((col("doc_id") +: lit(2).as("kind") +: blank) ++
        Seq(lit(-1L).as("hub_id"), col("lang"),
          mixKeptExpr(cuts).as("mix_kept")): _*)
    spanB.unionByName(hubB).unionByName(mixB).as[IngestCand]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, IngestVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[IngestCand], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(1L)
            val rs = rows.toSeq
            val sc = foldSpanClean(docId, rs.filter(_.kind == 0).map(c =>
              SpanCand(c.doc_id, c.span_id, c.h, c.in_idx, c.ntoks,
                c.stoks)))
            val nHubs = rs.filter(_.kind == 1).groupBy(_.hub_id)
              .count { case (_, hits) => hits.size >= shareThreshold }
              .toLong
            val mix = rs.find(_.kind == 2)
            val mixKept = mix.map(_.mix_kept).getOrElse(0L)
            val admitted = if (nHubs == 0L && mixKept == 1L &&
              2L * sc.n_removed <= sc.n_spans) 1L else 0L
            Iterator.single(IngestVerdict(docId,
              mix.map(_.lang).getOrElse(""), sc.n_spans, sc.n_removed,
              sc.n_clean_tokens, sc.clean_hash, nHubs, mixKept, admitted))
          }
      }
  }

  case class IngestFullCand(doc_id: Long, kind: Int, span_id: Long,
    h: String, in_idx: Boolean, ntoks: Long, stoks: String, hub_id: Long,
    lang: String, mix_kept: Long, c4_mask: Long, sampled: Long,
    pos: Option[Long], r: Option[Double], cls: Option[String],
    term: Option[Double])
  case class IngestFullVerdict(doc_id: Long, lang: String, n_spans: Long,
    n_removed: Long, n_clean_tokens: Long, clean_hash: String,
    n_hub_flags: Long, n_winnow_flags: Long, mix_kept: Long,
    sampled: Long, c4_fail_mask: Long, c4_keep: Long,
    n_tokens: Long, dsir_weight: Option[Double], dsir_selected: Long,
    nb_pred: String, nb_score: Double, admitted: Long)

  /** The FULL-MATRIX composed document ingest gate — [[ingestDocs]]
    * extended to every frozen DOCUMENT admission dimension the shelf
    * holds (the r11 verdict's task, + winnow and sampling in r12):
    * each arriving doc flows through six branch legs carrying EIGHT
    * verdict dimensions —
    * duplicated-span cleaning (`art_span_admit_index`), the
    * boilerplate hub screen (`art_boilerplate_hub_index`), the winnow
    * substring-dup screen against the admitted fingerprint index
    * (`art_winnow_admit_index` — the x_text_winnow_admit dimension,
    * the SAME hubCandRows construction over a different frozen index),
    * the stateless mix cut (`art_mix_cuts`) fused in-row with the
    * C4/Gopher hard-rule mask and the temperature-sampling cut
    * (`art_sample_rates` — three narrow maps, one branch row), the
    * DSIR weight against the frozen ratio relation (`art_dsir_ratios`
    * + `art_dsir_consts` — the JOIN arm's vocab-scalable shape, never
    * a plan literal), and the NB class against the frozen term
    * relation (`art_nb_terms` + `art_nb_classes`' bounded metadata) —
    * unioned into one doc_id-keyed candidate stream and folded by the
    * SAME single stateful stage into one per-doc verdict carrying all
    * eight columns. Every branch IS the standalone surface's
    * construction (spanCandRows / hubCandRows / mixKeptExpr /
    * sampleKeptExpr / c4RuleCols / dsirCandRows+foldDsir /
    * nbCandRows+foldNb — shared code), so the composed verdicts
    * provably equal the composition of the gated operators (parity
    * spec-gated, micro-batch-split, shelf-loaded, replay-idempotent).
    * The keep-best attach is deliberately NOT folded: its verdict
    * needs the arriving doc's cluster-quality rank against frozen
    * keepers — a retention POLICY the prep compositions own, not a
    * per-doc gate (admitDocsKeepBest is its standalone surface).
    * Admission POLICY: the prep composition's cut extended by the
    * hard filters — admitted = no hub flag AND no winnow-dup flag AND
    * mix-kept AND sampled AND NOT span-majority-duplicated AND C4 mask
    * clean AND DSIR-selected; the NB class rides as an ANNOTATION
    * (pred + score), the production routing column — a class-based
    * drop rule would be corpus policy, not engine semantics, so the
    * gate reports and the caller decides. Scale shape per micro-batch:
    * five bounded stream-static hash joins (span index, hub prints,
    * winnow index, ratio relation, term relation — the latter two
    * AQE-broadcast while small, shuffled once the vocabulary is huge)
    * + three fused narrow maps (mix+sample+C4, one branch row) + ONE
    * shuffle to the doc_id group — state one Long per seen doc.
    */
  def ingestDocsFull(docs: Dataset[IngestDoc], spanIdx: DataFrame,
      hubFps: DataFrame, winnowIdx: DataFrame,
      cuts: Map[String, (Long, Long)], sampleRates: Map[String, Double],
      dsirRatios: DataFrame, dsirUnseen: Double, dsirCutW: Double,
      dsirCutId: Long, nbMeta: Seq[(String, Double, Double)],
      nbTerms: DataFrame,
      shareThreshold: Int = graft.ext.TextAnalysis.winnowShareThreshold)
      : Dataset[IngestFullVerdict] = {
    import docs.sparkSession.implicits._
    require(nbMeta.nonEmpty, "frozen NB state must carry at least one class")
    val meta = nbMeta.sortBy(_._1)
    val base = docs.toDF()
    // Typed pads so the six branch schemas union positionally clean.
    val blankSpan = Seq(lit(-1L).as("span_id"), lit("").as("h"),
      lit(false).as("in_idx"), lit(0L).as("ntoks"), lit("").as("stoks"))
    val blankTok = Seq(lit(null).cast("long").as("pos"),
      lit(null).cast("double").as("r"), lit(null).cast("string").as("cls"),
      lit(null).cast("double").as("term"))
    def pad(kind: Int, rows: DataFrame,
        spanCols: Seq[org.apache.spark.sql.Column],
        hubCol: org.apache.spark.sql.Column,
        langCol: org.apache.spark.sql.Column,
        mixCol: org.apache.spark.sql.Column,
        c4Col: org.apache.spark.sql.Column,
        sampleCol: org.apache.spark.sql.Column,
        tokCols: Seq[org.apache.spark.sql.Column]): DataFrame =
      rows.select((col("doc_id") +: lit(kind).as("kind") +: spanCols) ++
        (hubCol.as("hub_id") +: langCol.as("lang") +:
          mixCol.as("mix_kept") +: c4Col.as("c4_mask") +:
          sampleCol.as("sampled") +: tokCols): _*)
    val spanB = pad(0, spanCandRows(base, spanIdx),
      Seq(col("span_id"), col("h"), col("in_idx"), col("ntoks"),
        col("stoks")),
      lit(-1L), lit(""), lit(0L), lit(0L), lit(0L), blankTok)
    val hubB = pad(1, hubCandRows(base, hubFps), blankSpan,
      col("hub_id"), lit(""), lit(0L), lit(0L), lit(0L), blankTok)
    // Mix + sample + C4 fused: all three are stateless per-doc narrow
    // maps, so one branch row carries the three verdicts — two union
    // legs fewer to shuffle.
    val mixB = pad(2, graft.ext.TextAnalysis.c4RuleCols(base), blankSpan,
      lit(-1L), col("lang"), mixKeptExpr(cuts), col("fail_mask"),
      sampleKeptExpr(sampleRates), blankTok)
    val tokPos = tokPosRows(base)
    val dsirB = pad(3, dsirCandRows(tokPos, dsirRatios), blankSpan,
      lit(-1L), lit(""), lit(0L), lit(0L), lit(0L),
      Seq(col("pos"), col("r"), lit(null).cast("string").as("cls"),
        lit(null).cast("double").as("term")))
    val nbB = pad(4, nbCandRows(tokPos, nbTerms), blankSpan,
      lit(-1L), lit(""), lit(0L), lit(0L), lit(0L),
      Seq(col("pos"), lit(null).cast("double").as("r"), col("cls"),
        col("term")))
    // The winnow substring-dup screen: the hub branch's construction
    // verbatim over the admitted fingerprint index.
    val winB = pad(5, hubCandRows(base, winnowIdx), blankSpan,
      col("hub_id"), lit(""), lit(0L), lit(0L), lit(0L), blankTok)
    spanB.unionByName(hubB).unionByName(winB).unionByName(mixB)
      .unionByName(dsirB).unionByName(nbB).as[IngestFullCand]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, IngestFullVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[IngestFullCand],
         state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(1L)
            val rs = rows.toSeq
            val sc = foldSpanClean(docId, rs.filter(_.kind == 0).map(c =>
              SpanCand(c.doc_id, c.span_id, c.h, c.in_idx, c.ntoks,
                c.stoks)))
            def flagCount(kind: Int): Long =
              rs.filter(_.kind == kind).groupBy(_.hub_id)
                .count { case (_, hits) => hits.size >= shareThreshold }
                .toLong
            val nHubs = flagCount(1)
            val nWin = flagCount(5)
            val mix = rs.find(_.kind == 2)
            val mixKept = mix.map(_.mix_kept).getOrElse(0L)
            val c4Mask = mix.map(_.c4_mask).getOrElse(0L)
            val sampled = mix.map(_.sampled).getOrElse(0L)
            val (nToks, w) = foldDsir(
              rs.filter(_.kind == 3).map(c => DsirCand(c.doc_id, c.pos, c.r)),
              dsirUnseen)
            val dsirSel = w.exists(wv =>
              wv > dsirCutW || (wv == dsirCutW && docId <= dsirCutId))
            val (pred, score) = foldNb(meta,
              nbByPos(rs.filter(_.kind == 4).map(c => (c.pos, c.cls, c.term))))
            val admitted = if (nHubs == 0L && nWin == 0L &&
              mixKept == 1L && sampled == 1L &&
              2L * sc.n_removed <= sc.n_spans && c4Mask == 0L && dsirSel)
              1L else 0L
            Iterator.single(IngestFullVerdict(docId,
              mix.map(_.lang).getOrElse(""), sc.n_spans, sc.n_removed,
              sc.n_clean_tokens, sc.clean_hash, nHubs, nWin, mixKept,
              sampled, c4Mask,
              if (c4Mask == 0L) 1L else 0L, nToks, w,
              if (dsirSel) 1L else 0L, pred, score, admitted))
          }
      }
  }

  /** Per-gate-dimension DROP-ATTRIBUTION over the full-matrix gate's
    * verdicts — the streaming counterpart of the batch
    * x_llm_corpus_prep_audit funnel: each verdict row is attributed to
    * the FIRST admission dimension that rejects it, in the gate's
    * documented policy order (hub screen → winnow-dup screen → mix cut
    * → sampling cut → span-majority → C4 rules → DSIR selection), and
    * the funnel rolls up to per-dimension reject counts with 'admitted'
    * as the terminal stage. A stateless narrow map + one rollup over
    * the verdict relation — run it on the streamed gate output, a
    * persisted verdict table, or the batch-composed verdicts alike
    * (the spec pins kept == Σ admitted and per-dimension counts on a
    * planted mixed-rejection batch).
    */
  def ingestAuditRollup(verdicts: DataFrame): DataFrame = {
    val stages = ingestAuditStages
    verdicts
      .withColumn("stage_ord",
        when(col("n_hub_flags") > 0L, lit(0L))
          .when(col("n_winnow_flags") > 0L, lit(1L))
          .when(col("mix_kept") =!= 1L, lit(2L))
          .when(col("sampled") =!= 1L, lit(3L))
          .when(col("n_removed") * lit(2L) > col("n_spans"), lit(4L))
          .when(col("c4_fail_mask") =!= 0L, lit(5L))
          .when(col("dsir_selected") =!= 1L, lit(6L))
          .otherwise(lit(7L)))
      .withColumn("stage",
        element_at(typedlit(stages), col("stage_ord").cast("int") + 1))
      .groupBy(col("stage_ord"), col("stage"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("stage_ord")
  }

  private[graft] val ingestAuditStages: Seq[String] = Seq(
    "hub_screen", "winnow_dup", "mix_cut", "sample_cut", "span_majority",
    "c4_rules", "dsir", "admitted")

  /** The vector gate's funnel — ingestAuditRollup's mirror over
    * [[ingestVectors]]' verdicts, in the gate's policy order (exact
    * content dup → contamination flag → admitted): the same stateless
    * map + rollup, runnable on the live stream output or a persisted
    * verdict table.
    */
  def ingestVecAuditRollup(verdicts: DataFrame): DataFrame = {
    verdicts
      .withColumn("stage_ord",
        when(col("is_dup") === 1L, lit(0L))
          .when(col("n_flags") > 0L, lit(1L))
          .otherwise(lit(2L)))
      .withColumn("stage",
        element_at(typedlit(ingestVecAuditStages),
          col("stage_ord").cast("int") + 1))
      .groupBy(col("stage_ord"), col("stage"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("stage_ord")
  }

  private[graft] val ingestVecAuditStages: Seq[String] = Seq(
    "exact_dup", "contamination", "admitted")

  case class KeyedVec(h1: Long, h2: Long, vec_id: Long,
    embedding: Array[Float])
  case class IngestVecCand(h1: Long, h2: Long, vec_id: Long, kind: Int,
    cell: Long, codes: Seq[Long], sq8: Seq[Long], eval_id: Long,
    embedding: Array[Float])
  case class IngestVecState(keeper: Long, maxSeen: Long,
    emitted: List[Long])
  /** `embedding` (r18) rides ONLY the admitted verdicts (null
    * otherwise — rejected rows stay slim): the serve-delta consumer
    * (Pipeline.serveDeltaStream → Similarity.serveDeltaRows) builds
    * its inverted-list insert rows from the verdict alone, so the
    * foreachBatch never re-reads the arrival log — the r17 topology
    * joined each micro-batch back against the ENTIRE source directory
    * (O(batches × log size) cumulative, and a within-batch duplicate
    * arrival fanned one verdict into duplicate delta rows). A column
    * on the verdict row, never state: the state store still holds
    * only (keeper, maxSeen, emitted ids).
    */
  case class IngestVecVerdict(vec_id: Long, keeper_id: Long, is_dup: Long,
    cell: Long, codes: Seq[Long], sq8_codes: Seq[Long], n_flags: Long,
    admitted: Long, embedding: Array[Float])

  /** The COMPOSED vector ingest gate — ingestDocsFull's mirror for the
    * embedding side (the r11 verdict's task #4), the production vector
    * ingest path as ONE streaming topology over shelf-loaded frozen
    * state: each arriving vector flows through (1) the exact-dedup
    * content-key verdict (the collapse-first mandate — the EVOLVING
    * half, dedupVectorsExactOnline's min-id keeper rule verbatim),
    * (2) the frozen coarse-quantizer cell assignment
    * (`art_ivf_centroids` — assignVectors' cellExpr, shared code),
    * (3) the PQ encode (`art_pq_codebooks` — Similarity.pqEncode, the
    * same codegen'd pass the batch admission gate runs), and (4) the
    * contamination screen against the frozen eval inverted list
    * (`art_contamination_eval_index` — streamScreenCands, shared
    * construction), folded by a SINGLE stateful stage into one per-
    * vector verdict. The state key is the embedding's 128-bit CONTENT
    * key (embContentKey — never the raw vector, the fixed-width-state
    * rule), which makes the exact-dedup state reachable AND keeps all
    * of one vector's candidate rows in one group: the assign/encode
    * verdicts ride the kind-0 row as in-row columns (stateless narrow
    * maps need no fold), the screen's flagged evals arrive as kind-1
    * rows (complete within the vector's own micro-batch — the
    * attachGraph argument, so n_flags is final when the group fires).
    * Admission POLICY: admitted = the content keeper AND zero
    * contamination flags (the clean-staging composition); cell + codes
    * ride as ANNOTATIONS — the inverted-list/ADC insert the consumer
    * performs. Replay contract: batches in nondecreasing vec_id order
    * (ids assigned at ingest); a replayed vec_id is in the group's
    * emitted list and fires nothing — replay-idempotent (parity
    * spec-gated vs the four standalone surfaces composed, split across
    * micro-batches, shelf-loaded). Scale shape per micro-batch: two
    * narrow maps (assign+encode fused in-row), one bounded
    * stream-static hash join (eval index — broadcast-sized between
    * benchmark updates), ONE shuffle to the content-key group; state
    * is the 16-byte keeper + maxSeen + the emitted ids per distinct
    * content (the manifest ops' seen-id budget: one id per ingested
    * copy of that content — production would TTL the list by ingest
    * horizon, the dqGate convention). Replica-flood arithmetic: an
    * identical-replica flood concentrates ALL its ids into one group —
    * the ingest gate IS the collapse point — so membership rides the
    * `maxSeen` fast path: under the nondecreasing contract a fresh
    * arrival exceeds maxSeen and never scans the list; only genuinely
    * replayed ids (≤ maxSeen) pay the list walk. Per-arrival work
    * stays O(1) at any concentration.
    */
  def ingestVectors(vecs: Dataset[VecIn],
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      evalIndex: DataFrame): Dataset[IngestVecVerdict] = {
    import vecs.sparkSession.implicits._
    val keyed = vecs.map { v =>
      val (h1, h2) = embContentKey(v.embedding)
      KeyedVec(h1, h2, v.vec_id, v.embedding)
    }.toDF()
    // SQ8 codes ride the SAME kind-0 branch row in-row (the
    // pqEncode-extra rule: an annotation, not a second branch) through
    // the shared sq8Codes expression — the encodeVectorsSq8 surface's
    // construction verbatim.
    val mainB = graft.ext.Similarity.pqEncode(
        keyed.withColumn("cell", cellExpr(centroids))
          .withColumn("sq8", graft.ext.Similarity.sq8Codes("embedding")),
        codebooks, extra = Seq("h1", "h2", "cell", "sq8", "embedding"))
      .select(col("h1"), col("h2"), col("vec_id"), lit(0).as("kind"),
        col("cell"),
        array((0 until graft.ext.Similarity.pqM).map(s => col(s"c$s")): _*)
          .as("codes"),
        col("sq8"),
        lit(-1L).as("eval_id"),
        col("embedding"))
    val screenB = graft.ext.Similarity
      .streamScreenCands(keyed, evalIndex, extra = Seq("h1", "h2"))
      .select(col("h1"), col("h2"), col("vec_id"), lit(1).as("kind"),
        lit(-1L).as("cell"), lit(null).cast("array<bigint>").as("codes"),
        lit(null).cast("array<bigint>").as("sq8"),
        col("eval_id"),
        lit(null).cast("array<float>").as("embedding"))
    mainB.unionByName(screenB).as[IngestVecCand]
      .groupByKey(c => (c.h1, c.h2))
      .flatMapGroupsWithState[IngestVecState, IngestVecVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, Long), rows: Iterator[IngestVecCand],
         state: GroupState[IngestVecState]) =>
          var st = if (state.exists) state.get
            else IngestVecState(Long.MaxValue, Long.MinValue, Nil)
          val out = scala.collection.mutable.Buffer[IngestVecVerdict]()
          // Ascending vec_id, the dedup operator's in-batch order: the
          // running-min keeper reproduces dedupVectorsExactOnline verbatim.
          rows.toSeq.groupBy(_.vec_id).toSeq.sortBy(_._1)
            .foreach { case (id, rs) =>
              // maxSeen fast path: ids arrive nondecreasing, so only a
              // replayed id (≤ maxSeen) ever walks the emitted list.
              if (id > st.maxSeen || !st.emitted.contains(id)) {
                if (id < st.keeper) st = st.copy(keeper = id)
                // The kind-0 narrow map emits one row per arriving vector,
                // so every vector in the group carries its cell + codes.
                val m = rs.find(_.kind == 0).get
                val nFlags = rs.filter(_.kind == 1).map(_.eval_id)
                  .distinct.size.toLong
                val isDup = if (id == st.keeper) 0L else 1L
                val adm = if (isDup == 0L && nFlags == 0L) 1L else 0L
                out += IngestVecVerdict(id, st.keeper, isDup, m.cell,
                  m.codes, m.sq8, nFlags, adm,
                  if (adm == 1L) m.embedding else null)
                st = st.copy(maxSeen = math.max(st.maxSeen, id),
                  emitted = id :: st.emitted)
              }
            }
          state.update(st)
          out.iterator
      }
  }

  case class ManifestDoc(doc_id: Long, source: String, lang: String,
    text: String)

  case class ManifestCand(source: String, lang: String, h: String,
    doc_id: Long, ws_tokens: Long, n_chars: Long)
  case class ManifestInc(source: String, lang: String, doc_id: Long,
    distinct_inc: Long, ws_tokens: Long, n_chars: Long)
  case class ManifestState(seen: List[Long])

  /** Streaming corpus-manifest INCREMENTS — the data card
    * (TextAnalysis.xCorpusManifest) kept live at ingest: each arriving
    * doc emits one increment row carrying its (source, lang) slice,
    * token/char volume, and a distinct_inc flag that is 1 iff the doc
    * is the FIRST arrival of its exact text (the exact-dedup md5 over
    * simple-lowered trimmed text — the same hash the batch card
    * counts DISTINCT over), so any downstream rollup of the emitted
    * rows — a running update-mode aggregate, a periodic batch sum — IS
    * the batch manifest over everything ingested (parity spec-gated:
    * rolled-up increments equal xCorpusManifest column-for-column,
    * shares recomputed by the same integer floor-div). Keyed by
    * (source, lang, text-hash); state is the seen doc-id list per
    * DISTINCT text (the dedup-store key-set argument — one long per
    * ingested doc overall, never the text), which gives BOTH
    * idempotence levels at once: a replayed doc_id emits nothing (its
    * id is in state), a new copy of a seen text emits with
    * distinct_inc = 0. Replay contract (the dedupSpansOnline / dqGate
    * convention): batches arrive in nondecreasing doc_id order — ids
    * are assigned at ingest. Groups also sort by doc_id WITHIN a
    * batch, so under that contract the distinct flag always lands on a
    * content key's minimum id regardless of where micro-batch
    * boundaries fall; under arbitrary splits a later-id copy in an
    * earlier batch would carry it instead, but the rollup guarantee
    * (exactly one distinct_inc = 1 per content key) holds either way.
    */
  def manifestDocs(docs: Dataset[ManifestDoc]): Dataset[ManifestInc] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .select(col("source"), col("lang"),
        md5(graft.functions.VectorFunctions.simpleLower(trim(col("text"))))
          .as("h"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .as[ManifestCand]
      .groupByKey(c => (c.source, c.lang, c.h))
      .flatMapGroupsWithState[ManifestState, ManifestInc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (String, String, String), rows: Iterator[ManifestCand],
         state: GroupState[ManifestState]) =>
          var seen = if (state.exists) state.get.seen else Nil
          // O(1) membership per arrival (a dup-heavy stream can put
          // many copies in one content group; List.contains would be
          // quadratic across a group's lifetime).
          val seenSet = scala.collection.mutable.HashSet(seen: _*)
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { c =>
            if (!seenSet.add(c.doc_id)) None
            else {
              val first = seen.isEmpty && seenSet.size == 1
              seen = c.doc_id :: seen
              Some(ManifestInc(c.source, c.lang, c.doc_id,
                if (first) 1L else 0L, c.ws_tokens, c.n_chars))
            }
          }
          state.update(ManifestState(seen))
          out.iterator
      }
  }

  /** The card rollup over emitted manifest increments — the scaladoc's
    * "any rollup of the increments IS the batch card" claim as SHARED
    * code instead of per-consumer arithmetic: per (source, lang) slice,
    * docs / first-arrival distincts / volumes summed, token shares by
    * the same integer floor-div as TextAnalysis.manifestCard. Feeding
    * two of these (a frozen reference card vs the live increments'
    * card) to TextAnalysis.driftBetween is the LIVE drift monitor; the
    * parity spec pins that composition against the batch x_corpus_drift
    * gate half-for-half.
    */
  def cardFromIncrements(incs: DataFrame): DataFrame = {
    val per = incs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("distinct_inc")).as("n_distinct_texts"),
        sum(col("ws_tokens")).as("ws_tokens"),
        sum(col("n_chars")).as("total_chars"))
    per.crossJoin(broadcast(per.agg(sum(col("ws_tokens")).as("tot"))))
      .select(col("source"), col("lang"), col("n_docs"),
        col("n_distinct_texts"), col("ws_tokens"), col("total_chars"),
        expr("ws_tokens * 10000 div tot").as("token_share_bp"))
  }

  case class VecCard(vec_id: Long, label: Int, embedding: Array[Float])
  case class VecCardInc(label: Int, vec_id: Long, distinct_inc: Long,
    n_dims: Long, sq_q: Long)

  /** Streaming VECTOR-manifest increments — the embedding data card
    * (Similarity.xEmbManifest) at ingest, the manifestDocs idiom with
    * the vector family's content address: keyed by (label,
    * embContentKey) — the fixed-width 128-bit hash over float bits
    * with ±0.0 collapsed and NaNs canonicalized, NEVER the embedding
    * itself (the state-store invariant) — each arriving vector emits
    * its dim count and exact-integer quantized square-norm mass
    * (trunc(x²·2²⁴) summed as longs, computed by the SAME Spark
    * expression the batch card aggregates), with distinct_inc = 1 on
    * the first arrival of its exact content. Rolled up, the emitted
    * rows equal xEmbManifest column-for-column (min/max dims from the
    * per-row dim counts, shares by the same integer floor-div) —
    * parity spec-gated across micro-batch splits with replays
    * emitting nothing. Replay contract (the manifestDocs convention):
    * batches in nondecreasing vec_id order pin the distinct flag to a
    * content key's minimum id; the rollup guarantee (exactly one
    * distinct_inc = 1 per content key) holds under arbitrary splits.
    */
  def manifestVectors(vecs: Dataset[VecCard]): Dataset[VecCardInc] = {
    import vecs.sparkSession.implicits._
    val withQ = vecs.toDF()
      .withColumn("sq_q", expr(
        """aggregate(embedding, 0L, (a, x) ->
          |  a + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
          |        * 16777216.0D AS BIGINT))""".stripMargin))
      .withColumn("n_dims", size(col("embedding")).cast("long"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("n_dims"), col("sq_q"))
      .as[(Long, Int, Array[Float], Long, Long)]
    withQ.groupByKey(r => (r._2, embContentKey(r._3)))
      .flatMapGroupsWithState[ManifestState, VecCardInc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, (Long, Long)),
         rows: Iterator[(Long, Int, Array[Float], Long, Long)],
         state: GroupState[ManifestState]) =>
          var seen = if (state.exists) state.get.seen else Nil
          val seenSet = scala.collection.mutable.HashSet(seen: _*)
          val out = rows.toSeq.sortBy(_._1).flatMap { r =>
            if (!seenSet.add(r._1)) None
            else {
              val first = seen.isEmpty && seenSet.size == 1
              seen = r._1 :: seen
              Some(VecCardInc(r._2, r._1, if (first) 1L else 0L,
                r._4, r._5))
            }
          }
          state.update(ManifestState(seen))
          out.iterator
      }
  }

  case class DiffDoc(doc_id: Long, admitted: Long)

  /** Streaming corpus VERSION-DIFF increments — the observability
    * column's last batch-only member (x_corpus_diff) kept live at
    * ingest: each arriving per-doc admission verdict is compared
    * against the FROZEN v1 membership relation (the shelf's
    * `art_corpus_v1_members`, stamped like every frozen state) and
    * emits its x_corpus_diff status on arrival: admitted ∧ in-v1 →
    * 'unchanged', admitted ∧ ¬in-v1 → 'added', ¬admitted ∧ in-v1 →
    * 'removed'; a doc in neither corpus emits nothing (the batch gate
    * covers v1 ∪ v2 only). The v2 POLICY is whatever produced the
    * verdict stream: the parity spec replays the batch FULL policy's
    * membership (fullCorpus — x_corpus_diff's own v2) and matches the
    * gate row-for-row; wiring ingestDocsFull's admitted column instead
    * diffs the streaming admission matrix against v1 — a valid diff of
    * a DIFFERENT v2, not the oracle-gated one (the two policies share
    * no construction, so don't expect x_corpus_diff's statuses from
    * it). The status vocabulary is the ONE shared
    * builder (CorpusPrep.diffStatus — never a re-derivation), and the
    * surface is STATELESS (one stream-static left join on 8-byte ids +
    * a narrow map), so it is micro-batch-split-proof by construction
    * and replays re-emit the same deterministic row — an upsert sink
    * keyed on doc_id (the w3_upsert_dedup convention) absorbs
    * at-least-once upstreams. Works unchanged over a batch frame (the
    * parity spec replays the corpus through it against the batch
    * gate row-for-row). Scale shape: the static side is the persisted
    * id relation — broadcast while small, id-bucketed at 100 TB; no
    * state store, no watermark, nothing corpus-scale on any driver.
    */
  def diffDocsIncrement(verdicts: DataFrame, v1Members: DataFrame): DataFrame =
    verdicts.select(col("doc_id"), col("admitted"))
      .join(v1Members.select(col("doc_id")).withColumn("f_v1", lit(1)),
        Seq("doc_id"), "left")
      // Null-strict flag handling: f_v1 is NULL (not false) off the left
      // join — coalesce BEFORE the boolean algebra or 'added' rows would
      // null through diffStatus's negation into 'unchanged'.
      .withColumn("f_v1", coalesce(col("f_v1"), lit(0)))
      .filter(col("admitted") === 1L || col("f_v1") === 1)
      .select(col("doc_id"),
        graft.ext.CorpusPrep.diffStatus(
          col("f_v1") === 1, col("admitted") === 1L).as("status"))

  case class RemovedVec(id2: Long)
  case class TombSeen(emitted: Boolean)

  /** Streaming REMOVAL feed for the serve index (r18 — the r17
    * verdict's missing mirror: arrivals flowed end-to-end through
    * serveDeltaStream while removals were batch-only): the version
    * diff's `removed` statuses, mapped to the served vector ids and
    * emitted EXACTLY ONCE each. The diff side IS [[diffDocsIncrement]]
    * (one status construction — the diffStatus builder, never a
    * re-derivation); `docToVec` is the registry relation linking
    * corpus doc ids to their indexed vector ids (static side — slim,
    * id-keyed). The registry join is INNER by contract: a removed doc
    * with no registry row is an UNINDEXED doc (not every corpus doc
    * has a vector) and correctly produces no tombstone — the registry
    * is the source of truth for what was indexed, so it must ship
    * WITH the shelf build that indexed those vectors (a stale
    * registry is shelf version skew, the same class the stamp guard
    * exists for; docs mapped to a retired vector still fail loudly
    * downstream at appendServeTombstones' served-set guard). The trailing stateful stage (one boolean per removed
    * id) exists because diffDocsIncrement is deliberately STATELESS:
    * an at-least-once upstream re-delivering a ¬admitted verdict in a
    * LATER micro-batch would re-emit 'removed', and the tombstone
    * append's double-removal guard would then fail loudly on a
    * re-delivery that is NOT a bookkeeping error — so re-deliveries
    * are absorbed in state like every ingest gate, and the guard
    * keeps catching genuine double removals from distinct callers.
    * Replay contract: a replayed micro-batch re-runs with its
    * pre-batch state and re-emits the same ids deterministically —
    * the content-derived batch id downstream then no-ops the append
    * (the serveDeltaStream three-contract story, removal side).
    */
  def removedVecsOnce(verdicts: DataFrame, v1Members: DataFrame,
      docToVec: DataFrame): Dataset[RemovedVec] = {
    import verdicts.sparkSession.implicits._
    diffDocsIncrement(verdicts, v1Members)
      .filter(col("status") === "removed")
      .join(docToVec.select(col("doc_id"), col("id2")), Seq("doc_id"))
      .select(col("id2")).as[RemovedVec]
      .groupByKey(_.id2)
      .flatMapGroupsWithState[TombSeen, RemovedVec](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, _: Iterator[RemovedVec], state: GroupState[TombSeen]) =>
          if (state.exists && state.get.emitted) Iterator.empty
          else {
            state.update(TombSeen(emitted = true))
            Iterator.single(RemovedVec(id))
          }
      }
  }

  case class DqRow(row_id: Long, key: Option[Long])
  case class DqState(keeper: Long, maxSeen: Long)
  case class DqVerdict(row_id: Long, key: Option[Long], check: String,
    keeper_id: Long)

  /** Streaming data-quality gate — the reference's dbt unique/not_null
    * schema-test battery (Quality.dqChecks / x_kroger_schema_tests) at
    * INGEST time, the contamination-screen idiom: clean keyed rows pass
    * through tagged 'ok'; a null-key row surfaces a 'not_null'
    * violation; a row whose key is already owned surfaces a 'unique'
    * violation carrying the keeper's row id. State per occupied key is
    * one fixed (keeper, maxSeen) pair — the persisted key set any
    * ingest-time uniqueness check must keep (the dedupVectorsExactOnline
    * content-set argument); null-key rows key their state by their own
    * row id, so not-null violations are exactly-once too. Replay
    * contract: batches in nondecreasing row_id order (ids assigned at
    * ingest, the admission convention); a replayed row (row_id ≤ the
    * key's maxSeen) emits NOTHING — verdicts are idempotent under
    * at-least-once upstreams, so a violation surfaces exactly once and
    * a clean row passes exactly once. Batch parity is spec-gated: the
    * distinct violated keys equal Quality.uniqueViolations' count and
    * the not_null rows equal notNullViolations' on the same data,
    * split across micro-batches with a replayed batch emitting
    * nothing.
    */
  def dqGate(rows: Dataset[DqRow]): Dataset[DqVerdict] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.key.isEmpty, r.key.getOrElse(r.row_id)))
      .flatMapGroupsWithState[DqState, DqVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateDq)
  }

  private[streaming] def updateDq(gk: (Boolean, Long),
      rows: Iterator[DqRow],
      state: GroupState[DqState]): Iterator[DqVerdict] = {
    val sorted = rows.toSeq.sortBy(_.row_id)
    if (gk._1) {
      // Null-key group (keyed by the row's own id): one not_null
      // violation, ever.
      if (state.exists) Iterator.empty
      else {
        state.update(DqState(-1L, gk._2))
        Iterator.single(DqVerdict(gk._2, None, "not_null", -1L))
      }
    } else {
      var keeper = state.getOption.map(_.keeper).getOrElse(-1L)
      var maxSeen = state.getOption.map(_.maxSeen).getOrElse(Long.MinValue)
      val out = sorted.flatMap { r =>
        if (r.row_id <= maxSeen) None
        else {
          maxSeen = r.row_id
          if (keeper < 0) {
            keeper = r.row_id
            Some(DqVerdict(r.row_id, r.key, "ok", r.row_id))
          } else Some(DqVerdict(r.row_id, r.key, "unique", keeper))
        }
      }
      state.update(DqState(keeper, maxSeen))
      out.iterator
    }
  }

  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSessions)
  }

  private[streaming] def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    // All session arithmetic runs at µs — the batch operator's ts_us
    // precision — including the gap comparison (an ms-truncated gap
    // reads exactly-30:00.000 when the true µs gap is longer, flipping
    // the boundary verdict vs batch). State (start, last) carries µs.
    val out = scala.collection.mutable.Buffer[SessionOut]()
    def close(s: SessionState): Unit =
      out += SessionOut(userId, s.n, (s.last - s.start) / 60000000.0)
    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val t = tsMicros(e.ts)
        cur match {
          case Some(s) if t >= s.start - gapUs && t - s.last <= gapUs =>
            // In-reach event (possibly out-of-order within the session's
            // gap window): widen both ends so durations match batch.
            cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
          case Some(s) if t > s.last + gapUs =>
            close(s)
            cur = Some(SessionState(t, t, 1))
          case Some(_) =>
            // Too-late event beyond the current session's backward reach:
            // state only tracks the latest session, so emit it as its own
            // single-event session (the batch operator, which sorts
            // globally, would have started a separate session here too).
            close(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // Timeout API is ms-granular; round up so a session is never
        // closed while still (sub-ms) inside its gap.
        state.setTimeoutTimestamp(s.last / 1000L + gapUs / 1000L + 1L)
      }
    }
    out.iterator
  }
}
