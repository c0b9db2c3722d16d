package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the DSIR/NB selection family, graph centrality,
  * decontamination, vector clustering/prep arms, the streaming
  * encode/screen/mix gates, and session+attribution (split from
  * ExtensionsSpec in r14; fixtures shared via GraftTest).
  */
class SelectionGraphSpec extends AnyFunSuite {
  private val sf = GraftTest.sf
  lazy val spark: SparkSession = GraftTest.spark
  lazy val shelfDir: String = GraftTest.shelf._1
  lazy val shelfCounts: Map[String, Long] = GraftTest.shelf._2

  private def md5Bucket100(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 100
  }

  test("DSIR selects exactly N docs and ranks in-target vocab above out-of-target") {
    import spark.implicits._
    // Planted pair: a TARGET-split doc (bucket < 20) whose unique tokens
    // therefore appear in the target LM, and a non-target doc with its
    // own unique tokens (target count 0). The target-vocab doc's
    // log-ratio is the maximum positive per-token value; the other's is
    // negative — the weight order is forced, independent of the corpus.
    val tgtId = (9000001L to 9000400L).find(md5Bucket100(_) < 20).get
    val othId = (9000001L to 9000400L).find(md5Bucket100(_) >= 20).get
    val body = (0 until 8).map(i => s"qzx$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .unionByName(Seq(
        (tgtId, body, "en", "srcx", 1L),
        (othId, (0 until 8).map(i => s"wvu$i").mkString(" "), "en", "srcx", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ext.Selection.xDsirSelect(spark, tmp).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Double]("dsir_weight"), r.getAs[Long]("selected")))).toMap
    assert(byId(tgtId)._1 > byId(othId)._1,
      s"target-vocab doc must outrank out-of-target: $byId")
    assert(out.map(_.getAs[Long]("selected")).sum == 100L,
      "exactly selectN docs must be selected")
    // The cut is consistent: every selected (w, id) dominates every
    // unselected one lexicographically (w desc, id asc).
    val sel = out.filter(_.getAs[Long]("selected") == 1L)
      .map(r => (r.getAs[Double]("dsir_weight"), r.getAs[Long]("doc_id")))
    val unsel = out.filter(r => r.getAs[Long]("selected") == 0L &&
        !r.isNullAt(r.fieldIndex("dsir_weight")))
      .map(r => (r.getAs[Double]("dsir_weight"), r.getAs[Long]("doc_id")))
    val worstSel = sel.minBy(p => (p._1, -p._2))
    assert(unsel.forall(u => u._1 < worstSel._1 ||
      (u._1 == worstSel._1 && u._2 > worstSel._2)),
      "an unselected doc dominates the cutoff")
  }

  test("NB classifier predicts the class owning a planted disjoint vocabulary") {
    import spark.implicits._
    // Train: three docs each for classes qa/qb with disjoint vocab, ids
    // chosen in the train split (bucket < 80). Held-out: one doc
    // (bucket >= 80) written in qa's vocabulary but labeled qb — the
    // classifier must predict qa (3 tokens × ln(10/..) dominates any
    // prior gap) and report hit = 0.
    val ids = (9100001L to 9100500L)
    val trainIds = ids.filter(md5Bucket100(_) < 80).take(6).toSeq
    val heldId = ids.find(md5Bucket100(_) >= 80).get
    val rows = trainIds.take(3).map(id => (id, "aqua aqua aqua", "en", "qa", 1L)) ++
      trainIds.drop(3).map(id => (id, "bravo bravo bravo", "en", "qb", 1L)) :+
      ((heldId, "aqua aqua aqua", "en", "qb", 1L))
    val tmp = java.nio.file.Files.createTempDirectory("nbclass").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .unionByName(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ext.Selection.xTextNbClass(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("pred_source"), r.getAs[String]("true_source"),
          r.getAs[Long]("hit")))).toMap
    assert(out.contains(heldId), "held-out planted doc missing from scoring")
    assert(out(heldId)._1 == "qa",
      s"disjoint-vocab doc must classify to the vocab owner: ${out(heldId)}")
    assert(out(heldId)._2 == "qb" && out(heldId)._3 == 0L,
      s"hit must reflect pred != true label: ${out(heldId)}")
    // Every held-out doc scores exactly once.
    val all = ext.Selection.xTextNbClass(spark, tmp)
    assert(all.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("kNN graph ranks a planted identical pair as mutual rank-1 at cosine 1.0") {
    import spark.implicits._
    // Two identical planted vectors land in the same quantizer cell by
    // construction and are each other's maximum-similarity neighbor;
    // ranks are contiguous per vector and self-edges are absent.
    val vec = Seq.fill(64)(0.25f)
    val tmp = java.nio.file.Files.createTempDirectory("knngraph").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .unionByName(Seq((9000001L, vec, 0), (9000002L, vec, 0))
        .toDF("vec_id", "embedding", "label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = ext.Similarity.xKnnGraph(spark, tmp).collect()
    assert(out.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("nn_id")),
      "self-edge in kNN graph")
    val ranks = out.groupBy(_.getAs[Long]("vec_id"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("nn_rank")).sorted.toSeq }
    assert(ranks.forall(rs => rs == (1L to rs.size).toSeq),
      "per-vector ranks not contiguous from 1")
    val top1 = out.filter(r => r.getAs[Long]("nn_rank") == 1L)
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("nn_id"), r.getAs[Double]("cos_sim")))).toMap
    assert(top1.get(9000001L).exists(t => t._1 == 9000002L && t._2 == 1.0),
      s"planted twin not rank-1: ${top1.get(9000001L)}")
    assert(top1.get(9000002L).exists(t => t._1 == 9000001L && t._2 == 1.0),
      s"planted twin not mutual: ${top1.get(9000002L)}")
  }

  test("pagerank: planted clique concentrates mass, zero-in-degree nodes hold the base") {
    import spark.implicits._
    // Plant six scaled copies of vector 0's direction: identical
    // direction ⇒ same quantizer cell, rounded cosine 1.0 to each
    // other beats every stock neighbor (corpus cosines top out ~0.47),
    // so the seven co-directional vectors (vec 0 + six plants) form a
    // closed top-5 clique that keeps re-sending its full mass to
    // itself. Deterministic consequences of the integer update rule:
    // (a) one score per vector; (b) any node with NO in-edges in the
    // gated graph holds exactly the 0.15e9 base after every round —
    // including the largest-id plant, which the cos-then-id tiebreak
    // structurally shadows out of every clique member's top-5; (c) the
    // six smaller-id clique members each keep score >= the initial 1e9
    // (five in-links of score div 5, contributors never dip below 1e9
    // by the same induction) — the prototypicality signal the operator
    // exists to measure, >6x any zero-in-degree node.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val clique = (1 to 6).map(i =>
      (9000000L + i, v.map(_ * (1.0f + 0.01f * i)).toArray, 7))
    val tmp = java.nio.file.Files.createTempDirectory("pagerank").toString
    base.unionByName(clique.toDF("vec_id", "embedding", "label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val scores = ext.Similarity.xGraphPagerank(spark, tmp).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score_e9")).toMap
    val n = spark.read.parquet(s"$tmp/embeddings.parquet").count()
    assert(scores.size == n, s"expected $n scores, got ${scores.size}")
    val linked = ext.Similarity.xKnnGraph(spark, tmp)
      .select("nn_id").distinct().collect().map(_.getLong(0)).toSet
    val noIn = scores.keySet -- linked
    assert(noIn.nonEmpty, "corpus unexpectedly has no zero-in-degree node")
    assert(noIn.forall(id => scores(id) == 150000000L),
      s"zero-in-degree nodes off the base: ${noIn.filter(scores(_) != 150000000L)}")
    val members = Seq(0L) ++ (1 to 5).map(9000000L + _)
    members.foreach { id =>
      assert(scores(id) >= 1000000000L,
        s"clique member $id lost mass: ${scores(id)}")
    }
    assert(!linked.contains(9000006L) && scores(9000006L) == 150000000L,
      "largest-id plant should be tiebreak-shadowed to the base score")
  }

  test("clean pagerank: identical on a dup-free corpus, collapses replica vote-stuffing") {
    import spark.implicits._
    // (a) The raw corpus has no bit-identical pair, so keeper pagerank
    // == base pagerank byte-for-byte (the clean-graph pin: cost changes
    // on duplicated corpora, semantics never change on clean ones).
    val base = ext.Similarity.xGraphPagerank(spark, sf).collect().map(_.toString)
    val clean = ext.Similarity.xGraphPagerank(spark, sf,
      srcOverride = Some(ext.Dedup.embExactKeepers(spark, sf)))
      .collect().map(_.toString)
    assert(base.sameElements(clean), "clean pagerank diverged on a dup-free corpus")
    // (b) Plant three bit-identical replicas of vector 0: the clean arm
    // scores only the min-id keeper — replicas never enter the graph,
    // so a replica set cannot re-vote its region's centrality N×.
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = raw.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq((9000001L, v.toArray, 5), (9000002L, v.toArray, 5))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("prclean").toString
    raw.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val ids = ext.Similarity.xGraphPagerank(spark, tmp,
      srcOverride = Some(ext.Dedup.embExactKeepers(spark, tmp)))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids.contains(0L) && !ids.contains(9000001L) && !ids.contains(9000002L),
      "replicas must collapse to the keeper before centrality")
    assert(ids.size == raw.count(), "keeper set size must be the distinct corpus")
  }

  test("pagerank select keeps exactly N, ordered by (score desc, id) at the boundary") {
    val rows = ext.Similarity.xGraphPagerankSelect(spark, sf).collect()
    val sel = rows.filter(_.getAs[Long]("selected") == 1L)
    val unsel = rows.filter(_.getAs[Long]("selected") == 0L)
    assert(sel.length == 100, s"expected exactly 100 selected, got ${sel.length}")
    // Total order (score DESC, vec_id ASC): the worst selected row must
    // still beat the best unselected row.
    def key(r: org.apache.spark.sql.Row) =
      (-r.getAs[Long]("score_e9"), r.getAs[Long]("vec_id"))
    val worstSel = sel.map(key).max
    val bestUnsel = unsel.map(key).min
    assert(implicitly[Ordering[(Long, Long)]].lt(worstSel, bestUnsel),
      s"selection boundary violates the (score desc, id) order: $worstSel !< $bestUnsel")
    // Scores are the CLEAN arm's scores verbatim (prototype votes count
    // distinct voters — the collapse-first policy).
    val clean = ext.Similarity.xGraphPagerank(spark, sf,
      srcOverride = Some(ext.Dedup.embExactKeepers(spark, sf)))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score_e9")).toMap
    assert(rows.forall(r => clean(r.getAs[Long]("vec_id")) == r.getAs[Long]("score_e9")),
      "select arm drifted from the clean pagerank scores")
  }

  test("pagerank pairsOverride: a persisted winnow pair relation yields identical rows") {
    // The r18 shared-subchain contract: composed callers (the screen/
    // audit arms) pass ONE persisted copy of the gated winnow pair
    // relation into the centrality chain instead of letting it re-derive
    // its own — this pins that the override arm is row-identical to the
    // default derivation (same tree over the same rows, the
    // precomputedLabels discipline), so the sharing can never drift the
    // gated x_text_graph_pagerank_select semantics.
    val pairs = ext.TextAnalysis.xTextWinnowPairs(spark, sf).persist()
    val overridden = ext.TextAnalysis
      .xTextGraphPagerankSelect(spark, sf, pairsOverride = Some(pairs))
      .collect().map(_.toSeq)
    val default = ext.TextAnalysis
      .xTextGraphPagerankSelect(spark, sf)
      .collect().map(_.toSeq)
    assert(overridden.length == default.length,
      s"override arm row count ${overridden.length} != ${default.length}")
    assert(overridden.zip(default).forall { case (a, b) => a == b },
      "pairsOverride arm drifted from the default winnow-pair derivation")
  }

  test("weighted pagerank: uniform weights degenerate to equal split, varied weights diverge") {
    import spark.implicits._
    // Isolated synthetic corpus: a 7-member co-directional clique
    // (scaled copies — bit-distinct, all mutual rounded cos 1.0) plus
    // 15 sign-pattern directions far from it and from each other. The
    // clique shares one quantizer cell; every clique edge carries the
    // SAME weight (w = 20001), so the proportional split equals the
    // equal split EXACTLY (floor(s·20001/100005) = floor(s/5) — the
    // degeneracy that pins the weighted arithmetic against the
    // unweighted arm's). The far vectors contribute no clique edges,
    // so clique scores must agree across arms to the last unit.
    // Ids 0..22 dense (the quantizer seeds from vec_id < 16, so the
    // first 16 ids must exist). The 16 far vectors OWN the seed ids:
    // if clique members seeded, each would sit alone in its own cell
    // (scaled copies have distinct norms, so each is its own nearest
    // seed) and no clique edge would exist. As non-seeds they all
    // assign to one shared nearest-centroid cell — the planted-spec
    // layout every vector spec here relies on.
    val rng = new scala.util.Random(7)
    val far = (0 to 15).map(j =>
      (j.toLong, Array.fill(64)((if (rng.nextBoolean()) 1f else -1f) *
        (0.5f + rng.nextFloat())), 1))
    val clique = (16 to 22).map(i =>
      (i.toLong, Array.fill(64)(0.25f * (1.0f + 0.01f * (i - 15))), 0))
    val tmp = java.nio.file.Files.createTempDirectory("prw").toString
    (clique ++ far).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    def scores(weighted: Boolean, dir: String) =
      ext.Similarity.xGraphPagerank(spark, dir,
        srcOverride = Some(ext.Dedup.embExactKeepers(spark, dir)),
        weighted = weighted).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score_e9")).toMap
    val uw = scores(weighted = false, tmp)
    val w = scores(weighted = true, tmp)
    (16 to 22).foreach { i =>
      assert(uw(i.toLong) == w(i.toLong),
        s"uniform-weight clique member $i diverged: ${uw(i.toLong)} vs ${w(i.toLong)}")
    }
    // Six of the seven receive the full 5-in-link mass (the largest id
    // is tiebreak-shadowed, the base pagerank spec's structural claim).
    assert((16 to 22).count(i => w(i.toLong) >= 1000000000L) >= 6,
      s"clique lost mass under uniform weights: ${(16 to 22).map(i => w(i.toLong))}")
    // On the stock corpus (varied cosines) the proportional split must
    // actually bite: at least one node's score differs between arms —
    // while zero-in-degree nodes hold the base in BOTH.
    val suw = scores(weighted = false, sf)
    val sw = scores(weighted = true, sf)
    assert(suw.exists { case (id, s) => sw(id) != s },
      "weighted arm never diverged from unweighted on varied cosines")
    val baseOnly = suw.filter(_._2 == 150000000L).keySet
    assert(baseOnly.forall(id => sw(id) == 150000000L),
      "a zero-in-degree node gained mass under weighting")
  }

  test("embedding decontamination flags only cross-split near-dup pairs") {
    import spark.implicits._
    // Pick planted ids with KNOWN md5-holdout membership (bucket < 10
    // of 100 = eval) instead of hardcoding — the bucket is a pure
    // function of the id, so the test derives it the same way the
    // operator does. One eval + two train members of a co-directional
    // near-dup set: both cross-split pairs must be flagged with the
    // eval id on the eval side, and NO within-split pair may appear.
    val buckets = (9000001L to 9000200L).toDF("vec_id")
      .withColumn("b", ext.TextAnalysis.md5Bucket(100, col("vec_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalId = buckets.toSeq.sortBy(_._1).find(_._2 < 10).get._1
    val trainIds = buckets.toSeq.sortBy(_._1).filter(_._2 >= 10).take(2).map(_._1)
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (evalId, v.map(_ * 1.01f).toArray, 5),
      (trainIds(0), v.map(_ * 1.02f).toArray, 5),
      (trainIds(1), v.map(_ * 1.03f).toArray, 6))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("embcontam").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val out = ext.Similarity.xEmbContamination(spark, tmp).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"))).toSet
    def bucket(id: Long) = buckets.getOrElse(id,
      // ids outside the probed range (e.g. vec 0 pairing in): recompute
      Seq(id).toDF("vec_id")
        .select(ext.TextAnalysis.md5Bucket(100, col("vec_id"))).head.getLong(0))
    assert(out.nonEmpty, "planted cross-split near-dups not flagged")
    out.foreach { case (t, e) =>
      assert(bucket(e) < 10, s"eval side $e is not in the holdout")
      assert(bucket(t) >= 10, s"train side $t is in the holdout")
    }
    assert(out.contains((trainIds(0), evalId)) && out.contains((trainIds(1), evalId)),
      s"expected both planted cross pairs, got $out")
    assert(!out.exists { case (t, e) => t == trainIds(0) && e == trainIds(1) } &&
      !out.exists { case (t, e) => t == trainIds(1) && e == trainIds(0) },
      "within-train pair leaked into the decontamination verdicts")
  }

  test("decontaminated prep drops the eval holdout and the leaking train keeper") {
    import spark.implicits._
    // Plant a near-dup pair on a NOVEL direction (no corpus vector
    // approaches it) straddling the split, with the TRAIN id LOWER so
    // banded dedup alone would KEEP it (the higher-id eval partner is
    // the dedup loser) — only the leak stage can drop it. The clean
    // arm must keep that train keeper; the decon arm must drop it AND
    // every eval-bucket id.
    val buckets = (9000001L to 9000200L).toDF("vec_id")
      .withColumn("b", ext.TextAnalysis.md5Bucket(100, col("vec_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.toSeq.sortBy(_._1).find(_._2 >= 10).get._1
    val evalId = buckets.toSeq.sortBy(_._1)
      .find(kv => kv._2 < 10 && kv._1 > trainId).get._1
    val dirB = Array.fill(64)(0.1f)
    val planted = Seq(
      (trainId, dirB.map(_ * 1.02f), 5),
      (evalId, dirB.map(_ * 1.01f), 6))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("decon").toString
    spark.read.parquet(s"$sf/embeddings.parquet").unionByName(planted)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // The dedup stage must NOT be what drops the train keeper: its only
    // near-dup partner is the HIGHER-id eval plant, so the banded
    // verdicts never list it as a loser (id2) — only the leak stage can
    // remove it. (The composed clean OUTPUT may still cut it at the
    // per-cell cap, so the no-drop claim anchors on the verdict
    // operator, not the capped artifact.)
    val losers = ext.Similarity.xDedupEmbCosineLshClean(spark, tmp).collect()
      .map(_.getAs[Long]("id2")).toSet
    assert(!losers.contains(trainId),
      "dedup dropped the lower-id train plant; the leak claim would be vacuous")
    assert(losers.contains(evalId),
      "the higher-id eval plant should be the dedup loser of the planted pair")
    val decon = ext.Similarity.xEmbCorpusPrepDecon(spark, tmp).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(!decon.contains(trainId),
      "decon arm must drop the leaking train keeper")
    assert(decon.nonEmpty, "decon prep produced an empty corpus")
    val deconBuckets = decon.toSeq.toDF("vec_id")
      .withColumn("b", ext.TextAnalysis.md5Bucket(100, col("vec_id")))
      .collect()
    assert(deconBuckets.forall(_.getLong(1) >= 10),
      "an eval-holdout id survived into the decontaminated corpus")
    // The parameterized arm (r15): the leak and holdout drops replay
    // at (tablePlanesWide, k=64) — the planted pair sits at cosine
    // ≈ 1.0 (the crawl band, collision ~1.0 under either grid), and
    // both claims are id-based (leak verdict + md5 bucket), never
    // cap-layout-based, so the knob swap cannot move them.
    val deconWide = ext.Similarity.xEmbCorpusPrepDecon(spark, tmp,
        planes = ext.Similarity.tablePlanesWide, kCells = 64).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(!deconWide.contains(trainId),
      "wide-arm decon must drop the leaking train keeper")
    assert(deconWide.toSeq.toDF("vec_id")
        .withColumn("b", ext.TextAnalysis.md5Bucket(100, col("vec_id")))
        .collect().forall(_.getLong(1) >= 10),
      "an eval-holdout id survived the wide-arm decontaminated corpus")
  }

  test("streaming embedding near-dup emits batch candidates incl. planted trio") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Same planted corpus as the batch LSH test: scaled copies of vec 0
    // (cosine exactly 1.0, bytes differ) under two labels. Streamed in
    // one micro-batch, the per-bucket keeper is the bucket minimum —
    // the batch keep-lowest convention — so every verified batch pair's
    // larger side must appear in the streamed drop set, and every
    // streamed pair must be a signature-collision candidate.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (9000001L, v.map(_ * 1.01f).toArray, 5),
      (9000002L, v.map(_ * 1.02f).toArray, 5),
      (9000003L, v.map(_ * 1.03f).toArray, 6))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("lshstream").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val t0 = new java.sql.Timestamp(1700000000000L)
    val all = spark.read.parquet(s"$tmp/embeddings.parquet")
    val vecs = all.select("vec_id", "embedding").collect()
      .map(r => streaming.StreamOps.VecTs(r.getLong(0), t0,
        r.getSeq[Float](1).toArray))
    val input = MemoryStream[streaming.StreamOps.VecTs]
    val query = streaming.StreamOps.dedupNearDupVecs(input.toDS())
      .writeStream.format("memory").queryName("vec_neardup_out")
      .outputMode("append").start()
    input.addData(vecs.toSeq)
    query.processAllAvailable()
    val streamed = spark.sql("SELECT kept_doc_id, dup_doc_id FROM vec_neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()
    // batch candidate pairs from the same packed band hits (static DF
    // through the same codegen'd expressions the stream ran)
    val hits = ext.Similarity.streamBandHits(
      all.withColumn("ts", lit(t0)))
    val cand = hits.as("a").join(hits.as("b"), Seq("bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty, "planted near-dups must collide")
    assert(streamed.subsetOf(cand),
      s"streamed pairs not batch candidates: ${(streamed -- cand).take(5)}")
    // single micro-batch ⇒ keeper = bucket min ⇒ a vector is dropped iff
    // it collides with a lower id — exactly the candidates' larger sides
    assert(streamed.map(_._2) == cand.map(_._2),
      "streaming drop set must equal the batch candidates' larger sides")
    // every VERIFIED batch pair is caught online: its larger side drops
    val verified = ext.Similarity.xDedupEmbCosineLsh(spark, tmp).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(verified.map(_._2).subsetOf(streamed.map(_._2)),
      "a verified near-dup escaped the online index")
    assert(Set(9000001L, 9000002L, 9000003L).subsetOf(streamed.map(_._2)),
      s"planted trio not dropped online: $streamed")
  }

  test("emb corpus prep + SemDeDup stage: a subset of prep, removals real") {
    // The sem variant differs from x_emb_corpus_prep exactly by the
    // within-cell semantic stage: same quantizer (trained on the same
    // cosine-dedup survivors), so every kept (cell, vec_id) must also
    // appear in the base prep's ASSIGNMENT universe, the kept set must
    // shrink or hold vs the base, and at the gated threshold the stage
    // must actually remove vectors (non-vacuous on this corpus).
    val base = ext.Similarity.xEmbCorpusPrep(spark, sf).collect()
    val sem = ext.Similarity.xEmbCorpusPrepSem(spark, sf).collect()
    assert(sem.nonEmpty && sem.length <= base.length)
    // Removals land UPSTREAM of the per-cell cap, so the capped output
    // SIZE typically doesn't shrink (full cells backfill from rank 9+);
    // the real signal is the kept-id set shifting — semantic losers that
    // were ranked <= 8 leave, later ranks slide in (7 swaps at sf0.001,
    // 5 at sf0.01 — measured, and the bitwise oracle pins the exact
    // membership).
    val baseIds = base.map(_.getAs[Long]("vec_id")).toSet
    val semIds = sem.map(_.getAs[Long]("vec_id")).toSet
    assert(semIds != baseIds,
      "semantic stage changed nothing in the kept set — vacuous composition")
    // No cosine loser may reappear through the semantic path.
    val cosLosers = ext.Dedup.xDedupEmbCosine(spark, sf).collect()
      .map(_.getAs[Long]("id2")).toSet
    assert(semIds.intersect(cosLosers).isEmpty,
      "cosine near-dup loser survived the composed sem prep")
    val perCell = sem.groupBy(_.getAs[Long]("cell")).view.mapValues(_.length)
    perCell.foreach { case (c, n) => assert(n <= 8, s"cell $c holds $n > 8") }
  }

  test("vector clustering closes planted near-dup chains to min-id components") {
    import spark.implicits._
    // Stock corpus first: no cosine clears the 0.8 bar, so the cluster
    // operator must emit NOTHING (the oracle pins the empty result —
    // the family's vacuous-gate convention).
    assert(ext.Similarity.xDedupEmbCluster(spark, sf).collect().isEmpty,
      "clusterless corpus must produce no clustered rows")
    // Plant three scaled copies of vec 0 (distinct bytes, cosine exactly
    // 1.0 pairwise and to vec 0): the component {0, p1, p2, p3} must
    // label every member with the minimum id 0 and report size 4 —
    // clustering, not just pairwise keep-lowest.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (9200001L, v.map(_ * 1.01f).toArray, 3),
      (9200002L, v.map(_ * 1.02f).toArray, 4),
      (9200003L, v.map(_ * 1.03f).toArray, 5))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("embclust").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val rows = ext.Similarity.xDedupEmbCluster(spark, tmp).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size")))
    val expected = Set(0L, 9200001L, 9200002L, 9200003L)
    assert(rows.map(_._1).toSet == expected,
      s"clustered membership wrong: ${rows.mkString(",")}")
    rows.foreach { case (id, cid, sz) =>
      assert(cid == 0L, s"vec $id labeled $cid, expected component min 0")
      assert(sz == 4L, s"vec $id cluster_size $sz, expected 4")
    }
    // The corpus artifact on the same fixture: keeper 0 survives, the
    // three cluster losers do not, everything unclustered streams
    // through (size = keepers − losers).
    val corpus = ext.Similarity.xDedupEmbCorpusNearDup(spark, tmp)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(corpus(0L), "cluster keeper 0 must survive the corpus artifact")
    assert(Seq(9200001L, 9200002L, 9200003L).forall(!corpus(_)),
      "cluster loser leaked into the cleaned vector corpus")
    val nKeepers = ext.Dedup.embExactKeepers(spark, tmp).count()
    assert(corpus.size == nKeepers - 3,
      s"corpus size ${corpus.size} != keepers $nKeepers - 3 losers")
    // Keep-central on the same fixture: the scaled chain {1.0, 1.01,
    // 1.02, 1.03}·v has its exact-integer centroid near 1.015·v, so the
    // retained member must be one of the two middle scalings — never
    // the extremes — and exactly one member is kept.
    val central = ext.Similarity.xDedupEmbKeepCentral(spark, tmp).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("kept")))
    assert(central.map(_._1).toSet == expected,
      "keep-central must judge every clustered member")
    val keptIds = central.filter(_._2 == 1L).map(_._1)
    assert(keptIds.length == 1, s"one keeper per cluster, got $keptIds")
    assert(Set(9200001L, 9200002L)(keptIds.head),
      s"centroid-closest must be a middle scaling, got ${keptIds.head}")
    // The two corpus artifacts must DISAGREE on this cluster — min-id
    // retains vec 0, keep-central retains the middle scaling — the
    // planted-disagreement idiom that proves the retention swap is
    // live, not cosmetic (the keep-best-vs-lowest-id precedent).
    val centralCorpus = ext.Similarity.xDedupEmbCorpusCentral(spark, tmp)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!centralCorpus(0L),
      "min-id member survived the keep-central corpus despite losing the rank")
    assert(centralCorpus(keptIds.head),
      "the centroid-closest member must survive its corpus artifact")
    assert(centralCorpus.size == corpus.size,
      "both retention policies keep exactly one member per cluster")
  }

  test("clean vector prep: replicas collapsed, banded losers out, cells capped") {
    import spark.implicits._
    // Plant two bit-identical replicas of vec 0 plus one scaled near-dup
    // (the exact-dedup fixture): the clean prep must never emit a
    // collapsed replica (they fall to the keeper window before any
    // similarity stage) nor a banded-chain loser; cells stay capped and
    // codes bounded (the shared tail's invariants).
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (9100001L, v.toArray, 3),
      (9100002L, v.toArray, 4),
      (9100003L, v.map(_ * 1.01f).toArray, 5))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("cleanprep").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val rows = ext.Similarity.xEmbCorpusPrepClean(spark, tmp).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(!ids(9100001L) && !ids(9100002L),
      "collapsed exact replica leaked into the clean prep")
    val bandedLosers = ext.Similarity.xDedupEmbCosineLshClean(spark, tmp)
      .collect().map(_.getAs[Long]("id2")).toSet
    assert(bandedLosers(9100003L),
      "fixture regression: the scaled near-dup must lose the banded stage")
    assert(ids.intersect(bandedLosers).isEmpty,
      "banded near-dup loser survived the clean prep")
    val perCell = rows.groupBy(_.getAs[Long]("cell")).view.mapValues(_.length)
    perCell.foreach { case (c, n) => assert(n <= 8, s"cell $c holds $n > 8") }
    rows.foreach { r =>
      assert(r.getAs[Long]("min_code") >= -127 && r.getAs[Long]("max_code") <= 127)
    }
  }

  test("wide-banding composed prep (t24p14) matches the clean prep on crawl-band plants") {
    import spark.implicits._
    // The r14 density knob COMPOSED through the production prep: at the
    // crawl-duplicate band (bit-identical replicas + scaled copies —
    // cosine exactly 1.0, identical hyperplane signs under ANY banding)
    // the 24×14 staging must reach the same survivor set, cells, and
    // codes as the default 12×10 clean prep — the knob only swaps the
    // blocking grid, never the verdict or the quantizer/cap/int8 tail.
    // On the stock corpus both stagings are vacuous (no cosine ≥ 0.8
    // pairs), so the outputs must be row-identical there too.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (9400001L, v.toArray, 3),
      (9400002L, v.map(_ * 1.01f).toArray, 5))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("wideprep").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    def rowset(dir: String, f: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame) =
      f(spark, dir).collect().map(r => (r.getAs[Long]("cell"),
        r.getAs[Long]("rank"), r.getAs[Long]("vec_id"))).toSet
    val wide = rowset(tmp, ext.Similarity.xEmbCorpusPrepCleanWide)
    assert(wide.nonEmpty)
    assert(!wide.exists(r => r._3 == 9400001L || r._3 == 9400002L),
      "crawl-band plant survived the wide-banding composed prep")
    assert(wide == rowset(tmp,
        (s, d) => ext.Similarity.xEmbCorpusPrepClean(s, d)),
      "banding widths disagree on the planted corpus")
    assert(rowset(sf, ext.Similarity.xEmbCorpusPrepCleanWide) ==
      rowset(sf, (s, d) => ext.Similarity.xEmbCorpusPrepClean(s, d)),
      "banding widths disagree on the stock corpus")
  }

  test("central-retention prep disagrees with the clean prep on the planted cluster") {
    import spark.implicits._
    // Same fixture as the cluster spec: vec 0 plus three scaled copies.
    // The clean prep's pairwise keep-lowest retains vec 0; the central
    // prep must retain the centroid-closest middle scaling INSTEAD —
    // the retention swap live inside the composition, the
    // x_llm_corpus_prep_keepbest disagreement idiom on vectors.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (9300001L, v.map(_ * 1.01f).toArray, 3),
      (9300002L, v.map(_ * 1.02f).toArray, 4),
      (9300003L, v.map(_ * 1.03f).toArray, 5))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("centralprep").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val clean = ext.Similarity.xEmbCorpusPrepClean(spark, tmp).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val central = ext.Similarity.xEmbCorpusPrepCentral(spark, tmp).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(central.nonEmpty)
    val cluster = Set(0L, 9300001L, 9300002L, 9300003L)
    // keep-lowest survivor of the cluster is vec 0 (whether it clears
    // the diversity cap is its cell's business — the policy claim is
    // about which member ENTERS the cap stage, so compare the
    // cluster-member sets each prep lets through).
    assert((central & cluster).subsetOf(Set(9300001L, 9300002L)),
      s"central prep let a non-central cluster member through: ${central & cluster}")
    assert(!(clean & cluster).exists(id => id != 0L),
      s"clean prep must keep only the minimum id of the cluster: ${clean & cluster}")
    val perCell = ext.Similarity.xEmbCorpusPrepCentral(spark, tmp).collect()
      .groupBy(_.getAs[Long]("cell")).view.mapValues(_.length)
    perCell.foreach { case (c, n) => assert(n <= 8, s"cell $c holds $n > 8") }
  }

  test("full vector pipeline: semantic stage non-vacuous on top of the clean arm") {
    // The full arm differs from the clean arm exactly by the within-cell
    // SemDeDup stage (same survivor set, same quantizer seeds), so the
    // kept-id sets must DIFFER at the gated threshold (the _sem spec's
    // non-vacuity claim, here over the production front-end), and no
    // banded loser may reappear through the semantic path.
    val clean = ext.Similarity.xEmbCorpusPrepClean(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val full = ext.Similarity.xEmbCorpusPrepFull(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(full.nonEmpty)
    assert(full != clean,
      "semantic stage changed nothing over the clean front-end — vacuous")
    val bandedLosers = ext.Similarity.xDedupEmbCosineLshClean(spark, sf)
      .collect().map(_.getAs[Long]("id2")).toSet
    assert(full.intersect(bandedLosers).isEmpty,
      "banded near-dup loser survived the full vector pipeline")
  }

  test("winnow-composed prep drops exactly the substring-dup survivors of the other stages") {
    // First-principles expectation: the winnow stage must remove exactly
    // (surviving corpus ∩ winnow losers) — documents whose contiguous
    // overlap cleared >= 8 shared fingerprints but whose BAG overlap
    // stayed under the Jaccard 0.5 near-dup bar (the class Lee et al.'s
    // substring dedup exists for; at this SF the planted corpus holds at
    // least one such doc, or this test would be pinning a vacuous stage).
    val survivors = ext.CorpusPrep.trainingCorpus(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Policy: only NON-EVAL keepers produce drops (a pair whose lower-id
    // side is the src0 eval set is decontamination's business, not
    // dedup's — otherwise survival would hinge on id order vs the eval
    // doc). sf0.001 plants both shapes: eval-keeper pairs like (0, 50)
    // that must NOT drop, and the training-keeper pair that must.
    val evalDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairRows = ext.TextAnalysis.xTextWinnowPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.exists { case (a, _) => evalDocs(a) },
      "no eval-keeper pair at this SF — the policy branch is untested")
    val losers = pairRows.collect { case (a, b) if !evalDocs(a) => b }.toSet
    val expectedDrop = survivors.intersect(losers)
    assert(expectedDrop.nonEmpty,
      "no winnow loser survives the other stages at this SF — stage vacuous")
    val base = ext.CorpusPrep.xLlmCorpusPrep(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    val composed = ext.CorpusPrep.xLlmCorpusPrepWinnow(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(composed == base - expectedDrop.size,
      s"composed prep dropped ${base - composed}, expected ${expectedDrop.size}")
  }

  test("lm heldout: valid logprobs, train docs fully in-vocabulary") {
    // The smoothed conditional (c2+1)/(c1+V) is always <= 1 (c2 <= c1,
    // V >= 1) so every score is <= 0; and a TRAIN-split doc contributed
    // its own bigrams to the LM, so its n_oov must be exactly 0 — the
    // held-out structure is real, not a re-labeled corpus LM.
    val rows = ext.TextAnalysis.xTextLmHeldout(spark, sf).collect()
    assert(rows.nonEmpty)
    val trainIds = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100L)).as("b"))
      .filter(col("b") < 80).collect().map(_.getLong(0)).toSet
    var heldoutOov = 0L
    rows.foreach { r =>
      val (id, nb, noov) = (r.getLong(0), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_oov"))
      assert(noov <= nb, s"doc $id: oov > bigrams")
      if (nb > 0) assert(r.getAs[Double]("avg_logprob") <= 0.0,
        s"doc $id: smoothed ln p must be <= 0")
      if (trainIds(id)) assert(noov == 0L,
        s"train doc $id reports $noov OOV bigrams — LM not trained on it?")
      else heldoutOov += noov
    }
    assert(heldoutOov > 0, "no held-out doc had any OOV bigram — split vacuous?")
  }

  test("bpe admission: frozen merges cover every admitted doc, monotone") {
    // Train-once/apply-forever for the tokenizer: the output is exactly
    // the upper-id half, merges only ever shrink a sequence, and a doc
    // in BOTH arms must carry identical merged sequences when the full
    // corpus and the train half agree on the merge list (not asserted
    // here — the oracle gate pins the sequences; this pins the shape).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val half = (docs.agg(max(col("doc_id"))).head.getLong(0) + 1) / 2
    val rows = ext.TextAnalysis.xTextBpeAdmit(spark, sf).collect()
    assert(rows.length == docs.filter(col("doc_id") >= half).count(),
      "every admitted doc must be encoded exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"),
        s"merge grew doc ${r.getLong(0)}")
      assert(r.getLong(0) >= half, "trained-half doc leaked into admission output")
    }
  }

  test("streaming vector admission matches the batch admit assignments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the coarse quantizer on the lower-id half (the batch admit
    // convention), stream the upper half through the stateless
    // assignment map, and require cell-for-cell equality with
    // xAnnIvfAdmit — the admission family's runtime shape is streaming
    // ingest, so the codegen'd nearest_centroid must behave identically
    // under readStream.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val split = (e.agg(max(col("vec_id"))).head.getLong(0) + 1) / 2
    val cents = ext.Similarity.trainCoarseCentroids(
      e.filter(col("vec_id") < split), 16, 1)
    val upper = e.filter(col("vec_id") >= split)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.assignVectors(input.toDS(), cents)
      .writeStream.format("memory").queryName("vec_admit_out")
      .outputMode("append").start()
    input.addData(upper.toSeq)
    query.processAllAvailable()
    val streamed = spark.sql("SELECT vec_id, cell FROM vec_admit_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    query.stop()
    val batch = ext.Similarity.xAnnIvfAdmit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cell")).toMap
    assert(streamed == batch,
      s"streaming admission diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming PQ encode matches the batch admission codes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the m codebooks on the lower-id half (the batch admit
    // artifact, via the SAME pqAdmitState the gate consumes), stream
    // the upper half through the stateless encode split across TWO
    // micro-batches, and require code-for-code equality with
    // xAnnPqAdmit — batching cannot matter because the map is
    // stateless, and the shared pqEncode pass makes drift structural
    // rather than possible.
    val (split, cbs) = ext.Similarity.pqAdmitState(spark, sf)
    val upper = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") >= split)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val (b1, b2) = upper.splitAt(upper.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.encodeVectors(input.toDS(), cbs)
      .writeStream.format("memory").queryName("pq_encode_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val cols = "vec_id, " + (0 until 8).map(s => s"c$s").mkString(", ")
    val streamed = spark.sql(s"SELECT $cols FROM pq_encode_out")
      .collect().map(r => (0 to 8).map(r.getLong).toVector).toSet
    query.stop()
    val batch = ext.Similarity.xAnnPqAdmit(spark, sf).collect()
      .map(r => (0 to 8).map(r.getLong).toVector).toSet
    assert(batch.nonEmpty, "batch admission coded nothing")
    assert(streamed == batch,
      s"streaming encode diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming SQ8 encode matches the gated x_emb_quantize summaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The scalar-quantization member of the compression family's
    // streaming column: stateless map through THE ONE sq8Codes
    // expression, split across TWO micro-batches; the streamed code
    // lists rolled up to (n_dims, sum, min, max) must equal the
    // oracle-gated batch summaries row-for-row.
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val (b1, b2) = vecs.splitAt(vecs.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.encodeVectorsSq8(input.toDS())
      .writeStream.format("memory").queryName("sq8_encode_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT vec_id, sq8_codes FROM sq8_encode_out").collect()
      .map(r => r.getLong(0) -> {
        val cs = r.getSeq[Long](1)
        (cs.length.toLong, cs.sum, cs.min, cs.max)
      }).toMap
    query.stop()
    val batch = ext.Similarity.xEmbQuantize(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed == batch,
      s"streamed SQ8 summaries diverge (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming JL reduction matches the batch projection bitwise") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The dimensionality-reduction family's streaming half: the ±1 sign
    // matrix is compile-time frozen, so the stream is a stateless map —
    // split the corpus across TWO micro-batches and require
    // coordinate-for-coordinate (raw double, bitwise) equality with the
    // gated x_emb_rp_reduce relation; the shared rpProjectWide pass
    // makes drift structural rather than possible.
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val (b1, b2) = vecs.splitAt(vecs.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.reduceVectors(input.toDS())
      .writeStream.format("memory").queryName("rp_reduce_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    def rowKey(r: org.apache.spark.sql.Row): Vector[Any] =
      r.getLong(0) +: (1 to 32).map(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i))).toVector
    val cols = "vec_id, " + (0 until 32).map(j => f"rp_$j%02d").mkString(", ")
    val streamed = spark.sql(s"SELECT $cols FROM rp_reduce_out")
      .collect().map(rowKey).toSet
    query.stop()
    val batch = ext.Similarity.xEmbRpReduce(spark, sf).collect()
      .map(rowKey).toSet
    assert(batch.nonEmpty, "batch projection produced nothing")
    assert(streamed == batch,
      s"streaming projection diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming kNN-graph attach matches the batch admission edges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the admission state (split, centroids, admitted inverted
    // list — the SAME pieces the batch gate consumes via knnAdmitState),
    // stream the new half through attachGraph split across TWO
    // micro-batches, and require edge-for-edge equality with
    // xKnnGraphAdmit: rank, neighbor, and rounded cosine all bitwise —
    // micro-batch boundaries cannot matter because each vector's
    // candidates join inside its own batch.
    val (split, cents, admitted) =
      ext.Similarity.knnAdmitState(spark, sf)
    val upper = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") >= split)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val (b1, b2) = upper.splitAt(upper.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps
      .attachGraph(input.toDS(), cents, admitted)
      .writeStream.format("memory").queryName("graph_attach_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT vec_id, nn_rank, nn_id, cos_sim FROM graph_attach_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    query.stop()
    val batch = ext.Similarity.xKnnGraphAdmit(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nn_rank"),
        r.getAs[Long]("nn_id"), r.getAs[Double]("cos_sim"))).toSet
    assert(batch.nonEmpty, "batch admission graph emitted no edges")
    assert(streamed == batch,
      s"streaming attach diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming ANN search serves the batch x_ann_ivf top-k exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The SERVING half: freeze the x_ann_ivf quantizer + inverted list
    // (annServeState — the one construction), stream the gated query
    // vectors split across TWO micro-batches plus a replay, and require
    // row-for-row equality with the batch gate: rank, neighbor, and
    // rounded cosine all bitwise (the rounding happens in the same
    // Spark expressions). Replays re-emit identical rows (stateless) —
    // set-compared, the upsert-sink convention.
    val (cents, invList) = ext.Similarity.annServeState(spark, sf)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_.vec_id)
    val (b1, b2) = qs.splitAt(qs.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.searchVectors(input.toDS(), cents, invList)
      .writeStream.format("memory").queryName("ann_search_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    input.addData(qs.toSeq); query.processAllAvailable() // replay
    query.stop()
    val streamed = spark.table("ann_search_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = SparkEntry.queries("x_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(batch.nonEmpty, "batch IVF search emitted no rows")
    assert(streamed == batch,
      s"streaming search diverged from x_ann_ivf " +
        s"(sizes ${streamed.size}/${batch.size}): " +
        s"extra=${(streamed -- batch).take(3)} missing=${(batch -- streamed).take(3)}")
  }

  test("streaming SQ8 search serves the batch x_ann_ivfsq8 top-k exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The COMPRESSED serving half (r15): freeze the quantizer + the
    // SQ8-coded inverted list (annServeStateSq8 — annServeState plus
    // the one sq8Codes column), stream the gated queries split across
    // two micro-batches plus a replay, and require row-for-row equality
    // with x_ann_ivfsq8: the integer-dot shortlist and the exact
    // re-rank both run in-group, so rank, neighbor, and rounded cosine
    // must all be bitwise the batch gate's.
    val (cents, invList) = ext.Similarity.annServeStateSq8(spark, sf)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_.vec_id)
    val (b1, b2) = qs.splitAt(qs.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.searchVectorsSq8(input.toDS(), cents, invList)
      .writeStream.format("memory").queryName("ann_sq8_search_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    input.addData(qs.toSeq); query.processAllAvailable() // replay
    query.stop()
    val streamed = spark.table("ann_sq8_search_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = SparkEntry.queries("x_ann_ivfsq8")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(batch.nonEmpty, "batch IVF+SQ8 search emitted no rows")
    assert(streamed == batch,
      s"streaming SQ8 search diverged from x_ann_ivfsq8 " +
        s"(sizes ${streamed.size}/${batch.size}): " +
        s"extra=${(streamed -- batch).take(3)} missing=${(batch -- streamed).take(3)}")
  }

  test("artifact-loaded serving index replays both ANN search gates exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The DEPLOYED serving shape (r15): the shelf's `serve` group
    // persists the frozen index (centroids + SQ8-coded inverted list);
    // a serving process loads it back through the stamp guard and must
    // emit row-for-row what the live-state gates emit — for BOTH the
    // uncompressed walk (vs batch x_ann_ivf) and the compressed
    // shortlist + exact re-rank (vs batch x_ann_ivfsq8). One loaded
    // relation serves both because the codes ride the same rows.
    val (liveCents, _) = ext.Similarity.annServeStateSq8(spark, sf)
    val (cents, invList) =
      ext.Similarity.annServeStateFromArtifacts(spark, GraftTest.shelf._1)
    assert(cents.map(_.toSeq).toSeq == liveCents.map(_.toSeq).toSeq,
      "centroids drifted through the artifact round-trip")
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_.vec_id)
    def streamed(name: String,
        run: org.apache.spark.sql.Dataset[streaming.StreamOps.VecIn]
          => org.apache.spark.sql.Dataset[streaming.StreamOps.SearchOut])
        : Set[(Long, Long, Long, Double)] = {
      val input = MemoryStream[streaming.StreamOps.VecIn]
      val query = run(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(qs.toSeq); query.processAllAvailable()
      query.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    def batchRows(key: String): Set[(Long, Long, Long, Double)] =
      SparkEntry.queries(key)(spark, sf).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val ivfArt = streamed("ann_search_art_out",
      in => streaming.StreamOps.searchVectors(in, cents, invList))
    val ivfBatch = batchRows("x_ann_ivf")
    assert(ivfBatch.nonEmpty && ivfArt == ivfBatch,
      s"artifact-served IVF search diverged from x_ann_ivf " +
        s"(sizes ${ivfArt.size}/${ivfBatch.size})")
    val sq8Art = streamed("ann_sq8_search_art_out",
      in => streaming.StreamOps.searchVectorsSq8(in, cents, invList))
    val sq8Batch = batchRows("x_ann_ivfsq8")
    assert(sq8Batch.nonEmpty && sq8Art == sq8Batch,
      s"artifact-served SQ8 search diverged from x_ann_ivfsq8 " +
        s"(sizes ${sq8Art.size}/${sq8Batch.size})")
  }

  test("a knob-built shelf serves both search gates at non-default k through the stamp guard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // r16: the build-scale knobs threaded INTO the frozen shelf (the
    // r15 verdict's weak grade — the parameterized trainers existed,
    // the shelf build didn't take them). Copy the shared shelf, refresh
    // the serve group at kCells = 32 and the contamination group at the
    // wide banding through the sanctioned per-gate refresh path, and
    // require: (a) the knob-built relations load through the stamp
    // guard; (b) streaming search over the k=32 index — BOTH gates —
    // reproduces the batch IVF arms AT k=32 row-for-row (rank,
    // neighbor, rounded cosine bitwise); (c) the wide-banded eval index
    // equals the live wide construction content-for-content. That is
    // the whole serve column at a non-default grid: train → persist →
    // stamp-guarded load → serve.
    import java.nio.file.{Files, Path, Paths}
    val dir = GraftTest.copyShelf("shelf_knob")
    Pipeline.refreshShelfGroup(spark, sf, dir, "serve", kCells = 32)
    Pipeline.refreshShelfGroup(spark, sf, dir, "contamination",
      planes = ext.Similarity.tablePlanesWide)
    val (cents, invList) =
      ext.Similarity.annServeStateFromArtifacts(spark, dir)
    assert(cents.length == 32,
      s"knob-built serve index has ${cents.length} cells, want 32")
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_.vec_id)
    def streamed(name: String,
        run: org.apache.spark.sql.Dataset[streaming.StreamOps.VecIn]
          => org.apache.spark.sql.Dataset[streaming.StreamOps.SearchOut])
        : Set[(Long, Long, Long, Double)] = {
      val input = MemoryStream[streaming.StreamOps.VecIn]
      val query = run(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(qs.toSeq); query.processAllAvailable()
      query.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val ivfK32 = rows(ext.Similarity.annIvf(spark, sf, 0L, k = 32))
    val ivfArt = streamed("ann_search_k32_out",
      in => streaming.StreamOps.searchVectors(in, cents, invList))
    assert(ivfK32.nonEmpty && ivfArt == ivfK32,
      s"k=32 artifact-served IVF search diverged from the k=32 batch arm " +
        s"(sizes ${ivfArt.size}/${ivfK32.size})")
    val sq8K32 = rows(ext.Similarity.annIvfSq8(spark, sf, 0L, kCells = 32))
    val sq8Art = streamed("ann_sq8_search_k32_out",
      in => streaming.StreamOps.searchVectorsSq8(in, cents, invList))
    assert(sq8K32.nonEmpty && sq8Art == sq8K32,
      s"k=32 artifact-served SQ8 search diverged from the k=32 batch arm " +
        s"(sizes ${sq8Art.size}/${sq8K32.size})")
    // The banded trainer at the wide grid: persisted == live, content.
    val artEval = ArtifactShelf
      .table(spark, dir, "art_contamination_eval_index")
      .collect().map(_.toSeq.toVector).toSet
    val liveEval = ext.Similarity.contaminationEvalIndex(spark, sf,
      ext.Similarity.tablePlanesWide)
      .collect().map(_.toSeq.toVector).toSet
    assert(artEval == liveEval && artEval.nonEmpty,
      "knob-built contamination eval index diverges from the live wide " +
        s"construction (sizes ${artEval.size}/${liveEval.size})")
  }

  test("serve delta on a knob-built shelf rides the SHELF's centroids, not the gated default") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // r17 (composing the two r16 specs that stopped one step apart):
    // the serve-delta parity spec ran at the default grid, the
    // knob-shelf spec stopped at search parity — so nothing pinned
    // that serveDeltaRows' cell assignment follows the shelf being
    // appended to. Refresh the serve group at kCells = 32, ingest
    // arrivals through the gate WITH THE SHELF'S centroids (the
    // serveDeltaStream wiring), append, and require the loaded state
    // row-for-row equal to the frozen-K32-centroid index over
    // (corpus ∪ admitted) — a delta celled at the default k=16 would
    // land rows in cells the k=32 walk never probes and fail the
    // structural compare.
    import java.nio.file.{Files, Path, Paths}
    val dir = GraftTest.copyShelf("shelf_knob_delta")
    Pipeline.refreshShelfGroup(spark, sf, dir, "serve", kCells = 32)
    val (cents, _) = ext.Similarity.annServeStateFromArtifacts(spark, dir)
    assert(cents.length == 32, "fixture: serve group must be k=32")
    val stock = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray)).sortBy(_.vec_id)
    val maxId = stock.last.vec_id
    val arrivals = stock.take(10).zipWithIndex.map { case (v, i) =>
      streaming.StreamOps.VecIn(maxId + 1L + i,
        v.embedding.map(x => x * 0.55f + 0.025f * ((i % 5) + 1)))
    }
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val q = streaming.StreamOps.ingestVectors(input.toDS(), cents,
        ArtifactShelf.pqCodebooks(spark, dir),
        ArtifactShelf.table(spark, dir, "art_contamination_eval_index")
          .localCheckpoint())
      .writeStream.format("memory").queryName("knob_delta_ingest")
      .outputMode("append").start()
    input.addData(arrivals.toSeq); q.processAllAvailable(); q.stop()
    val verdicts = spark.table("knob_delta_ingest").localCheckpoint()
    val admittedIds = verdicts.filter(col("admitted") === 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admittedIds.nonEmpty, "vacuous fixture: nothing admitted")
    Pipeline.appendServeDelta(spark, dir,
      ext.Similarity.serveDeltaRows(verdicts, arrivals.toSeq.toDF()))
    val vf = graft.functions.VectorFunctions
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toVector,
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        r.getSeq[Long](4).toVector)
    }.toSet
    val live = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .unionByName(arrivals.toSeq.toDF()
        .filter(col("vec_id").isin(admittedIds.toSeq: _*)))
      .select(
        vf.nearestCentroid(col("embedding"), cents).as("cell"),
        col("vec_id").as("id2"), col("embedding").as("v2"),
        sqrt(vf.dotProduct(col("embedding"), col("embedding"))).as("n2"),
        ext.Similarity.sq8Codes("embedding").as("cc"))
    val loaded = key(ext.Similarity.annServeStateFromArtifacts(spark, dir)
      ._2.select("cell", "id2", "v2", "n2", "cc"))
    val expected = key(live)
    assert(loaded == expected,
      s"k=32 delta state diverges from the frozen-K32-centroid union: " +
        s"loaded-only=${(loaded -- expected).take(2).map(_._2)} " +
        s"live-only=${(expected -- loaded).take(2).map(_._2)}")
    // The delta rows genuinely exercise the wider grid (some cell >= 16
    // across the union's arrivals) — otherwise the test is vacuous at
    // k=32 vs k=16.
    assert(key(ext.Similarity.annServeStateFromArtifacts(spark, dir)._2
      .filter(col("id2") > maxId).select("cell", "id2", "v2", "n2", "cc"))
      .nonEmpty, "no delta rows present")
    val deltaCells = spark.read.parquet(s"$dir/art_serve_delta")
      .select("cell").collect().map(_.getInt(0)).toSet
    val liveCells = live.filter(col("id2") > maxId)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(deltaCells == liveCells,
      s"delta cells $deltaCells diverge from the k=32 assignment $liveCells")
  }

  test("streaming contamination screen matches the batch gate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Plant cross-split near-dups (the decontamination layout: one eval
    // + two train members on vector 0's direction), freeze the eval
    // index batch-side, stream EVERY keeper through the screen split
    // across two micro-batches, and require flag-for-flag equality with
    // x_emb_contamination: pair AND rounded cosine bitwise.
    val buckets = (9000001L to 9000200L).toDF("vec_id")
      .withColumn("b", ext.TextAnalysis.md5Bucket(100, col("vec_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalId = buckets.toSeq.sortBy(_._1).find(_._2 < 10).get._1
    val trainIds = buckets.toSeq.sortBy(_._1).filter(_._2 >= 10).take(2).map(_._1)
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq(
      (evalId, v.map(_ * 1.01f).toArray, 5),
      (trainIds(0), v.map(_ * 1.02f).toArray, 5),
      (trainIds(1), v.map(_ * 1.03f).toArray, 6))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("screenstream").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val evalIndex = ext.Similarity.contaminationEvalIndex(spark, tmp)
    val keepers = ext.Dedup.embExactKeepers(spark, tmp)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
    val (b1, b2) = keepers.splitAt(keepers.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.screenVectors(input.toDS(), evalIndex)
      .writeStream.format("memory").queryName("screen_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql("SELECT vec_id, eval_id, cosine FROM screen_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val nFlags = spark.sql("SELECT count(*) FROM screen_out").head.getLong(0)
    // IDEMPOTENCE under re-ingestion (an at-least-once upstream replays
    // a batch): the flagged pairs' group state blocks a second emission
    // — zero new rows, not duplicate ScreenOut flags.
    input.addData(b1.toSeq); query.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM screen_out").head.getLong(0)
      == nFlags, "replayed batch double-flagged a contaminated pair")
    query.stop()
    val batch = ext.Similarity.xEmbContamination(spark, tmp).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"),
        r.getAs[Double]("cosine"))).toSet
    assert(batch.nonEmpty, "batch gate flagged nothing on the planted corpus")
    assert(batch.exists(t => t._1 == trainIds(0) && t._2 == evalId),
      "planted cross pair missing from the batch gate")
    assert(streamed == batch,
      s"streaming screen diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("streaming sampling gate reproduces the batch temperature rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the per-language rates batch-side (the SAME sampleRates
    // expressions xCorpusSample runs — identical doubles), stream every
    // document through the stateless gate split across two
    // micro-batches, and require the per-language kept counts to equal
    // the batch rollup exactly.
    val docs = Tables.documents(spark, sf)
    val rates = ext.TextAnalysis.sampleRates(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val all = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => streaming.StreamOps.LangDoc(r.getLong(0), r.getString(1)))
    val (b1, b2) = all.splitAt(all.length / 2)
    val input = MemoryStream[streaming.StreamOps.LangDoc]
    val query = streaming.StreamOps.sampleDocs(input.toDS(), rates)
      .writeStream.format("memory").queryName("sample_gate_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT lang, count(*) AS n_docs, sum(kept) AS n_kept " +
        "FROM sample_gate_out GROUP BY lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    query.stop()
    val batch = ext.TextAnalysis.xCorpusSample(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(batch.values.exists { case (n, k) => k < n },
      "vacuous fixture: no language is down-sampled")
    assert(streamed == batch,
      s"streaming gate diverged from the batch rollup ($streamed vs $batch)")
  }

  test("streaming boilerplate screen matches the batch gate and is replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the hub fingerprint index batch-side (the SAME
    // boilerplateHubIndex the gated query consumes), stream every
    // NON-hub document split across two micro-batches, and require
    // flag-for-flag equality with x_text_boilerplate_screen — then
    // replay a batch and require zero new flags (the flagged-pair
    // group state).
    val hubFps = ext.TextAnalysis.boilerplateHubIndex(spark, sf)
      .localCheckpoint()
    val hubIds = hubFps.select("hub_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .filter(r => !hubIds(r.getLong(0)))
      .map(r => streaming.StreamOps.DocIn(r.getLong(0),
        new java.sql.Timestamp(0L), r.getString(1)))
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[streaming.StreamOps.DocIn]
    val query = streaming.StreamOps
      .screenDocsBoilerplate(input.toDS(), hubFps)
      .writeStream.format("memory").queryName("bp_screen_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT doc_id, hub_id, n_shared FROM bp_screen_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = ext.TextAnalysis.xTextBoilerplateScreen(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hub_id"),
        r.getAs[Long]("n_shared"))).toSet
    assert(batch.nonEmpty, "vacuous fixture: batch gate flagged nothing")
    assert(streamed == batch,
      s"streaming screen diverged from batch (sizes ${streamed.size}/${batch.size})")
    val nFlags = spark.sql("SELECT count(*) FROM bp_screen_out").head.getLong(0)
    input.addData(b1.toSeq); query.processAllAvailable()
    assert(spark.sql("SELECT count(*) FROM bp_screen_out").head.getLong(0)
      == nFlags, "replayed batch double-flagged a boilerplate pair")
    query.stop()
  }

  test("winnow admission: streaming surface matches the batch gate; df bound live") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Parity half: the admitted fingerprint state (winnowAdmitState —
    // the SAME frozen relation the batch gate derives) streamed against
    // the new half through screenDocsBoilerplate (the admitted state IS
    // a hub index with every admitted doc a hub) must reproduce every
    // xTextWinnowAdmit row, split across micro-batches.
    val (half, state) = ext.TextAnalysis.winnowAdmitState(spark, sf)
    val idx = state.localCheckpoint()
    val newDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") >= half)
      .select(col("doc_id"), col("text")).collect()
      .map(r => streaming.StreamOps.DocIn(r.getLong(0),
        new java.sql.Timestamp(0L), r.getString(1)))
    val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
    val input = MemoryStream[streaming.StreamOps.DocIn]
    val query = streaming.StreamOps
      .screenDocsBoilerplate(input.toDS(), idx)
      .writeStream.format("memory").queryName("winnow_admit_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT doc_id, hub_id, n_shared FROM winnow_admit_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()
    val batch = ext.TextAnalysis.xTextWinnowAdmit(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_adm"),
        r.getAs[Long]("n_shared"))).toSet
    assert(batch.nonEmpty, "vacuous fixture: admission flagged nothing")
    assert(streamed == batch,
      s"streaming admission diverged from batch (${streamed.size}/${batch.size})")

    // Planted df-bound half: template A saturates the admitted df
    // (60 > 50 — its prints leave the frozen state, so a new A-doc is
    // NOT flagged), template B has admitted df 1 (the batch pair
    // join's lower bound would DROP it; admission must flag it — the
    // arriving doc is the second occurrence).
    val tplA = "privacy policy describing collection usage retention " +
      "disclosure of personal information cookies analytics providers " +
      "third parties safeguards retention periods access correction rights"
    val tplB = "shipping returns policy items must be unopened within " +
      "thirty days original packaging refund issued to original payment " +
      "method exclusions apply for perishable customized clearance items"
    val rows =
      (0L until 60L).map(i => (i, s"page $i " + tplA)) ++
      (60L until 70L).map(i =>
        (i, (0 until 30).map(j => s"w${i}x$j").mkString(" "))) ++
      Seq((70L, "store footer " + tplB),
        (150L, "another footer " + tplB),
        (151L, "yet another page " + tplA))
    val tmp = java.nio.file.Files.createTempDirectory("winadmit").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    // half = (151+1)/2 = 76: admitted = the A flood, fillers, and the
    // single B original; new = the B near-dup (150) and an A page (151)
    val flags = ext.TextAnalysis.xTextWinnowAdmit(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_adm"))).toSet
    assert(flags.contains((150L, 70L)),
      s"admitted-df-1 template B pair missed (the batch lower bound " +
        s"must NOT apply to admission): $flags")
    assert(!flags.exists(_._1 == 151L),
      s"saturated-df template A flagged a new doc despite the bound: $flags")
  }

  test("frozen boilerplate screen catches a template flood the df-cutoff pair join goes blind to") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The screen's reason to exist: the pair join's df∈[2,50] cutoff —
    // the guard that keeps the self-join bounded — goes BLIND the
    // moment a template's document frequency crosses 50, which is
    // precisely when boilerplate matters most. A hub index FROZEN from
    // a clean snapshot keeps rejecting at ingest regardless of the
    // flood's df. Snapshot: 20 fully-unique fillers + a 10-doc
    // template clique (each 'unique header i' + the same 250-char
    // template; in-degree 9 each, so all ten rank above the base ties
    // and are flagged hubs).
    // Non-repetitive on purpose: a periodic template winnows to a
    // handful of distinct prints (the window minima repeat with the
    // period) and pairs never reach the 8-shared threshold.
    val template =
      "terms of service agreement covering liability indemnification " +
      "warranty disclaimers governing law jurisdiction arbitration notices " +
      "amendments severability waiver assignment entire agreement counterparts " +
      "electronic signatures effective date all rights reserved worldwide"
    val fillers = (0L until 20L).map(i =>
      (i, (0 until 30).map(j => s"u${i}x$j").mkString(" ")))
    val clique = (100L until 110L).map(i => (i, s"unique header $i " + template))
    val tmpA = java.nio.file.Files.createTempDirectory("bpsnap").toString
    (fillers ++ clique).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmpA/documents.parquet")
    val hubFps = ext.TextAnalysis.boilerplateHubIndex(spark, tmpA)
      .localCheckpoint()
    val hubIds = hubFps.select("hub_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val cliqueIds = clique.map(_._1).toSet
    assert(cliqueIds.subsetOf(hubIds),
      s"template docs not flagged as hubs: ${cliqueIds -- hubIds}")
    // The flood: 60 new pages carrying the template. On the FLOODED
    // corpus the template prints' df is 70 > 50 — the pair join (and
    // therefore the centrality chain built on it) sees nothing
    // touching the flood.
    val flood = (1000L until 1060L).map(i => (i, s"new page $i " + template))
    val tmpB = java.nio.file.Files.createTempDirectory("bpflood").toString
    (fillers ++ clique ++ flood).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmpB/documents.parquet")
    val pairMembers = ext.TextAnalysis.xTextWinnowPairs(spark, tmpB).collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val floodIds = flood.map(_._1).toSet
    assert((pairMembers & floodIds).isEmpty,
      "fixture broke: the df cutoff unexpectedly passed the template flood")
    // The frozen screen still rejects every flood doc at ingest.
    val input = MemoryStream[streaming.StreamOps.DocIn]
    val query = streaming.StreamOps
      .screenDocsBoilerplate(input.toDS(), hubFps)
      .writeStream.format("memory").queryName("bp_flood_out")
      .outputMode("append").start()
    input.addData(flood.map { case (id, t) =>
      streaming.StreamOps.DocIn(id, new java.sql.Timestamp(0L), t) })
    query.processAllAvailable()
    val flagged = spark.sql("SELECT DISTINCT doc_id FROM bp_flood_out")
      .collect().map(_.getLong(0)).toSet
    query.stop()
    assert(floodIds.subsetOf(flagged),
      s"flood docs escaped the frozen screen: ${floodIds -- flagged}")
  }

  test("streaming mix gate reproduces the batch token-budget rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Freeze the per-language (bucket, doc_id) fill cuts batch-side
    // (mixCuts over the SAME token relation the gated rollup reads),
    // stream every document through the stateless gate split across
    // two micro-batches, and require the per-language kept counts to
    // equal the batch quota rollup exactly — the cumsum-≤-quota fill
    // and the threshold membership are the same set by monotonicity.
    val cuts = ext.TextAnalysis.mixCuts(ext.TextAnalysis.wsMixToks(spark, sf))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val all = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect()
      .map(r => streaming.StreamOps.LangDoc(r.getLong(0), r.getString(1)))
    val (b1, b2) = all.splitAt(all.length / 2)
    val input = MemoryStream[streaming.StreamOps.LangDoc]
    val query = streaming.StreamOps.mixDocs(input.toDS(), cuts)
      .writeStream.format("memory").queryName("mix_gate_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT lang, count(*) AS n_docs, sum(kept) AS n_kept " +
        "FROM mix_gate_out GROUP BY lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    query.stop()
    val batch = ext.TextAnalysis.xCorpusMix(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(batch.values.exists { case (n, k) => k < n },
      "vacuous fixture: no language is budget-squeezed")
    assert(streamed == batch,
      s"streaming mix gate diverged from the batch rollup ($streamed vs $batch)")
    // The gate is budget-UNIT-agnostic: fed BPE-unit cuts (the frozen
    // admission tokenizer's counts), the same stateless map reproduces
    // the BPE-budget rollup instead.
    val bpeCuts = ext.TextAnalysis
      .mixCuts(ext.TextAnalysis.bpeMixToks(spark, sf))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val input2 = MemoryStream[streaming.StreamOps.LangDoc]
    val query2 = streaming.StreamOps.mixDocs(input2.toDS(), bpeCuts)
      .writeStream.format("memory").queryName("mix_gate_bpe_out")
      .outputMode("append").start()
    input2.addData(b1.toSeq); query2.processAllAvailable()
    input2.addData(b2.toSeq); query2.processAllAvailable()
    val streamedBpe = spark.sql(
      "SELECT lang, count(*) AS n_docs, sum(kept) AS n_kept " +
        "FROM mix_gate_bpe_out GROUP BY lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    query2.stop()
    val batchBpe = ext.TextAnalysis.xCorpusMixBpe(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(streamedBpe == batchBpe,
      s"BPE-unit mix gate diverged ($streamedBpe vs $batchBpe)")
  }

  test("online exact vector dedup replay reproduces the batch collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Plant two bit-identical replicas of vec 0 at high ids (the
    // exact-dedup fixture — the stock corpus has no exact dups), stream
    // the corpus in id order split across two batches, and require
    // verdict-for-verdict equality with xDedupEmbExact: same keepers,
    // same is_dup flags, replicas collapsed to the min id seen first.
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val v = base.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val planted = Seq((9400001L, v.toArray, 3), (9400002L, v.toArray, 4))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("exactonline").toString
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val all = spark.read.parquet(s"$tmp/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id)
    val (b1, b2) = all.splitAt(all.length / 2)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps.dedupVectorsExactOnline(input.toDS())
      .writeStream.format("memory").queryName("exact_online_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql(
      "SELECT vec_id, keeper_id, is_dup FROM exact_online_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()
    val batch = ext.Dedup.xDedupEmbExact(spark, tmp).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("keeper_id"),
        r.getAs[Long]("is_dup"))).toSet
    assert(batch.exists(_._3 == 1L), "vacuous fixture: no replica collapsed")
    assert(streamed == batch,
      s"online collapse diverged from batch (sizes ${streamed.size}/${batch.size})")
    // The state-store key is the fixed-width 128-bit content hash, not
    // the embedding: replicas share it, distinct vectors don't, and
    // ±0.0 normalizes exactly like the batch window's partition key.
    val k0 = streaming.StreamOps.embContentKey(v.toArray)
    assert(streaming.StreamOps.embContentKey(v.toArray) == k0)
    assert(streaming.StreamOps.embContentKey(v.map(_ * 1.01f).toArray) != k0)
    assert(streaming.StreamOps.embContentKey(Array(0.0f, 1f)) ==
      streaming.StreamOps.embContentKey(Array(-0.0f, 1f)),
      "-0.0 must key with +0.0 (NormalizeFloatingNumbers parity)")
  }

  test("online SemDeDup replay reproduces every batch verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The evolving-state claim: replaying the WHOLE corpus through the
    // online operator — batches split mid-corpus, in nondecreasing id
    // order per the replay contract — must reproduce the batch
    // xDedupSemantic verdict for EVERY vector (not just an admitted
    // half): same cells, same keep/drop, bitwise. Centroids are the
    // batch gate's own (full-corpus Lloyd), the artifact a production
    // ingest would freeze.
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = ext.Similarity.trainCoarseCentroids(e, 16, 1)
    val all = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => streaming.StreamOps.VecIn(r.getLong(0),
        r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id)
    val (b1, b2) = all.splitAt(all.length / 3)
    val input = MemoryStream[streaming.StreamOps.VecIn]
    val query = streaming.StreamOps
      .dedupSemanticOnline(input.toDS(), cents)
      .writeStream.format("memory").queryName("sem_online_out")
      .outputMode("append").start()
    input.addData(b1.toSeq); query.processAllAvailable()
    input.addData(b2.toSeq); query.processAllAvailable()
    val streamed = spark.sql("SELECT vec_id, cell, kept FROM sem_online_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    query.stop()
    val batch = ext.Similarity.xDedupSemantic(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("kept"))).toSet
    assert(batch.exists(_._3 == 0L), "vacuous fixture: batch dropped nothing")
    assert(streamed == batch,
      s"online replay diverged from batch (sizes ${streamed.size}/${batch.size})")
  }

  test("ivfadc admission: every new vector coded against frozen state") {
    val rows = ext.Similarity.xAnnIvfAdcAdmit(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val split = (emb.agg(max(col("vec_id"))).head.getLong(0) + 1) / 2
    assert(rows.length == emb.filter(col("vec_id") >= split).count(),
      "every admitted vector gets a cell + codes")
    rows.foreach { r =>
      assert(r.getLong(0) >= split, "trained-half vector leaked into admission")
      val cell = r.getAs[Long]("cell")
      assert(cell >= 0 && cell < 16, s"coarse cell $cell out of range")
      (0 until 8).foreach { s =>
        val c = r.getAs[Long](s"c$s")
        assert(c >= 0 && c < 16, s"residual code c$s=$c out of range")
      }
    }
  }

  test("pq admission: every new vector coded, codes in range, half split") {
    val rows = ext.Similarity.xAnnPqAdmit(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val split = (spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(max(col("vec_id"))).head.getLong(0) + 1) / 2
    assert(rows.length == n - split, "every not-yet-admitted vector gets codes")
    assert(rows.forall(_.getLong(0) >= split), "admitted half never re-coded")
    for (s <- 0 until 8)
      assert(rows.forall { r =>
        val c = r.getLong(s + 1); c >= 0 && c < 16
      }, s"subspace $s code out of range")
  }

  test("c4 rule gate: mask bits imply keep, thresholds exercise both outcomes") {
    val df = ext.TextAnalysis.xTextC4Rules(spark, sf).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    // keep is exactly (fail_mask == 0), and every metric feeding a mask
    // bit is consistent with the bit actually set.
    rows.foreach { r =>
      val mask = r.getAs[Long]("fail_mask")
      assert(r.getAs[Long]("keep") == (if (mask == 0) 1L else 0L))
      assert(((mask & 1) != 0) == !(r.getAs[Long]("n_tokens") >= 25 &&
        r.getAs[Long]("n_tokens") <= 100000))
      assert(((mask & 8) != 0) == (r.getAs[Long]("top_tok_bp") > 1500))
    }
    // the gate must not be degenerate on the test corpus
    assert(rows.exists(_.getAs[Long]("keep") == 1L))
    assert(rows.exists(_.getAs[Long]("keep") == 0L))
    df.unpersist()
  }

  test("BPE-budget mix picks different docs than the whitespace budget") {
    import spark.implicits._
    // Two languages engineered so the budget UNIT decides the mixture:
    // 'aa' docs are 10 globally-unique tokens each (BPE-incompressible);
    // 'bb' docs are 12 repetitions of one token, which the 3 frozen
    // merges learned on the lower-id half collapse to 2 tokens. Under
    // WHITESPACE counts aa (40) defines the quota and bb (48) is
    // squeezed; under BPE counts bb collapses to 8, flips into the
    // quota-defining language, keeps everything, and aa no longer fits
    // a single doc — the two gates pick different documents from the
    // same corpus, which is why production budgets must be denominated
    // in tokenizer tokens.
    val docs = (0L until 8L).map { id =>
      if (id % 2 == 1) (id, "bb", Seq.fill(12)("p").mkString(" "))
      else (id, "aa", (0 until 10).map(t => s"u${id}x$t").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val tmp = java.nio.file.Files.createTempDirectory("mixbpe").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ws = ext.TextAnalysis.xCorpusMix(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val bpe = ext.TextAnalysis.xCorpusMixBpe(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ws("aa").getAs[Long]("quota") == 40L &&
      ws("aa").getAs[Long]("n_kept") == 4L,
      "whitespace budget: aa defines the quota and keeps everything")
    assert(ws("bb").getAs[Long]("n_kept") < 4L,
      "whitespace budget must squeeze the repetitive language")
    assert(bpe("bb").getAs[Long]("lang_tokens") == 8L,
      s"frozen merges must collapse bb to 2 tokens/doc, got ${bpe("bb")}")
    assert(bpe("bb").getAs[Long]("n_kept") == 4L,
      "BPE budget: bb defines the quota and keeps everything")
    assert(bpe("aa").getAs[Long]("n_kept") < ws("aa").getAs[Long]("n_kept"),
      "the budget unit must change which documents fit")
  }

  test("corpus mix: equal token quota, smallest language keeps everything") {
    val rows = ext.TextAnalysis.xCorpusMix(spark, sf).collect()
    assert(rows.length >= 2)
    val quota = rows.head.getAs[Long]("quota")
    rows.foreach { r =>
      assert(r.getAs[Long]("quota") == quota, "quota is a single global scalar")
      assert(r.getAs[Long]("tokens_kept") <= quota,
        s"${r.getAs[String]("lang")} overfilled its token budget")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // the language defining the quota keeps its whole corpus
    assert(rows.exists(r => r.getAs[Long]("lang_tokens") == quota &&
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs")))
  }

  test("keep-best admission: a higher-quality arrival cannot displace the frozen keeper") {
    import spark.implicits._
    // Admitted half: a planted near-dup pair over an 80-token shared
    // body — the lower id padded with stopwords (lower quality), the
    // higher id with distinct words (the frozen quality argmax). New
    // half: one doc sharing the body with quality ABOVE the keeper's
    // (the displacement attempt — must attach kept=0 under the frozen
    // keeper) and one unrelated doc (must pass kept=1).
    val body = (0 until 80).map(i => s"k${i}tok").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("kbadmit").toString
    val base = spark.read.parquet(s"$sf/documents.parquet")
    base.unionByName(Seq(
        (1000001L, body + " the of and a to the of and a to the of and a to",
          "en", "srcx", 1L),
        (1000002L, body + " " + (0 until 15).map(i => s"m${i}x").mkString(" "),
          "en", "srcx", 1L),
        (9000010L, body + " " + (0 until 20).map(i => s"n${i}x").mkString(" "),
          "en", "srcx", 1L),
        (9000011L, (0 until 40).map(i => s"z${i}solo").mkString(" "),
          "en", "srcx", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // half = (9000011 + 1) div 2 = 4500006: base + the pair admitted,
    // the two 9Ms new.
    val out = ext.Dedup.xDedupKeepBestAdmit(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val attach = out(9000010L)
    assert(attach.getAs[Long]("kept") == 0L,
      s"arrival must not displace the frozen keeper: $attach")
    assert(attach.getAs[Long]("cluster_id") == 1000001L,
      s"must attach to the admitted cluster's min-id label: $attach")
    assert(attach.getAs[Long]("keeper_id") == 1000002L,
      s"frozen keeper must be the admitted quality argmax: $attach")
    assert(attach.getAs[Double]("quality_score") >
      attach.getAs[Double]("keeper_quality"),
      "fixture broke: the arrival was meant to out-score the keeper")
    val solo = out(9000011L)
    assert(solo.getAs[Long]("kept") == 1L && solo.isNullAt(
      solo.fieldIndex("keeper_id")),
      s"unrelated arrival must pass with no keeper: $solo")
    assert(solo.getAs[Long]("cluster_id") == 9000011L)
  }

  test("screen-composed prep removes the template class where FULL dedups it to one copy") {
    import spark.implicits._
    // Self-contained corpus: 30 unique fillers + a 12-carrier template
    // clique (unique 70-token body + a shared ~250-char template). The
    // FULL arm's winnow-substring stage flags every carrier pair and
    // keeps exactly the lowest-id carrier — DEDUP semantics (one copy
    // of everything, even boilerplate). The screen arm's position is
    // REMOVAL: the carriers' mutual near-dup votes make them the
    // centrality hubs, and hubs are the template itself — zero copies
    // survive. The fillers pin the real-hub guard: the selectN=25 cut
    // pads with base-score ties, and a padding "hub" must NOT be
    // dropped (screened == full minus the one carrier, nothing else).
    val template =
      "terms service agreement covering liability indemnification " +
      "warranty disclaimers governing law jurisdiction arbitration notices " +
      "amendments severability waiver assignment entire agreement counterparts " +
      "electronic signatures effective date all rights reserved worldwide"
    val fillers = (0L until 30L).map(i =>
      (i, (0 until 50).map(j => s"f${i}u$j").mkString(" ") + " the and of",
        "en", "srcx", 10L))
    val carriers = (100L until 112L).map(i =>
      (i, (0 until 70).map(j => s"c${i}u$j").mkString(" ") +
        " the and of " + template, "en", "srcx", 10L))
    val tmp = java.nio.file.Files.createTempDirectory("prepscreen").toString
    (fillers ++ carriers).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val carrierIds = carriers.map(_._1).toSet
    val full = ext.CorpusPrep.fullCorpus(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val screened = ext.CorpusPrep.screenedCorpus(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((full & carrierIds) == Set(100L),
      s"FULL must dedup the clique to its lowest id: ${full & carrierIds}")
    assert((screened & carrierIds).isEmpty,
      s"the screen must remove the template class: ${screened & carrierIds}")
    assert(screened == full - 100L,
      "the screen must drop ONLY the template (padding hubs are not drops): " +
        s"extra=${(full - 100L) -- screened} unexpected=${screened -- full}")
  }

  test("one-topology session+attribution matches both batch operators on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Full-µs timestamps (the attribution parity convention), split
    // into two micro-batches at the time median — batch 2's minimum ts
    // is >= batch 1's maximum, so the watermark drops nothing and the
    // split only exercises cross-batch state handoff.
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .collect()
      .map { r =>
        val us = r.getLong(1)
        val t = new java.sql.Timestamp(us / 1000L)
        t.setNanos(((us % 1000000L) * 1000L).toInt)
        streaming.StreamOps.Event(r.getLong(0), t,
          r.getLong(2), r.getString(3), r.getDouble(4))
      }.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = raw.splitAt(raw.length / 2)
    val input = MemoryStream[streaming.StreamOps.Event]
    val query = streaming.StreamOps.sessionAttribute(input.toDS())
      .writeStream.format("memory").queryName("sessattr_out")
      .outputMode("append").start()
    input.addData(b1.toSeq)
    query.processAllAvailable()
    input.addData(b2.toSeq)
    query.processAllAvailable()
    val streamedAttr = spark.sql(
      """SELECT channel, count(*) AS n, sum(value_e4) AS rev
        |FROM sessattr_out WHERE kind = 'attr' GROUP BY channel""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sessions = spark.sql(
      "SELECT count(*) FROM sessattr_out WHERE kind = 'session'")
      .head.getLong(0)
    query.stop()
    val batchAttr = ext.EventAnalytics.xAttribution(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_e4"))).toMap
    assert(streamedAttr == batchAttr,
      s"composed attribution diverged:\n  stream=$streamedAttr\n  batch=$batchAttr")
    val b = ext.Sessionize.xSessionize(spark, sf)
      .agg(sum("n_sessions").as("total"), count(lit(1)).as("users")).head
    assert(sessions >= b.getLong(0) - b.getLong(1) && sessions <= b.getLong(0),
      s"sessions=$sessions not in [${b.getLong(0) - b.getLong(1)}, ${b.getLong(0)}]")
  }

  test("session+attribution: a too-late purchase's attr row carries its own session start") {
    // The r11 ADVICE catch: a purchase beyond the open session's
    // backward reach is emitted as its own single-event session, so its
    // attr row must carry session_start_us = the purchase's own t — not
    // the strictly-later open session's start, which would claim session
    // context the purchase doesn't belong to. Parity specs can't see
    // this (neither batch operator emits session_start_us), so pin the
    // state function directly.
    val t0Us = 1700000000000000L
    val lateUs = t0Us - 31L * 60 * 1000000L // 31 min before the open start
    val openState = streaming.StreamOps.SessAttrState(
      start = t0Us, last = t0Us, n = 1,
      touchType = "click", touchTs = t0Us, touchEvent = 1L,
      hasSess = true, hasTouch = true)
    val state = org.apache.spark.sql.streaming.TestGroupState.create[
        streaming.StreamOps.SessAttrState](
      org.apache.spark.api.java.Optional.of(openState),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      1L, org.apache.spark.api.java.Optional.of(lateUs / 1000L - 1000L), false)
    val lateTs = new java.sql.Timestamp(lateUs / 1000L)
    lateTs.setNanos(((lateUs % 1000000L) * 1000L).toInt)
    val out = streaming.StreamOps.updateSessAttr(7L,
      Iterator(streaming.StreamOps.Event(9L, lateTs, 7L, "purchase", 2.5)),
      state).toVector
    val attr = out.filter(_.kind == "attr")
    assert(attr.size == 1, s"expected one attr row, got $out")
    assert(attr.head.session_start_us == lateUs,
      s"too-late purchase must carry its OWN one-event session start " +
        s"($lateUs), not the open session's: ${attr.head}")
    // The touch at t0 is LATER than the purchase — never credited.
    assert(attr.head.channel == "direct", s"causality guard broke: ${attr.head}")
    val sess = out.filter(_.kind == "session")
    assert(sess.size == 1 && sess.head.session_start_us == lateUs &&
      sess.head.n_events == 1,
      s"too-late purchase must close as its own single-event session: $out")
    // The open session survives untouched.
    assert(state.get.hasSess && state.get.start == t0Us, s"state=${state.get}")
  }
}
