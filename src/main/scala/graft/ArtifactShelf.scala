package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed READERS for the frozen-artifact shelf
  * `Pipeline.materializeFrozenArtifacts` writes — the consuming half of
  * the "production ships the artifact" contract. A deployment builds
  * the shelf once per corpus version and its ingest gates load state
  * from parquet with these readers instead of re-running trainers; the
  * loaded values are the builders' values BITWISE (doubles round-trip
  * parquet exactly — IEEE 754 binary64 columns, no decimal re-encode),
  * so every gate parity spec that holds for trainer-built state holds
  * verbatim for shelf-loaded state. Spec-pinned in ExtensionsSpec
  * ("shelf loaders reconstruct every frozen state bitwise").
  *
  * DataFrame-shaped artifacts (admission indexes, keepers, hub index,
  * mix cuts, sample rates, eval index) need no reader beyond
  * [[table]] — the streaming gates take them as DataFrames directly.
  * The readers below rebuild the SCALA-VALUE states (ordered merge
  * vectors, centroid/codebook arrays, ratio maps, NB class tuples)
  * in exactly the shapes the gates' signatures require.
  */
object ArtifactShelf {

  /** A DataFrame-shaped artifact, as written. */
  def table(spark: SparkSession, shelfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$shelfDir/$name")

  /** The per-gate admission split ids (`art_splits`). */
  def splits(spark: SparkSession, shelfDir: String): Map[String, Long] =
    table(spark, shelfDir, "art_splits").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The BPE merge list in training order (`art_bpe_merges`) — the
    * shape `TextAnalysis.admitMergeList` returns and the frozen-merge
    * replay consumes.
    */
  def bpeMerges(spark: SparkSession, shelfDir: String)
      : Vector[(String, String)] =
    table(spark, shelfDir, "art_bpe_merges").orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toVector

  /** The IVF coarse-quantizer centroids (`art_ivf_centroids`), cell ×
    * dim — the shape `StreamOps.assignVectors` and the codegen'd
    * nearest_centroid pass consume.
    */
  def ivfCentroids(spark: SparkSession, shelfDir: String)
      : Array[Array[Double]] = {
    val rows = table(spark, shelfDir, "art_ivf_centroids").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val k = rows.map(_._1).max + 1
    val dims = rows.map(_._2).max + 1
    val out = Array.fill(k)(new Array[Double](dims))
    rows.foreach { case (c, p, v) => out(c)(p) = v }
    out
  }

  /** The PQ codebooks (`art_pq_codebooks`), subspace × cell × dim —
    * the shape `Similarity.pqEncode` / `StreamOps.encodeVectors`
    * consume.
    */
  def pqCodebooks(spark: SparkSession, shelfDir: String)
      : Array[Array[Array[Double]]] = {
    val rows = table(spark, shelfDir, "art_pq_codebooks").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2).toInt, r.getDouble(3)))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val sub = rows.map(_._3).max + 1
    val out = Array.fill(m, k)(new Array[Double](sub))
    rows.foreach { case (s, c, p, v) => out(s)(c)(p) = v }
    out
  }

  /** The DSIR token → ln-ratio map (`art_dsir_ratios`). */
  def dsirRatios(spark: SparkSession, shelfDir: String)
      : Map[String, Double] =
    table(spark, shelfDir, "art_dsir_ratios").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** The DSIR scalar constants (`art_dsir_consts`): (unseen-token
    * ratio, threshold weight, threshold doc id) — the
    * `StreamOps.selectDocs` tail of `Selection.dsirFrozen`'s tuple.
    */
  def dsirConsts(spark: SparkSession, shelfDir: String)
      : (Double, Double, Long) = {
    val r = table(spark, shelfDir, "art_dsir_consts").head()
    (r.getDouble(0), r.getDouble(1), r.getLong(2))
  }

  /** The frozen NB classifier state (`art_nb_classes` +
    * `art_nb_terms`), class-name sorted — the shape
    * `Selection.nbFrozen` returns and `StreamOps.classifyDocs`
    * consumes.
    */
  def nbState(spark: SparkSession, shelfDir: String)
      : Seq[(String, Double, Double, Map[String, Double])] = {
    val terms = table(spark, shelfDir, "art_nb_terms").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (c, rs) => c -> rs.map(t => t._2 -> t._3).toMap }
    table(spark, shelfDir, "art_nb_classes").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
      .map { case (c, p, d) => (c, p, d, terms.getOrElse(c, Map.empty)) }
      .toSeq
  }
}
