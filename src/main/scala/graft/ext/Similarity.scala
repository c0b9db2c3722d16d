package graft.ext

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] column): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale notes: brute-force is O(Q·N) — fine when the query set Q is small
  * and broadcastable (here: broadcast the queries, stream the corpus).
  * The LSH variant buckets the corpus by 6-bit hyperplane signatures in 6
  * hash tables so each query scans ~6/64 of the corpus, which is the
  * shape that survives N at 100 TB (tune bits up as N grows); hyperplanes
  * are deterministic (seed 42), so results reproduce across runs and
  * executors.
  */
object Similarity {

  private val dims = 64
  // OR-amplification: candidate if ANY table collides. 6 tables × 6-bit
  // signatures: for neighbors at cos θ, per-table collision is
  // (1 - θ/π)^6, OR'd over 6 tables — ~0.7 recall at cos 0.75 while each
  // query scans ~6/64 of the corpus.
  private val nTables = 6
  private val planesPerTable = 6 // 2^6 = 64 buckets per table

  /** Deterministic random hyperplanes (seed 42), one plane matrix per hash
    * table, captured in the signature UDF's closure — embedding them as
    * literal array expressions would rebuild 8×64 doubles per row and
    * bloat codegen.
    */
  private lazy val tablePlanes: Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nTables)(Array.fill(planesPerTable, dims)(rng.nextGaussian()))
  }

  /** Sign-signature of a vector under one table's hyperplanes → bucket id. */
  private def bucketUdf(t: Int) = {
    val planes = tablePlanes(t)
    udf { (v: Seq[Float]) =>
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var d = 0.0
        var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { d += v(i) * plane(i); i += 1 }
        bucket = bucket * 2 + (if (d > 0) 1L else 0L)
        p += 1
      }
      bucket
    }
  }

  /** Norm via the codegen'd dot_product expression (graft.functions):
    * float→double widening is exact, and the sequential-add fold order is
    * identical to the SQL `aggregate(zip_with(...))` formulation, so
    * results stay bit-compatible with the DuckDB oracle.
    */
  private def withVecNorm(df: DataFrame): DataFrame =
    df.withColumn("v", col("embedding"))
      .withColumn("nrm", sqrt(VectorFunctions.dotProduct(col("embedding"), col("embedding"))))

  private val dot = VectorFunctions.dotProduct(col("v1"), col("v2"))

  /** Shared exact re-rank tail: candidate pairs (query_id, neighbor_id,
    * v1, n1, v2, n2) → top-k by cosine with deterministic tie-breaks.
    */
  private def rerankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine_raw"), 6).desc, col("neighbor_id"))
    pairs
      .withColumn("cosine_raw", dot / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine_raw"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Brute-force cosine top-5 for query vectors vec_id < 10. Queries are
    * broadcast; ranking ties broken on (rounded cosine, neighbor_id).
    */
  def xKnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = withVecNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("v1"), col("nrm").as("n1"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("v2"), col("nrm").as("n2"))
    rerankTopK(broadcast(q).join(c, col("query_id") =!= col("neighbor_id")), 5)
  }

  /** LSH-bucketed ANN (no SQL oracle — rows-only check): 6 hash tables of
    * 6 random hyperplanes each (6-bit signature → 64 buckets/table).
    * A corpus vector is a candidate if it collides with the query in ANY
    * table (OR-amplification); exact cosine re-rank over the deduped
    * candidates, top-5 per query vec_id < 10. At scale each query scans
    * ~nTables/2^planesPerTable (6/64) of the corpus instead of all of it.
    */
  def xAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e0 = withVecNorm(Tables.embeddings(spark, dir))
    val withBuckets = (0 until nTables).foldLeft(e0) { (df, t) =>
      df.withColumn(s"bucket_$t", bucketUdf(t)(col("embedding")))
    }
    val sigBuckets = (0 until nTables).map(t =>
      struct(lit(t).as("tbl"), col(s"bucket_$t").as("bucket")))
    // Query side and corpus side both read this; persist to hash the
    // corpus through the hyperplanes once.
    val buckets = withBuckets.select(col("vec_id"), col("v"), col("nrm"),
        explode(array(sigBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .persist()
    val q = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"),
        col("v").as("v1"), col("nrm").as("n1"))
    val c = buckets.select(col("vec_id").as("neighbor_id"), col("tbl"),
      col("bucket"), col("v").as("v2"), col("nrm").as("n2"))
    rerankTopK(broadcast(q).join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "v1", "n1", "v2", "n2")
      .dropDuplicates("query_id", "neighbor_id"), 5)
  }

  /** IVF-style ANN (no SQL oracle — rows-only check): deterministic
    * coarse quantizer (centroids seeded from the first K vectors, one
    * Lloyd refinement), corpus partitioned by nearest centroid, queries
    * probe the nProbe nearest cells and re-rank exactly within them.
    * At scale the inverted lists are the partition layout: each query
    * reads nProbe/K of the corpus. Centroids are tiny (K × dims) and ride
    * in task closures like any broadcast constant.
    */
  def xAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val k = 16
    val nProbe = 4
    val e = withVecNorm(Tables.embeddings(spark, dir))
    // deterministic seed centroids: the first k vectors by id
    val seeds: Array[Array[Double]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def nearest(cs: Array[Array[Double]]) = udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cc = cs(c)
        val n = math.min(v.length, cc.length)
        while (i < n) { val t = v(i) - cc(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    // one Lloyd refinement: per-cell mean over the assigned vectors
    val assigned0 = e.withColumn("cell", nearest(seeds)(col("embedding")))
    val refined: Array[Array[Double]] = assigned0
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }.toArray
    val assigned = e.withColumn("cell", nearest(refined)(col("embedding"))).persist()
    // queries probe the nProbe nearest refined centroids
    val probe = udf { (v: Seq[Float]) =>
      refined.indices.map { c =>
        var d = 0.0; var i = 0
        val cc = refined(c)
        val n = math.min(v.length, cc.length)
        while (i < n) { val t = v(i) - cc(i); d += t * t; i += 1 }
        (c, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("v1"), col("nrm").as("n1"),
        explode(probe(col("embedding"))).as("cell"))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("cell"),
      col("v").as("v2"), col("nrm").as("n2"))
    rerankTopK(broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "v1", "n1", "v2", "n2")
      .dropDuplicates("query_id", "neighbor_id"), 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_knn_bruteforce" -> (xKnnBruteForce _),
    "x_ann_lsh"        -> (xAnnLsh _),
    "x_ann_ivf"        -> (xAnnIvf _))

  val oracle: Map[String, String] = Map(
    "x_knn_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine_raw
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine_raw,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(cosine_raw, 6) DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, round(cosine_raw, 4) AS cosine
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
}
