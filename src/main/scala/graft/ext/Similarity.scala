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
  * The LSH variant buckets the corpus by 8-bit hyperplane signatures in 4
  * hash tables so each query scans ~4/256 of the corpus, which is the
  * shape that survives N at 100 TB; hyperplanes are deterministic
  * (seed 42), so results are reproducible across runs and executors.
  */
object Similarity {

  private val dims = 64
  private val nTables = 4  // OR-amplification: candidate if ANY table collides
  private val planesPerTable = 8 // 2^8 = 256 buckets per table

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

  /** Brute-force cosine top-5 for query vectors vec_id < 10. Queries are
    * broadcast; ranking ties broken on (rounded cosine, neighbor_id).
    */
  def xKnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = withVecNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("v1"), col("nrm").as("n1"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("v2"), col("nrm").as("n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine_raw"), 6).desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_raw", dot / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine_raw"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN (no SQL oracle — rows-only check): 4 hash tables of
    * 8 random hyperplanes each (8-bit signature → 256 buckets/table).
    * A corpus vector is a candidate if it collides with the query in ANY
    * table (OR-amplification); exact cosine re-rank over the deduped
    * candidates, top-5 per query vec_id < 10. At scale each query scans
    * ~nTables/256 of the corpus instead of all of it.
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("cosine_raw"), 6).desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "v1", "n1", "v2", "n2")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine_raw", dot / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine_raw"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_knn_bruteforce" -> (xKnnBruteForce _),
    "x_ann_lsh"        -> (xAnnLsh _))

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
