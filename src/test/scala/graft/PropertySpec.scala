package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants on randomized inputs (scalacheck generators,
  * fixed seeds for reproducibility): the upsert and the salted join must
  * behave like their naive specifications for any data.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowsGen: Gen[List[(Int, Int, Int)]] = Gen.listOfN(60,
    for {
      key <- Gen.choose(0, 9)
      ver <- Gen.choose(0, 5)
      payload <- Gen.choose(0, 1000)
    } yield (key, ver, payload))

  private def samples(n: Int): Seq[List[(Int, Int, Int)]] =
    (1 to n).flatMap(i => rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("upsert keeps exactly one row per key, and it carries the max order column") {
    import spark.implicits._
    samples(4).foreach { rows =>
      val df = rows.toDF("k", "ver", "payload")
      val withTs = (d: org.apache.spark.sql.DataFrame) =>
        d.withColumn("ver_ts", col("ver").cast("timestamp"))
      val half = rows.length / 2
      val merged = ops.KrogerIngest.upsert(
        withTs(rows.take(half).toDF("k", "ver", "payload")),
        withTs(rows.drop(half).toDF("k", "ver", "payload")),
        Seq("k"), "ver_ts")
      val expectMax = df.groupBy("k").agg(max("ver").as("max_ver"))
      assert(merged.count() == merged.select("k").distinct().count())
      assert(merged.count() == expectMax.count())
      val bad = merged.join(expectMax, "k").filter(col("ver") =!= col("max_ver"))
      assert(bad.count() == 0)
    }
  }

  test("horner_hash equals the BigInt model for any string and modulus") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val strs = (1 to 200).flatMap(i => strGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    for (mod <- Seq(97L, 1000000007L, (1L << 58) - 1)) {
      val got = strs.toDF("s")
        .select(col("s"),
          functions.VectorFunctions.hornerHash(col("s"), mod).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      strs.foreach { s =>
        // exact model: no overflow possible in BigInt, mod at the end of
        // each step like the expression
        val expected = s.getBytes("UTF-8").foldLeft(BigInt(0)) { (h, b) =>
          (h * 31 + (b & 0xff)) % mod
        }.toLong
        assert(got(s) == expected, s"mod=$mod s=${s.take(20)}")
      }
    }
  }

  test("salted join row multiset equals the plain join for any salt count") {
    import spark.implicits._
    samples(3).zip(Seq(1, 3, 7)).foreach { case (rows, salts) =>
      val big = rows.toDF("k", "ver", "payload")
      val small = (0 to 9).map(k => (k, s"dim_$k")).toDF("k", "name")
      val plain = big.join(small, Seq("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
      val salted = ext.Skew.saltedJoin(big, small, "k", salts)
        .groupBy("k").agg(count(lit(1)).as("n2"))
      assert(plain.join(salted, "k").filter(col("n") =!= col("n2")).count() == 0)
      assert(plain.count() == salted.count())
    }
  }
}
