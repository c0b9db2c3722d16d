package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the REAL multimodal decoders — the only operators
  * with per-row JDK decode cost (javax.imageio PNG, javax.sound.sampled
  * WAV/PCM), which the spec suite proves correct on a handful of assets
  * but never times at volume. Synthesizes ~10⁴ assets ON THE EXECUTORS
  * (32 partitions — generation parallelism mirrors how a real corpus
  * arrives already distributed), persists them so generation cost stays
  * out of the timed pass, then times `Multimodal.imageFeatures` /
  * `audioFeatures` end to end and verifies the corrupt-byte degradation
  * contract at rate: every 20th asset is garbage bytes and must come
  * back as a marker row (never a task failure), so the printed
  * throughput INCLUDES the tolerant-decode tax a real mixed-quality
  * corpus pays.
  *
  * Usage: runMain graft.DecodeProbe [nAssets]
  * Prints one JSON line with imgs_per_sec / wavs_per_sec + marker counts.
  */
object DecodeProbe {

  private[graft] def pngBytes(seed: Long): Array[Byte] = {
    val w = 24 + (seed % 8).toInt
    val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rnd.nextInt(1 << 24)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private[graft] def wavBytes(seed: Long): Array[Byte] = {
    val sampleRate = 8000f
    val n = 1600 + (seed % 32).toInt * 25 // 0.2-0.3 s of 16-bit mono PCM
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      // square wave, period 64 samples, amplitude varying with the seed
      val amp = (4000 + (seed % 7) * 1000).toShort
      val s: Short = if ((i / 32) % 2 == 0) amp else (-amp).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val corruptEvery = 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(mk: Long => Array[Byte]): org.apache.spark.sql.DataFrame = {
      val df = spark.range(0L, n.toLong, 1L, 32).as[Long]
        .map(i => (i, if (i % corruptEvery == 0) Array[Byte](9, 9, 9, 9) else mk(i)))
        .toDF("doc_id", "asset").persist()
      df.count() // materialize: generation cost stays out of the timed pass
      df
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val imgs = corpus(pngBytes)
    val (imgMarkers, tImg) = time {
      val r = ext.Multimodal.imageFeatures(spark, imgs).persist()
      val total = r.count()
      val markers = r.filter(col("width") === -1).count()
      r.unpersist()
      require(total == n, s"image pass lost rows: $total of $n")
      markers
    }
    imgs.unpersist()

    val wavs = corpus(wavBytes)
    val (wavMarkers, tWav) = time {
      val r = ext.Multimodal.audioFeatures(spark, wavs).persist()
      val total = r.count()
      val markers = r.filter(col("sample_rate") === -1).count()
      r.unpersist()
      require(total == n, s"audio pass lost rows: $total of $n")
      markers
    }
    wavs.unpersist()

    val expectedMarkers = (n + corruptEvery - 1) / corruptEvery
    println(f"""{"probe":"real_decode","n":$n,"corrupt_every":$corruptEvery,""" +
      f""""img_sec":$tImg%.2f,"imgs_per_sec":${n / tImg}%.0f,"img_markers":$imgMarkers,""" +
      f""""wav_sec":$tWav%.2f,"wavs_per_sec":${n / tWav}%.0f,"wav_markers":$wavMarkers}""")
    require(imgMarkers == expectedMarkers,
      s"corrupt PNGs must all degrade to marker rows: $imgMarkers != $expectedMarkers")
    require(wavMarkers == expectedMarkers,
      s"corrupt WAVs must all degrade to marker rows: $wavMarkers != $expectedMarkers")
    spark.stop()
  }
}
