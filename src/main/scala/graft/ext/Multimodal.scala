package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat assets as opaque `binary` columns with
  * typed metadata, and run batched decode / feature-extraction over
  * partitions.
  *
  * The GATED queries use a deterministic stub decode (the testdata corpus
  * has no real images, and third-party decode libs are not in this
  * container), but the plumbing is proven with a REAL decoder too:
  * `imageFeatures` decodes PNG byte arrays via JDK-built-in javax.imageio
  * through the identical mapPartitions shape, asserted pixel-by-pixel in
  * ExtensionsSpec ("real PNG decode..."). At scale the binary column rides
  * in parquet alongside its metadata; metadata-only queries never touch the
  * bytes thanks to parquet column pruning.
  */
object Multimodal {

  /** Metadata extraction over a binary asset column (oracle-checked):
    * byte length, content digest, fake format tag.
    */
  def xMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("asset"))
      .select(col("doc_id"),
        octet_length(col("asset")).cast("long").as("n_bytes"),
        sha2(col("asset"), 256).as("digest"),
        when(octet_length(col("asset")) % 3 === 0, "jpeg")
          .when(octet_length(col("asset")) % 3 === 1, "png")
          .otherwise("webp").as("format"))
      .orderBy("doc_id")

  /** Partition-batched feature extraction with a STUB decoder. A real
    * deployment swaps `stubDecode` for an image/audio decoder; the
    * mapPartitions batch shape and the fixed-size Array[Float] output
    * schema are the production plumbing. The fake hash folds in
    * mod-1e9+7 arithmetic (no 64-bit wraparound), which keeps it exactly
    * expressible as a DuckDB Horner fold — so even the stub path is
    * hash-gated against the SQL oracle, not rows-only.
    */
  def xMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // STUB: deterministic fake "feature extraction" from the asset
    // payload. The fold strides over the CODE POINTS of the UTF-8
    // payload (positions AND values), matching the oracle's
    // ord(substr(text, j, 1)) over generate_series(1, length(text), 8)
    // bitwise on any text — ASCII or not. A real decoder works on the
    // raw bytes; only the fake hash interprets them as text. Lane i
    // folds code points at positions ≡ i (mod 8) in order, so ONE
    // in-place pass over the bytes (graft.functions.HornerHash
    // .decodePacked — no String, no codePoints().toArray per row)
    // updates lane (j mod 8) as code point j streams by.
    def stubDecode(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Long](8)
      var i = 0
      while (i < 8) { h(i) = (1125899906842597L + i) % 1000000007L; i += 1 }
      var j = 0
      var p = 0
      val n = bytes.length
      while (p < n) {
        val packed = graft.functions.HornerHash.decodePacked(bytes, p, n)
        p += (packed & 3) + 1
        val lane = j & 7
        h(lane) = (h(lane) * 31 + (packed >>> 2)) % 1000000007L
        j += 1
      }
      Array.tabulate(8)(i => (h(i) % 1000L) / 1000.0f)
    }
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("asset"))
      .as[(Long, Array[Byte])]
    assets
      .mapPartitions(_.map { case (id, bytes) => (id, stubDecode(bytes)) })
      .toDF("doc_id", "features")
      .select(col("doc_id"), size(col("features")).cast("long").as("n_features"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id")
  }

  /** Partition-batched frame sampling + resize plumbing. Treats each
    * asset as a fake "video": fixed-size frames at a byte stride, every
    * Nth frame sampled, each "resized" by the stub into a 4-float
    * thumbnail signature. The schema shape — one row per
    * (asset, frame_index) with a fixed-length vector — is the real
    * contract a decoder plugs into; STUB marks the fake decode, which
    * (like xMultimodalFeatures) folds in mod-1e9+7 arithmetic so the
    * frame count AND the thumbnail values are hash-gated against a
    * DuckDB oracle.
    */
  def xMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameBytes = 64
    val sampleEvery = 4
    // STUB: a real implementation decodes frames and resizes pixels; the
    // deterministic fake hashes each sampled frame window into 4 floats.
    // Frame windows and strides index the payload's CODE POINTS (like
    // stubDecode) so the oracle's character-position arithmetic holds on
    // any text — a real decoder would frame the raw bytes instead.
    // Single in-place pass over the bytes: within a sampled frame, lane
    // i folds within-frame offsets ≡ i (mod 4) in order, so streaming
    // code point j updates lane ((j mod 64) mod 4) of the current frame;
    // a full frame flushes when the next frame's first code point
    // arrives. Only frame 0 may be emitted partial (nFrames =
    // max(totalCps/64, 1) — any later partial tail is dropped, and a
    // full frame f always satisfies f < nFrames).
    def sampleFrames(bytes: Array[Byte]): Seq[(Int, Array[Float])] = {
      val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Float])]()
      val h = new Array[Long](4)
      def initH(): Unit = { var i = 0; while (i < 4) { h(i) = 17L + i; i += 1 } }
      def thumb(): Array[Float] = Array.tabulate(4)(i => (h(i) % 997L) / 1000.0f)
      initH()
      var j = 0
      var p = 0
      val n = bytes.length
      while (p < n) {
        val packed = graft.functions.HornerHash.decodePacked(bytes, p, n)
        p += (packed & 3) + 1
        val f = j / frameBytes
        val r = j - f * frameBytes
        if (r == 0 && j > 0) {
          if ((f - 1) % sampleEvery == 0) out += ((f - 1, thumb()))
          if (f % sampleEvery == 0) initH()
        }
        if (f % sampleEvery == 0)
          h(r & 3) = (h(r & 3) * 31 + (packed >>> 2)) % 1000000007L
        j += 1
      }
      if (j == 0 || j < frameBytes) out += ((0, thumb())) // lone partial frame 0
      else if (j % frameBytes == 0 && (j / frameBytes - 1) % sampleEvery == 0)
        out += ((j / frameBytes - 1, thumb())) // text ended exactly on a frame edge
      out.toSeq
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        sampleFrames(bytes).map { case (f, thumb) => (id, f, thumb) }
      })
      .toDF("doc_id", "frame_index", "thumb")
      .select(col("doc_id"), col("frame_index").cast("long").as("frame_index"),
        size(col("thumb")).cast("long").as("thumb_dims"),
        round(element_at(col("thumb"), 1).cast("double"), 4).as("t0"))
      .orderBy("doc_id", "frame_index")
  }

  /** REAL image decode through the same partition-batched plumbing the
    * stub queries exercise — javax.imageio ships with the JDK, so this
    * needs no dependency the container lacks. Each binary asset is
    * decoded to (width, height, mean RGB); undecodable bytes yield a
    * (-1, -1, empty) row instead of failing the partition, the tolerant
    * posture an ingest pipeline needs when a corpus mixes good and
    * corrupt assets. The gated x_multimodal_* queries keep the
    * deterministic stub (the testdata corpus has no real images to
    * decode); ExtensionsSpec "real PNG decode" proves THIS path on
    * synthesized PNG byte arrays end to end, which is what upgrades
    * "the plumbing is real" from claim to test.
    */
  def imageFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id").cast("long"), col("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) (id, -1, -1, Array.empty[Float])
        else {
          val w = img.getWidth
          val h = img.getHeight
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          (id, w, h, Array(rs / n, gs / n, bs / n))
        }
      })
      .toDF("doc_id", "width", "height", "mean_rgb")
  }

  /** REAL audio decode through the same plumbing — javax.sound.sampled
    * also ships with the JDK. Parses WAV/PCM byte arrays to (sample
    * rate, channels, sample count, RMS amplitude over 16-bit LE PCM);
    * undecodable bytes degrade to a (-1, -1, -1, -1.0) marker row like
    * imageFeatures. Proven on synthesized square/silent waves in
    * ExtensionsSpec ("real WAV decode...") — with imageFeatures this
    * covers both decode families the stub queries model, no new deps.
    */
  def audioFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id").cast("long"), col("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          val data = in.readAllBytes()
          in.close()
          // RMS over 16-bit little-endian PCM samples
          val n = data.length / 2
          var sumSq = 0.0
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            sumSq += s.toDouble * s
            i += 2
          }
          val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
          (id, fmt.getSampleRate.toInt, fmt.getChannels, n.toLong, rms)
        } catch { case _: Exception => (id, -1, -1, -1L, -1.0) }
      })
      .toDF("doc_id", "sample_rate", "channels", "n_samples", "rms")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_multimodal_meta"     -> (xMultimodalMeta _),
    "x_multimodal_features" -> (xMultimodalFeatures _),
    "x_multimodal_frames"   -> (xMultimodalFrames _))

  val oracle: Map[String, String] = Map(
    "x_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS digest,
        |  CASE WHEN octet_length(text::BLOB) % 3 = 0 THEN 'jpeg'
        |    WHEN octet_length(text::BLOB) % 3 = 1 THEN 'png'
        |    ELSE 'webp' END AS format
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Stub-decode twins: the fake decoders are Horner folds in mod-1e9+7
    // arithmetic precisely so these oracles exist — the per-code-point
    // fold is re-expressed as list_reduce over the sampled 1-based
    // CHARACTER positions (length(text), not octet_length: both sides
    // index code points, so the twins hold on non-ASCII payloads too).
    // Only the first feature/thumb lane (i=0) is emitted, so the oracle
    // folds that lane; n_features/thumb_dims pin the fixed vector widths
    // and the frames oracle re-derives the frame-count arithmetic
    // (max(len/64,1) frames, every 4th sampled).
    "x_multimodal_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(1125899906842597 % 1000000007,
        |        list_transform(generate_series(1, len, 8),
        |          j -> ord(substr(text, j, 1))::BIGINT)),
        |      (h, b) -> (h * 31 + b) % 1000000007) AS h0
        |  FROM d)
        |SELECT doc_id, CAST(8 AS BIGINT) AS n_features,
        |  round((h0 % 1000) / 1000.0, 4) AS f0
        |FROM h ORDER BY doc_id""".stripMargin,
    "x_multimodal_frames" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents),
        |f AS (
        |  SELECT doc_id, text, len,
        |    unnest(generate_series(0, greatest(len // 64, 1) - 1, 4)) AS frame_index
        |  FROM d),
        |h AS (
        |  SELECT doc_id, frame_index,
        |    list_reduce(
        |      list_prepend(17,
        |        list_transform(
        |          generate_series(frame_index * 64 + 1, least(frame_index * 64 + 64, len), 4),
        |          j -> ord(substr(text, j, 1))::BIGINT)),
        |      (h, b) -> (h * 31 + b) % 1000000007) AS h0
        |  FROM f)
        |SELECT doc_id, CAST(frame_index AS BIGINT) AS frame_index,
        |  CAST(4 AS BIGINT) AS thumb_dims,
        |  round((h0 % 997) / 1000.0, 4) AS t0
        |FROM h ORDER BY doc_id, frame_index""".stripMargin)
}
