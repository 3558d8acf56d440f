package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded by REAL pure-JDK kernels where the JDK
  * ships a codec:
  *
  *   - images: `javax.imageio` (PNG/JPEG/GIF/BMP) — true width/height,
  *     mean luma over the actual pixels, and a deterministic 8x8
  *     average-hash perceptual fingerprint (manual box pooling, no
  *     platform-dependent scaler);
  *   - audio: `javax.sound.sampled` (WAV/AIFF/AU PCM) — true duration
  *     from the frame count, mean |amplitude| over decoded samples;
  *   - video: AVI container parsing + frame decode for the two payloads a
  *     pure JDK can read — uncompressed DIB (hand-decoded, deterministic)
  *     and MJPEG (per-frame JPEG via ImageIO); see [[AviCodec]]. Clips in
  *     codecs the JDK genuinely cannot decode (h264/vp9/…) flow to the
  *     error channel like any other unreadable content.
  *
  * Decode failures follow the engine's error-channel convention: a row
  * with null features and a populated `error` column, ready for
  * `Fork.validErrorSplit`. Kernels run via mapPartitions so per-batch
  * setup is amortized across a partition.
  *
  * Scale notes: media rows are large (MBs); the repartitioning helper sizes
  * partitions by *bytes* not rows so a 100TB corpus of 2MB images doesn't
  * put 10GB in one task.
  */
object Multimodal {

  /** Canonical media record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true),
    )), nullable = true),
  ))

  /** Repartition a media DataFrame so each partition holds ~targetBytes of
    * payload. Size comes from Catalyst's plan statistics (file-metadata /
    * relation size — driver-side, O(1), no job), NOT from scanning the
    * content: the round-1 version ran a full agg over all media bytes and
    * then a full shuffle of them, which at 100TB is two extra passes over
    * the corpus just to pick a partition count. Note for writes the
    * shuffle-free path is `maxRecordsPerFile`/AQE; use this only when a
    * downstream mapPartitions kernel genuinely needs byte-balanced tasks. */
  def repartitionByBytes(df: DataFrame, targetBytes: Long): DataFrame = {
    val total = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1L, (total / BigInt(math.max(1L, targetBytes))).toLong)
    df.repartition(math.min(parts, Int.MaxValue.toLong).toInt)
  }

  final case class ImageFeatures(media_id: Long, width: Option[Int],
                                 height: Option[Int], mean_luma: Option[Double],
                                 phash: Option[String], error: Option[String])

  /** Real image decode + feature extraction over `javax.imageio`.
    * Undecodable content yields an error row (null features + message). */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (ImageIO scans its reader registry once)
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Decode one image: true dimensions, mean luma (Rec.601 weights over
    * every pixel), and an 8x8 average-hash — deterministic manual box
    * pooling, not a platform-dependent scaler, so fingerprints computed on
    * different JVMs/OSes agree (the cross-run property dedup needs). */
  private[llm] def decodeImage(id: Long, bytes: Array[Byte]): ImageFeatures = {
    if (bytes == null || bytes.isEmpty)
      return ImageFeatures(id, None, None, None, None, Some("empty content"))
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        return ImageFeatures(id, None, None, None, None,
          Some("no ImageIO reader for content"))
      val (luma, phash) = imageStats(img)
      ImageFeatures(id, Some(img.getWidth), Some(img.getHeight), Some(luma),
        Some(phash), None)
    } catch {
      case e: Exception =>
        ImageFeatures(id, None, None, None, None,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Perceptual near-duplicate image pairs over the 8×8 average-hash —
    * the media twin of the d05 text SimHash: re-encoded, slightly
    * cropped or lightly edited copies land within a few phash bits of
    * the original, so pairing on small Hamming distance catches the
    * duplicates an exact byte hash can't. Same Hamming-band LSH shape
    * as the text tier: the 64-bit hex hash splits into four 16-bit
    * band keys, candidates equi-join on any shared band (only
    * (band, id, two 32-bit halves) rows shuffle — never image bytes),
    * and the exact distance filters survivors. Pigeonhole: a pair
    * within Hamming 3 ALWAYS shares a band; distance-4 pairs are found
    * unless all four differing bits land in four distinct bands (the
    * same recall contract as d05, stated not hidden).
    *
    * Input: an [[extractImageFeatures]] frame (error rows — null phash
    * — drop out). Output: (id1, id2, hamming), id1 < id2, deduped
    * across bands. Hex parses as two 32-bit halves (conv of the full
    * 16 chars would overflow signed BIGINT for hashes ≥ 2^63). */
  def phashNearDupPairs(features: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64]: $maxHamming")
    import org.apache.spark.sql.functions._
    val base = features
      .where(col("phash").isNotNull)
      .select(col("media_id"), col("phash"),
        conv(substring(col("phash"), 1, 8), 16, 10).cast("long").as("__hi"),
        conv(substring(col("phash"), 9, 8), 16, 10).cast("long").as("__lo"))
    val banded = base.select(col("media_id"), col("__hi"), col("__lo"),
      posexplode(array((0 until 4).map(b =>
        substring(col("phash"), b * 4 + 1, 4)): _*)).as(Seq("__band", "__key")))
    val a = banded.select(col("__band"), col("__key"),
      col("media_id").as("id1"), col("__hi").as("__h1"), col("__lo").as("__l1"))
    val b = banded.select(col("__band"), col("__key"),
      col("media_id").as("id2"), col("__hi").as("__h2"), col("__lo").as("__l2"))
    a.join(b, Seq("__band", "__key"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (bit_count(col("__h1").bitwiseXOR(col("__h2"))) +
          bit_count(col("__l1").bitwiseXOR(col("__l2")))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Mean Rec.601 luma over every pixel + the 8x8 average-hash (manual box
    * pooling, cross-JVM-stable). Shared by the image and video kernels so a
    * frame's fingerprint is comparable to a still image's. */
  private[llm] def imageStats(img: java.awt.image.BufferedImage): (Double, String) = {
    val w = img.getWidth; val h = img.getHeight
    val cellSum = new Array[Double](64)
    val cellN = new Array[Long](64)
    var lumaSum = 0.0
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        lumaSum += luma
        val c = cy * 8 + (x * 8 / w)
        cellSum(c) += luma; cellN(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.tabulate(64)(c => if (cellN(c) == 0) 0.0 else cellSum(c) / cellN(c))
    val mean = cells.sum / 64.0
    var bits = 0L
    var c = 0
    while (c < 64) { if (cells(c) > mean) bits |= (1L << c); c += 1 }
    (lumaSum / (w.toLong * h), f"$bits%016x")
  }

  final case class AudioFeatures(media_id: Long, duration_ms: Option[Long],
                                 sample_rate: Option[Int], channels: Option[Int],
                                 mean_amplitude: Option[Double],
                                 fingerprint: Option[String], error: Option[String])

  /** Real audio decode over `javax.sound.sampled` (WAV/AIFF/AU): duration
    * from the frame count, mean |amplitude| in [0,1] over decoded PCM
    * samples, md5 content fingerprint of the decoded PCM (container
    * metadata doesn't perturb it). Non-PCM/unreadable content yields an
    * error row. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.where(col("media_type") === "audio")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => decodeAudio(id, bytes) })
  }

  private[llm] def decodeAudio(id: Long, bytes: Array[Byte]): AudioFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.isEmpty)
      return AudioFeatures(id, None, None, None, None, None, Some("empty content"))
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      // AudioSystem.NOT_SPECIFIED (-1) frame length/rate (e.g. AU files
      // with the unknown-length header) must yield None, not a confident 0
      val durMs: Option[Long] =
        if (frames < 0 || fmt.getFrameRate <= 0) None
        else Some((frames * 1000.0 / fmt.getFrameRate).toLong)
      val pcm = in.readAllBytes()
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val amp: Option[Double] =
        if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
          var sum = 0.0; var i = 0
          while (i + 1 < pcm.length) {
            val s = if (fmt.isBigEndian) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
                    else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
            sum += math.abs(s.toDouble) / 32768.0
            i += 2
          }
          Some(if (pcm.length < 2) 0.0 else sum / (pcm.length / 2))
        } else if (enc == AudioFormat.Encoding.PCM_SIGNED && bits == 8) {
          Some(if (pcm.isEmpty) 0.0 else pcm.map(b => math.abs(b.toDouble) / 128.0).sum / pcm.length)
        } else None // format decoded but sample layout unsupported for stats
      val fp = java.security.MessageDigest.getInstance("MD5").digest(pcm)
        .take(8).map("%02x".format(_)).mkString
      AudioFeatures(id, durMs, Some(fmt.getSampleRate.toInt),
        Some(fmt.getChannels), amp, Some(fp), None)
    } catch {
      case e: Exception =>
        AudioFeatures(id, None, None, None, None, None,
          Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  final case class ResizedImage(media_id: Long, content: Option[Array[Byte]],
                                error: Option[String])

  /** Real image resize kernel: decode via javax.imageio, deterministic
    * box-average downscale (nearest-pixel for upscale cells), re-encode
    * PNG. The same manual pooling as the average-hash, so resized output
    * is byte-identical across JVMs/OSes — a resize-then-hash pipeline
    * stays reproducible. Failures go to the error channel. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   width: Int, height: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"bad target size ${width}x$height")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => resizeImage(id, bytes, width, height) })
  }

  private[llm] def resizeImage(id: Long, bytes: Array[Byte],
                               w: Int, h: Int): ResizedImage = {
    if (bytes == null || bytes.isEmpty)
      return ResizedImage(id, None, Some("empty content"))
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return ResizedImage(id, None, Some("no ImageIO reader for content"))
      val w0 = img.getWidth; val h0 = img.getHeight
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < h) {
        val y0 = ty * h0 / h; val y1 = math.max(y0 + 1, (ty + 1) * h0 / h)
        var tx = 0
        while (tx < w) {
          val x0 = tx * w0 / w; val x1 = math.max(x0 + 1, (tx + 1) * w0 / w)
          var r = 0L; var g = 0L; var b = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
              n += 1; x += 1
            }
            y += 1
          }
          out.setRGB(tx, ty,
            (((r / n).toInt & 0xff) << 16) | (((g / n).toInt & 0xff) << 8) | ((b / n).toInt & 0xff))
          tx += 1
        }
        ty += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      ResizedImage(id, Some(bos.toByteArray), None)
    } catch {
      case e: Exception =>
        ResizedImage(id, None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  /** Metadata-only frame-tick sampler: one row per `everyMs` tick of
    * `meta.duration_ms`, no content read. Use to PLAN a sampling pass (how
    * many frames will a corpus yield?) without touching payload bytes —
    * at 100TB that is a metadata-column scan, not a media scan. For actual
    * frame decode use [[extractVideoFrames]]. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(0L)) - 1, lit(0L)),
          lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame", lit(null).cast(BinaryType))

  final case class VideoFrameFeatures(media_id: Long, frame_index: Int,
                                      frame_ts_ms: Long, width: Option[Int],
                                      height: Option[Int], mean_luma: Option[Double],
                                      phash: Option[String], error: Option[String])

  /** REAL video frame sampling + feature extraction: parse the AVI
    * container ([[AviCodec]]), pick one frame per `everyMs` of stream time
    * (dedup'd to distinct frame indices via the stream's own rate), decode
    * only those frames (DIB by hand, MJPEG via ImageIO), and emit the same
    * luma/average-hash features as the image kernel — so frames dedup
    * against stills with the same fingerprint space. Unreadable clips or
    * frames yield error rows; the parse collects frame offsets only, so a
    * sparse sample of a long clip decodes just the sampled frames. */
  def extractVideoFrames(spark: SparkSession, media: DataFrame,
                         everyMs: Long): Dataset[VideoFrameFeatures] = {
    import spark.implicits._
    require(everyMs > 0, s"everyMs must be positive: $everyMs")
    media.where(col("media_type") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        decodeVideoFrames(id, bytes, everyMs)
      })
  }

  private[llm] def decodeVideoFrames(id: Long, bytes: Array[Byte],
                                     everyMs: Long): Seq[VideoFrameFeatures] = {
    def err(m: String) = Seq(VideoFrameFeatures(id, -1, 0L, None, None, None, None, Some(m)))
    if (bytes == null || bytes.isEmpty) return err("empty content")
    AviCodec.parse(bytes) match {
      case Left(reason) => err(reason)
      case Right(v) if v.frameCount == 0 => err("AVI has no frames")
      case Right(v) =>
        // distinct frame indices hit by ticks 0, everyMs, 2*everyMs, … —
        // integer math throughout so timestamps are exact
        val durMs = v.durationMs
        val indices = Iterator.iterate(0L)(_ + everyMs).takeWhile(_ < math.max(durMs, 1L))
          .map(ts => math.min(v.frameCount - 1L, ts * v.info.fpsNum / (1000L * v.info.fpsDen)).toInt)
          .distinct.toSeq
        indices.map { i =>
          AviCodec.decodeFrame(v, i) match {
            case Left(reason) =>
              VideoFrameFeatures(id, i, v.frameTsMs(i), None, None, None, None, Some(reason))
            case Right(img) =>
              val (luma, phash) = imageStats(img)
              VideoFrameFeatures(id, i, v.frameTsMs(i), Some(img.getWidth),
                Some(img.getHeight), Some(luma), Some(phash), None)
          }
        }
    }
  }

  /** Scene segmentation over sampled frames: a boundary wherever the
    * consecutive-frame perceptual-hash Hamming distance exceeds
    * `maxHamming` (the shot-cut detector every video-curation pipeline
    * runs before sampling training frames — one frame per SCENE beats one
    * per second of a static shot). Input is [[extractVideoFrames]] output
    * (error rows excluded by the caller); the 64-bit hex phash splits
    * into two 32-bit halves for overflow-free integer XOR. One window +
    * one aggregate, both partitioned by media_id — frames of one clip
    * are bounded, so the per-clip window is the right unit of
    * parallelism at a 100TB video corpus (clips are many, frames per
    * clip are not).
    * Output: (media_id, scene_idx, start_frame, end_frame, n_frames,
    * start_ts_ms, end_ts_ms). */
  def sceneSegments(frames: DataFrame, maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0: $maxHamming")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_index"))
    def half(c: Column, from: Int): Column =
      conv(substring(c, from, 8), 16, 10).cast("long")
    val lagged = frames
      .select(col("media_id"), col("frame_index"), col("frame_ts_ms"),
        col("phash"))
      .withColumn("__prev", lag(col("phash"), 1).over(w))
    val ham =
      bit_count(half(col("phash"), 1).bitwiseXOR(half(col("__prev"), 1))) +
        bit_count(half(col("phash"), 9).bitwiseXOR(half(col("__prev"), 9)))
    lagged
      .withColumn("__b",
        when(col("__prev").isNull || ham > maxHamming, 1).otherwise(0))
      .withColumn("scene_idx",
        sum(col("__b")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)) - 1)
      .groupBy(col("media_id"), col("scene_idx"))
      .agg(min(col("frame_index")).as("start_frame"),
        max(col("frame_index")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        min(col("frame_ts_ms")).as("start_ts_ms"),
        max(col("frame_ts_ms")).as("end_ts_ms"))
  }
}
