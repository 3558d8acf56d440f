package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The decode/feature kernels are STUBBED with
  * deterministic fakes (no codec libraries in this environment) — the
  * Spark-side contract (schema, batching, partition sizing) is real.
  *
  * Scale notes: media rows are large (MBs); the repartitioning helper sizes
  * partitions by *bytes* not rows so a 100TB corpus of 2MB images doesn't
  * put 10GB in one task. Kernels run via mapPartitions so per-batch setup
  * (codec init, model load) is amortized across a partition.
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

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 mean_luma: Double, phash: String)

  /** Deterministic fake image decode + feature extraction. A real deployment
    * swaps `decodeKernel` for a codec call; everything around it (partition
    * iteration, output schema, encoder) is production-shaped. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would init the codec here (amortized)
        it.map { case (id, bytes) => decodeKernel(id, Option(bytes).getOrElse(Array.empty)) }
      }
  }

  /** STUB decode: deterministic features derived from the byte content. */
  private def decodeKernel(id: Long, bytes: Array[Byte]): ImageFeatures = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val hash = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .take(8).map("%02x".format(_)).mkString
    ImageFeatures(id, width = math.max(1, n % 1024), height = math.max(1, (n / 1024) % 1024),
      mean_luma = mean, phash = hash)
  }

  final case class AudioFeatures(media_id: Long, duration_ms: Long,
                                 mean_amplitude: Double, fingerprint: String)

  /** Audio feature extraction with the same production-shaped plumbing as
    * the image path (mapPartitions batching, typed Dataset out); the
    * decode kernel is a deterministic STUB (no audio codecs in this
    * environment) deriving features from the raw bytes + metadata. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.where(col("media_type") === "audio")
      .select(col("media_id"), col("content"), col("meta.duration_ms"))
      .as[(Long, Array[Byte], Option[Long])]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized)
        it.map { case (id, bytes, dur) =>
          val b = Option(bytes).getOrElse(Array.empty[Byte])
          val mean = if (b.isEmpty) 0.0 else b.map(x => math.abs(x.toDouble)).sum / b.length
          val fp = java.security.MessageDigest.getInstance("MD5").digest(b)
            .take(8).map("%02x".format(_)).mkString
          AudioFeatures(id, dur.getOrElse(0L), mean, fp)
        }
      }
  }

  /** Frame sampling plumbing for video: emit one row per sampled frame index
    * (every `everyMs` ms of duration) with the parent id — the flatMap shape
    * a real frame extractor uses; frame bytes stubbed to null. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(0L)) - 1, lit(0L)),
          lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame", lit(null).cast(BinaryType))
}
