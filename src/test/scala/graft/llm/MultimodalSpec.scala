package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  /** Render a real PNG in-memory: pixels(y)(x) as 0xRRGGBB. */
  private def png(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render a real 16-bit mono little-endian WAV from raw samples. */
  private def wav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def mediaDf(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)

  test("extractImageFeatures decodes real PNGs: dimensions, luma, error channel") {
    // 2x2: two black, two white pixels -> mean luma 127.5; 4x1 mid-gray
    val bw = png(Array(Array(0x000000, 0xffffff), Array(0xffffff, 0x000000)))
    val gray = png(Array(Array(0x808080, 0x808080, 0x808080, 0x808080)))
    val df = mediaDf(Seq(
      Row(1L, "image", bw, null),
      Row(2L, "image", gray, null),
      Row(3L, "image", Array[Byte](1, 2, 3), null))) // not an image
    val feats = Multimodal.extractImageFeatures(spark, df)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width.contains(2) && feats(1L).height.contains(2))
    assert(feats(1L).error.isEmpty)
    assert(math.abs(feats(1L).mean_luma.get - 127.5) < 1e-9)
    assert(feats(2L).width.contains(4) && feats(2L).height.contains(1))
    assert(math.abs(feats(2L).mean_luma.get - 128.0) < 0.5) // 0x80 gray
    // decode failure -> error row, not an exception
    assert(feats(3L).error.nonEmpty && feats(3L).phash.isEmpty)
  }

  test("average-hash is deterministic and separates distinct images") {
    // structured image: left half black, right half white
    def half(w: Int, h: Int) = png(Array.tabulate(h, w)((_, x) =>
      if (x < w / 2) 0x000000 else 0xffffff))
    val a1 = Multimodal.decodeImage(1L, half(32, 32))
    val a2 = Multimodal.decodeImage(2L, half(32, 32))
    val b = Multimodal.decodeImage(3L, png(Array.tabulate(32, 32)((y, _) =>
      if (y < 16) 0x000000 else 0xffffff))) // top/bottom split instead
    assert(a1.phash == a2.phash, "same pixels must hash identically")
    assert(a1.phash != b.phash, "structurally different images must differ")
    assert(a1.phash.get.matches("[0-9a-f]{16}"))
    // scale invariance of the 8x8 pooling: same structure at 64x64
    val big = Multimodal.decodeImage(4L, half(64, 64))
    assert(big.phash == a1.phash, "average-hash must be scale-stable for exact pools")
  }

  test("extractAudioFeatures decodes real WAV: duration, rate, amplitude, errors") {
    // 8000 frames at 8kHz = 1000ms of constant half-amplitude
    val tone = wav(Array.fill[Short](8000)(16384))
    val silent = wav(Array.fill[Short](4000)(0)) // 500ms silence
    val df = mediaDf(Seq(
      Row(10L, "audio", tone, null),
      Row(11L, "audio", silent, null),
      Row(12L, "audio", Array[Byte](7, 7, 7), null), // not audio
      Row(13L, "image", png(Array(Array(0x101010))), null))) // filtered out
    val out = Multimodal.extractAudioFeatures(spark, df)
      .collect().map(f => f.media_id -> f).toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L).duration_ms.contains(1000L))
    assert(out(10L).sample_rate.contains(8000) && out(10L).channels.contains(1))
    assert(math.abs(out(10L).mean_amplitude.get - 0.5) < 1e-3)
    assert(out(11L).duration_ms.contains(500L))
    assert(out(11L).mean_amplitude.contains(0.0))
    assert(out(10L).fingerprint != out(11L).fingerprint)
    assert(out(12L).error.nonEmpty && out(12L).fingerprint.isEmpty)
  }

  test("resizeImages: real box-average downscale, deterministic bytes, error channel") {
    // 4x4 quadrant image -> 2x2: each target pixel = its quadrant's color
    val quad = png(Array.tabulate(4, 4)((y, x) =>
      (if (y < 2) (if (x < 2) 0xff0000 else 0x00ff00)
       else (if (x < 2) 0x0000ff else 0xffffff))))
    val df = mediaDf(Seq(
      Row(1L, "image", quad, null),
      Row(2L, "image", Array[Byte](0, 1), null)))
    val out = Multimodal.resizeImages(spark, df, 2, 2)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(2L).error.nonEmpty && out(2L).content.isEmpty)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content.get))
    assert(resized.getWidth == 2 && resized.getHeight == 2)
    assert((resized.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((resized.getRGB(1, 0) & 0xffffff) == 0x00ff00)
    assert((resized.getRGB(0, 1) & 0xffffff) == 0x0000ff)
    assert((resized.getRGB(1, 1) & 0xffffff) == 0xffffff)
    // deterministic: same input -> same encoded bytes (reproducible
    // resize-then-hash pipelines)
    val again = Multimodal.resizeImage(1L, quad, 2, 2)
    assert(again.content.get.toSeq == out(1L).content.get.toSeq)
    // upscale path (nearest-cell) stays well-defined
    val up = Multimodal.resizeImage(1L, quad, 8, 8)
    assert(up.error.isEmpty && javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up.content.get)).getWidth == 8)
  }

  test("sampleFrames: one row per everyMs tick of video duration, others skipped") {
    val df = mediaDf(Seq(
      Row(2L, "video", null, Row(null, null, 2500L, "h264")),
      Row(9L, "image", null, Row(2, 2, null, "png"))))
    val frames = Multimodal.sampleFrames(df, everyMs = 1000)
      .select("media_id", "frame_ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 2500ms video sampled at 0,1000,2000
    assert(frames.toSet == Set((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }

  test("extractVideoFrames decodes real AVI frames with image-kernel features") {
    val avi = MediaFixtures.aviRgb24(16, 16, 10, Seq(
      (_, _) => 0x000000,
      (x, _) => if (x < 8) 0x000000 else 0xffffff))
    val df = mediaDf(Seq(
      Row(7L, "video", avi, null),
      Row(8L, "video", Array[Byte](9, 9, 9), null), // not an AVI
      Row(9L, "image", avi, null)))                 // wrong type: excluded
    val rows = Multimodal.extractVideoFrames(spark, df, everyMs = 100L)
      .collect().groupBy(_.media_id)
    val good = rows(7L).sortBy(_.frame_index)
    assert(good.map(f => (f.frame_index, f.frame_ts_ms)).toSeq == Seq((0, 0L), (1, 100L)))
    assert(good.forall(f => f.width.contains(16) && f.height.contains(16) && f.error.isEmpty))
    assert(good(0).mean_luma.contains(0.0) && good(0).phash.contains("0000000000000000"))
    assert(math.abs(good(1).mean_luma.get - 127.5) < 1e-9)
    assert(good(1).phash.contains("f0f0f0f0f0f0f0f0")) // matches the still-image hash space
    // unreadable clip -> error row; non-video rows never enter the scan
    assert(rows(8L).head.error.nonEmpty && rows(8L).head.phash.isEmpty)
    assert(!rows.contains(9L))
  }

  test("extractVideoFrames sparse sampling decodes only distinct frame indices") {
    // 10 frames at 10 fps = 1000 ms; everyMs=400 -> ticks 0,400,800 ->
    // frame indices 0,4,8 (and everyMs larger than the clip -> frame 0 only)
    val avi = MediaFixtures.aviRgb24(8, 8, 10,
      Seq.tabulate(10)(i => (_: Int, _: Int) => i * 0x010101 * 20))
    val df = mediaDf(Seq(Row(1L, "video", avi, null)))
    val sparse = Multimodal.extractVideoFrames(spark, df, everyMs = 400L).collect()
    assert(sparse.map(f => (f.frame_index, f.frame_ts_ms)).sorted.toSeq ==
      Seq((0, 0L), (4, 400L), (8, 800L)))
    val one = Multimodal.extractVideoFrames(spark, df, everyMs = 5000L).collect()
    assert(one.map(_.frame_index).toSeq == Seq(0))
  }

  test("repartitionByBytes sizes from plan stats without scanning content") {
    val dir = tmpDir("media")
    mediaDf(Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4), Row(64, 48, null, "png")),
      Row(2L, "video", null, Row(null, null, 2500L, "h264"))))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val parts = Multimodal.repartitionByBytes(df, targetBytes = 1L)
      .rdd.getNumPartitions
    assert(parts >= 1, "stats-driven partition count must be positive")
    // a huge target collapses to one partition
    assert(Multimodal.repartitionByBytes(df, targetBytes = Long.MaxValue)
      .rdd.getNumPartitions == 1)
  }

  test("runner history round-trips through RunState") {
    import graft.exec.Runner
    val dir = tmpDir("hist")
    val rs = new graft.core.RunState(dir)
    Runner.saveHistory(rs, Seq(
      Runner.PipelineResult("a", scala.util.Success(()), 1200L),
      Runner.PipelineResult("b", scala.util.Failure(new RuntimeException), 99L),
      Runner.PipelineResult("c", scala.util.Success(()), 50L)))
    rs.commit()
    val reloaded = Runner.loadHistory(new graft.core.RunState(dir))
    assert(reloaded == Map("a" -> 1200L, "c" -> 50L), "failures must not pollute history")
    val ordered = Runner.orderByHistory(
      Seq[(String, org.apache.spark.sql.SparkSession => Unit)](
        "a" -> (_ => ()), "c" -> (_ => ()), "new" -> (_ => ())), reloaded)
    assert(ordered.map(_._1) == Seq("new", "a", "c"))
  }

  test("phashNearDupPairs: fixture near-dup found at Hamming 1; pigeonhole " +
    "recall boundary; error rows drop") {
    val s = spark; import s.implicits._
    // real decode path over the fixture set (image 6 = image 1 with one
    // 8x8 cell flipped)
    val feats = Multimodal.extractImageFeatures(s,
      MediaFixtures.mediaWithVariants(s)
        .where(org.apache.spark.sql.functions.col("media_type") === "image")).toDF()
    val pairs = Multimodal.phashNearDupPairs(feats, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 6L, 1)), s"got ${pairs.toSeq}")
    // synthetic hash frames pin the band-LSH recall contract:
    // <=3 differing bits always share a band (pigeonhole over 4 bands);
    // 4 bits spread over all 4 bands is the documented miss
    def hashes(rows: (Long, String)*) =
      rows.toSeq.toDF("media_id", "phash")
    val found = Multimodal.phashNearDupPairs(
      hashes(10L -> "0000000000000000", 11L -> "0000000000000007"), 4)
      .collect()
    assert(found.length == 1 && found.head.getInt(2) == 3)
    val missed = Multimodal.phashNearDupPairs(
      hashes(10L -> "0000000000000000", 11L -> "0001000100010001"), 4)
      .collect()
    assert(missed.isEmpty,
      "4 bits in 4 distinct bands must miss — the documented recall edge")
    // a pair past maxHamming sharing a band is filtered by the exact check
    val filtered = Multimodal.phashNearDupPairs(
      hashes(10L -> "0000000000000000", 11L -> "000000000000ffff"), 4)
      .collect()
    assert(filtered.isEmpty, "shared-band candidate past the cutoff must drop")
    // null phash (decode errors) never pairs
    val withErr = Multimodal.phashNearDupPairs(
      Seq((10L, Some("0000000000000000")), (11L, Option.empty[String]))
        .toDF("media_id", "phash"), 64)
      .collect()
    assert(withErr.isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.phashNearDupPairs(feats, maxHamming = 65))
  }

  test("sceneSegments: static shots merge, cuts split, per-media windows " +
    "are independent") {
    val s = spark; import s.implicits._
    // phash hex strings: 0, 1-bit flip (hamming 1 <= 8: same scene),
    // then a 32-bit cut; second media is one static shot
    val frames = Seq(
      (1L, 0, 0L,   "0000000000000000"),
      (1L, 1, 100L, "0000000000000001"),
      (1L, 2, 200L, "f0f0f0f0f0f0f0f0"),
      (1L, 3, 300L, "f0f0f0f0f0f0f0f1"),
      (2L, 0, 0L,   "ffffffff00000000"),
      (2L, 1, 100L, "ffffffff00000000")
    ).toDF("media_id", "frame_index", "frame_ts_ms", "phash")
    val out = Multimodal.sceneSegments(frames, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out == Map(
      (1L, 0L) -> ((0, 1, 2L, 0L, 100L)),
      (1L, 1L) -> ((2, 3, 2L, 200L, 300L)),
      (2L, 0L) -> ((0, 1, 2L, 0L, 100L))), s"got $out")
  }
}
