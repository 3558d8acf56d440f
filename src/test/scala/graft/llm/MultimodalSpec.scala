package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private def media = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4), Row(64, 48, null, "png")),
      Row(2L, "video", null, Row(null, null, 2500L, "h264")),
      Row(3L, "image", Array[Byte](9, 9), Row(8, 8, null, "jpeg")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractImageFeatures: deterministic stub kernel, typed output") {
    val feats = Multimodal.extractImageFeatures(spark, media.where("media_type = 'image'"))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 3L))
    // stub decode is deterministic: same bytes -> same features
    val again = Multimodal.extractImageFeatures(spark, media.where("media_id = 1"))
      .head()
    assert(again == feats(1L))
    assert(feats(1L).mean_luma == (1 + 2 + 3 + 4) / 4.0)
    assert(feats(1L).phash.matches("[0-9a-f]{16}"))
  }

  test("sampleFrames: one row per everyMs tick of video duration, others skipped") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000)
      .select("media_id", "frame_ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 2500ms video sampled at 0,1000,2000
    assert(frames.toSet == Set((2L, 0L), (2L, 1000L), (2L, 2000L)))
  }

  test("repartitionByBytes sizes from plan stats without scanning content") {
    val dir = tmpDir("media")
    media.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val parts = Multimodal.repartitionByBytes(df, targetBytes = 1L)
      .rdd.getNumPartitions
    assert(parts >= 1, "stats-driven partition count must be positive")
    // a huge target collapses to one partition
    assert(Multimodal.repartitionByBytes(df, targetBytes = Long.MaxValue)
      .rdd.getNumPartitions == 1)
  }

  test("extractAudioFeatures: audio rows only, deterministic stub features") {
    val rows = Seq(
      Row(10L, "audio", Array[Byte](4, -4, 8), Row(null, null, 3000L, "opus")),
      Row(11L, "image", Array[Byte](1), Row(2, 2, null, "png")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.extractAudioFeatures(spark, df).collect()
    assert(out.length == 1)
    assert(out.head.media_id == 10L)
    assert(out.head.duration_ms == 3000L)
    assert(out.head.mean_amplitude == (4 + 4 + 8) / 3.0)
    assert(out.head.fingerprint.matches("[0-9a-f]{16}"))
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
}
