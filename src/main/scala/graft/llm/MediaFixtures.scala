package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic in-memory media fixtures for the multimodal oracle gate
  * (m15/m16): tiny PNGs with hand-computable features and a constant-tone
  * WAV. PNG is lossless and javax.imageio's PNG codec round-trips pixels
  * exactly on any JVM/OS, and the WAV payload is raw PCM — so the decode
  * kernels' outputs (dims, luma, average-hash, duration, amplitude, PCM
  * md5) are knowable in advance, which is what lets the DuckDB oracle
  * carry the expected features as VALUES literals (the same
  * literal-mirroring trick as the IVF centroids).
  */
object MediaFixtures {

  /** Encode a w×h RGB image as PNG bytes; `rgb(x, y)` gives the packed
    * 0xRRGGBB pixel. */
  def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Constant-tone 16-bit signed little-endian mono PCM WAV: `frames`
    * samples of `value` at `rate` Hz. */
  def wav(frames: Int, rate: Float, value: Short): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      pcm(2 * i) = (value & 0xff).toByte
      pcm(2 * i + 1) = ((value >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The fixture media table: three black/white split images whose 8×8
    * cells pool to exactly 0 or 255 — far from the mean, so the
    * average-hash bits are decided by construction, not lsb rounding (a
    * SOLID color is degenerate: every cell equals the mean up to an lsb
    * and the `> mean` bit flips on accumulation noise) — plus one audio
    * clip with exact power-of-two amplitude (0.5 — no fp error). */
  def media(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // left half black, right half white: bits at cx>=4 -> 0xf0 per row
      (1L, "image", png(16, 16, (x, _) => if (x < 8) 0x000000 else 0xffffff)),
      // top half black, bottom half white: bits at cy>=4 -> high 32 bits
      (2L, "image", png(16, 16, (_, y) => if (y < 8) 0x000000 else 0xffffff)),
      // left quarter white on 32x8: bits at cx<2 -> 0x03 per row
      (3L, "image", png(32, 8, (x, _) => if (x < 8) 0xffffff else 0x000000)),
      (4L, "audio", wav(4000, 8000f, 16384)), // 0.5 s at amplitude 0.5
    ).toDF("media_id", "media_type", "content")
  }
}
