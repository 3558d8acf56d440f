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

  /** Byte-level AVI writer (RIFF → hdrl(avih, strl(strh, strf)) → movi).
    * Little-endian throughout, chunks padded to even sizes — the layout
    * [[AviCodec]] parses. Deterministic: same frames → same bytes. */
  private def aviContainer(w: Int, h: Int, fps: Int, bitCount: Int,
                           compression: Int, handler: String, chunkId: String,
                           frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(payload.length) ++ payload ++ pad
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(listType) ++ payload)

    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) /* scale */ ++ le32(fps) /* rate */ ++ le32(0) ++
      le32(frames.size) ++ le32(maxFrame) ++ le32(0xffffffffL) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bitCount) ++
      le32(compression) ++ le32(maxFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk(chunkId, f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    bos.write(fcc("RIFF")); bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Uncompressed 24bpp AVI: each frame a bottom-up BGR DIB with 4-byte row
    * padding. Fully deterministic (no codec in the loop) — the video
    * fixture the m17 oracle hand-computes against. */
  def aviRgb24(w: Int, h: Int, fps: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dibs = frames.map { rgb =>
      val buf = new Array[Byte](rowSize * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val p = rgb(x, y)
          buf(row + x * 3) = (p & 0xff).toByte
          buf(row + x * 3 + 1) = ((p >> 8) & 0xff).toByte
          buf(row + x * 3 + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      buf
    }
    aviContainer(w, h, fps, 24, 0, "DIB ", "00db", dibs)
  }

  /** MJPEG AVI: each frame a standalone JPEG (ImageIO-encoded). Lossy, so
    * tests assert dims/approximate luma rather than exact hashes. */
  def aviMjpeg(w: Int, h: Int, fps: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val jpegs = frames.map { rgb =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", fb)
      fb.toByteArray
    }
    // 'MJPG' biCompression four-cc, little-endian = bytes M,J,P,G
    val mjpg = ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    aviContainer(w, h, fps, 24, mjpg, "MJPG", "00dc", jpegs)
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
      // 4-frame uncompressed AVI at 10 fps (100 ms/frame): black, vertical
      // split, horizontal split, white — same cell-exact construction as
      // the stills, so every frame's luma/hash is hand-computable (all-equal
      // cells give phash 0: no cell exceeds the mean exactly)
      (5L, "video", aviRgb24(16, 16, 10, Seq(
        (_, _) => 0x000000,
        (x, _) => if (x < 8) 0x000000 else 0xffffff,
        (_, y) => if (y < 8) 0x000000 else 0xffffff,
        (_, _) => 0xffffff))),
    ).toDF("media_id", "media_type", "content")
  }

  /** [[media]] plus a NEAR-DUPLICATE of image 1 — the same vertical split
    * with exactly one 8×8 cell (cx=0, cy=0 — pixels x<2, y<2) flipped
    * white. 33 of 64 cells white → mean ≈ 131.48, so whites stay above
    * and blacks below: phash = image 1's with bit 0 set
    * (f0f0f0f0f0f0f0f1), Hamming distance EXACTLY 1 — the perceptual
    * near-dup pair the m30 oracle hand-derives. */
  def mediaWithVariants(spark: SparkSession): DataFrame = {
    import spark.implicits._
    media(spark).unionByName(Seq(
      (6L, "image",
        png(16, 16, (x, y) => if (x >= 8 || (x < 2 && y < 2)) 0xffffff else 0x000000))
    ).toDF("media_id", "media_type", "content"))
  }
}
