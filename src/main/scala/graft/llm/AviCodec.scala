package graft.llm

import java.awt.image.BufferedImage

/** Pure-JDK AVI (RIFF) container parser + frame decoder.
  *
  * Round 3 shipped video frame sampling as a stub on the claim "the JDK has
  * no video codec". That is true for inter-frame codecs (h264/vp9), but two
  * widely-used intra-frame AVI payloads ARE decodable with nothing beyond
  * the JDK:
  *
  *   - uncompressed DIB frames (`00db`, BI_RGB 24/32bpp) — raw bottom-up
  *     BGR rows, fully deterministic byte layout;
  *   - MJPEG frames (`00dc`, biCompression 'MJPG') — each frame is a
  *     standalone JPEG that `javax.imageio` decodes.
  *
  * So the video kernel is now real for those containers, and only genuinely
  * un-decodable codecs flow to the error channel (the engine's convention
  * for content it cannot read, same as a corrupt PNG).
  *
  * Format notes (public AVI/RIFF spec): the file is a `RIFF….AVI ` chunk
  * tree — `LIST hdrl` holds `avih` (main header) and per-stream `LIST strl`
  * (`strh` stream header + `strf` format, a BITMAPINFOHEADER for video);
  * `LIST movi` holds the frame chunks `##db`/`##dc` where `##` is the
  * zero-padded stream ordinal. All integers little-endian; chunks pad to
  * even offsets. Frame rate = strh.dwRate / strh.dwScale.
  *
  * Everything is per-record and allocation-bounded: parsing walks the byte
  * array once collecting frame OFFSETS (no frame copies until a frame is
  * actually sampled), so sampling 1 frame of a 10k-frame clip decodes one
  * frame. Runs inside `mapPartitions` on executors — no driver involvement.
  */
object AviCodec {

  /** Video stream description pulled from `avih`/`strh`/`strf`. `fpsNum`/
    * `fpsDen` are strh dwRate/dwScale (frame duration = den/num seconds). */
  final case class VideoInfo(width: Int, height: Int, bitCount: Int,
                             compression: String, fpsNum: Long, fpsDen: Long)

  /** A parsed clip: stream info + the byte range of each frame chunk in the
    * original array (offset, length), in stream order. */
  final case class AviVideo(info: VideoInfo, bytes: Array[Byte],
                            frames: IndexedSeq[(Int, Int)]) {
    def frameCount: Int = frames.size
    /** Exact per-frame duration in ms as a rational; ts(i) uses integer
      * math so fixture timestamps are reproducible bit-for-bit. */
    def frameTsMs(i: Int): Long = i * 1000L * info.fpsDen / info.fpsNum
    def durationMs: Long = frames.size * 1000L * info.fpsDen / info.fpsNum
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse the container. Returns Left(reason) for anything that is not a
    * well-formed AVI with at least one video stream — the caller routes
    * that to the error channel. Never throws on malformed input. */
  def parse(bytes: Array[Byte]): Either[String, AviVideo] = {
    if (bytes == null || bytes.length < 12) return Left("not an AVI: too short")
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
      return Left("not an AVI: bad RIFF/AVI header")
    val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt

    // Walk the tree once. strh/strf pairs arrive in stream order, so the
    // ordinal of the 'vids' strh is the stream number its frame chunks
    // carry ('00db' for stream 0). Frames may sit directly in 'movi' or
    // inside nested 'LIST rec ' groups — the recursion covers both.
    var streamOrdinal = -1     // ordinal of the stream whose strh we last saw
    var vidsOrdinal = -1       // ordinal of the first video stream
    var width, height, bitCount = 0
    var compression = ""
    var fpsNum = 0L
    var fpsDen = 1L
    var sawStrf = false
    val frames = IndexedSeq.newBuilder[(Int, Int)]

    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(bytes, off)
        val size = u32(bytes, off + 4)
        val dataOff = off + 8
        if (size < 0 || dataOff + size > to) return // truncated: keep what we have
        val dataEnd = (dataOff + size).toInt
        id match {
          case "LIST" if size >= 4 =>
            val listType = fourcc(bytes, dataOff)
            walk(dataOff + 4, dataEnd, inMovi || listType == "movi")
          case "strh" if size >= 40 =>
            streamOrdinal += 1
            if (fourcc(bytes, dataOff) == "vids" && vidsOrdinal < 0) {
              vidsOrdinal = streamOrdinal
              // dwScale at +20, dwRate at +24: rate/scale = frames/sec
              fpsDen = math.max(1L, u32(bytes, dataOff + 20))
              fpsNum = u32(bytes, dataOff + 24)
            }
          case "strf" if streamOrdinal == vidsOrdinal && vidsOrdinal >= 0 &&
              !sawStrf && size >= 40 =>
            // BITMAPINFOHEADER: biWidth +4, biHeight +8, biBitCount +14,
            // biCompression +16 (0 = BI_RGB, else a 4CC like 'MJPG')
            sawStrf = true
            width = u32(bytes, dataOff + 4).toInt
            height = u32(bytes, dataOff + 8).toInt
            bitCount = u16(bytes, dataOff + 14)
            val comp = u32(bytes, dataOff + 16)
            compression = if (comp == 0) "DIB" else fourcc(bytes, dataOff + 16)
          case fid if inMovi && vidsOrdinal >= 0 && fid.startsWith(f"$vidsOrdinal%02d") &&
              (fid.endsWith("db") || fid.endsWith("dc")) =>
            frames += ((dataOff, size.toInt))
          case _ => () // audio chunks, idx1, junk — skipped
        }
        off = dataEnd + (size.toInt & 1) // chunks pad to even boundaries
      }
    }
    walk(12, end, inMovi = false)

    if (vidsOrdinal < 0) Left("AVI has no video stream")
    else if (!sawStrf) Left("AVI video stream has no strf format header")
    else if (fpsNum <= 0) Left("AVI video stream has no frame rate")
    else Right(AviVideo(
      VideoInfo(width, height, bitCount, compression, fpsNum, fpsDen),
      bytes, frames.result()))
  }

  /** Decode frame `i` to a BufferedImage. DIB is decoded by hand (exact,
    * deterministic); MJPG through ImageIO's JPEG reader. Anything else is
    * an error — the honest boundary of a pure-JDK decoder. */
  def decodeFrame(v: AviVideo, i: Int): Either[String, BufferedImage] = {
    if (i < 0 || i >= v.frames.size) return Left(s"frame $i out of range 0..${v.frames.size - 1}")
    val (off, len) = v.frames(i)
    v.info.compression match {
      case "DIB" => decodeDib(v.bytes, off, len, v.info.width, v.info.height, v.info.bitCount)
      case "MJPG" | "mjpg" | "jpeg" =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(v.bytes, off, len))
          if (img == null) Left(s"frame $i: ImageIO cannot decode MJPEG payload")
          else Right(img)
        } catch {
          case e: Exception => Left(s"frame $i: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      case other => Left(s"unsupported video codec '$other' (pure-JDK decode covers DIB and MJPG)")
    }
  }

  /** Uncompressed BI_RGB frame: bottom-up BGR rows, each padded to a
    * 4-byte boundary (24bpp) or packed BGRX (32bpp). */
  private def decodeDib(b: Array[Byte], off: Int, len: Int,
                        w: Int, h: Int, bitCount: Int): Either[String, BufferedImage] = {
    if (w <= 0 || h <= 0) return Left(s"bad DIB dimensions ${w}x$h")
    val bpp = bitCount match {
      case 24 | 32 => bitCount / 8
      case other   => return Left(s"unsupported DIB bit depth $other (24/32 supported)")
    }
    val rowSize = if (bpp == 3) ((w * 3 + 3) / 4) * 4 else w * 4
    if (len < rowSize * h) return Left(s"DIB frame truncated: $len bytes < ${rowSize * h}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val p = row + x * bpp
        val blue = b(p) & 0xff; val green = b(p + 1) & 0xff; val red = b(p + 2) & 0xff
        img.setRGB(x, y, (red << 16) | (green << 8) | blue)
        x += 1
      }
      y += 1
    }
    Right(img)
  }
}
