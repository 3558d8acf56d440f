package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private val vSplit: (Int, Int) => Int = (x, _) => if (x < 8) 0x000000 else 0xffffff
  private val hSplit: (Int, Int) => Int = (_, y) => if (y < 8) 0x000000 else 0xffffff

  test("parse + DIB decode round-trips exact pixels, dims, rate, frame count") {
    val avi = MediaFixtures.aviRgb24(16, 16, 10, Seq(vSplit, hSplit))
    val v = AviCodec.parse(avi).toOption.get
    assert(v.info.width == 16 && v.info.height == 16)
    assert(v.info.compression == "DIB" && v.info.bitCount == 24)
    assert(v.info.fpsNum == 10 && v.info.fpsDen == 1)
    assert(v.frameCount == 2 && v.durationMs == 200 && v.frameTsMs(1) == 100)
    val f0 = AviCodec.decodeFrame(v, 0).toOption.get
    // exact pixels through the bottom-up padded-row layout
    assert((f0.getRGB(0, 0) & 0xffffff) == 0x000000)
    assert((f0.getRGB(15, 0) & 0xffffff) == 0xffffff)
    assert((f0.getRGB(7, 15) & 0xffffff) == 0x000000)
    assert((f0.getRGB(8, 15) & 0xffffff) == 0xffffff)
    val f1 = AviCodec.decodeFrame(v, 1).toOption.get
    assert((f1.getRGB(0, 0) & 0xffffff) == 0x000000)
    assert((f1.getRGB(0, 15) & 0xffffff) == 0xffffff)
  }

  test("row padding decodes correctly for widths not divisible by 4") {
    // 5 px * 3 B = 15 -> padded to 16: an off-by-one in rowSize skews rows
    val avi = MediaFixtures.aviRgb24(5, 3, 10,
      Seq((x, y) => if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff))
    val v = AviCodec.parse(avi).toOption.get
    val img = AviCodec.decodeFrame(v, 0).toOption.get
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xffffff) ==
        (if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff), s"pixel ($x,$y)")
  }

  test("MJPEG frames decode via ImageIO: dims exact, luma approximate") {
    val avi = MediaFixtures.aviMjpeg(16, 16, 25, Seq(vSplit))
    val v = AviCodec.parse(avi).toOption.get
    assert(v.info.compression == "MJPG")
    assert(v.info.fpsNum == 25 && v.frameCount == 1)
    val img = AviCodec.decodeFrame(v, 0).toOption.get
    assert(img.getWidth == 16 && img.getHeight == 16)
    val (luma, _) = Multimodal.imageStats(img)
    assert(math.abs(luma - 127.5) < 10.0) // JPEG is lossy; half-white stays near 127.5
  }

  test("malformed inputs return Left, never throw") {
    assert(AviCodec.parse(null).isLeft)
    assert(AviCodec.parse(Array[Byte](1, 2, 3)).isLeft)
    assert(AviCodec.parse("RIFFxxxxWAVE".getBytes("ISO-8859-1")).isLeft)
    // truncated mid-movi: header parses, truncated frame chunk is dropped
    val full = MediaFixtures.aviRgb24(16, 16, 10, Seq(vSplit, hSplit))
    val cut = AviCodec.parse(full.take(full.length - 100))
    cut match {
      case Right(v) => assert(v.frameCount <= 2) // graceful: fewer frames, no crash
      case Left(_)  => ()                        // or a clean parse error
    }
    // out-of-range frame index
    val v = AviCodec.parse(full).toOption.get
    assert(AviCodec.decodeFrame(v, 99).isLeft)
  }

  test("unsupported codec is an error at decode, not a crash at parse") {
    // DIB fixture with the compression dword overwritten to 'h264'
    val avi = MediaFixtures.aviRgb24(8, 8, 10, Seq((_, _) => 0x808080))
    // find the strf payload: biCompression sits 16 bytes into it
    val idx = {
      val pat = "strf".getBytes("ISO-8859-1")
      (0 until avi.length - 4).find(i => pat.indices.forall(j => avi(i + j) == pat(j))).get
    }
    val patched = avi.clone()
    "h264".getBytes("ISO-8859-1").copyToArray(patched, idx + 8 + 16)
    val v = AviCodec.parse(patched).toOption.get
    assert(v.info.compression == "h264")
    val err = AviCodec.decodeFrame(v, 0).swap.toOption.get
    assert(err.contains("h264"))
  }
}
