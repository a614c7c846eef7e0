package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal.Bmp

/** Pure-bytes BMP codec laws (no Spark): round-trip identity across
  * stride-padding widths, header layout, and loud truncation failures.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def plane(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 131 + seed * 17) % 256).toByte)

  test("round-trip identity for every stride-padding class") {
    // w*3 mod 4 = 0,1,2,3 ← widths 4,5,6,7 cover all four pad sizes
    for (w <- 4 to 7; h <- Seq(1, 3, 4)) {
      val px = plane(w, h, w + h)
      val (dw, dh, rgb) = Bmp.decode(Bmp.encode(w, h, px))
      assert(dw === w && dh === h)
      assert(rgb.toSeq === px.toSeq, s"plane mismatch at w=$w h=$h")
    }
  }

  test("header layout: magic, offset, dims, bpp, stride-padded size") {
    val img = Bmp.encode(7, 4, plane(7, 4, 1))
    assert(img(0) === 'B'.toByte && img(1) === 'M'.toByte)
    // file size (LE u32 at 2) = 54 + h * stride(7) = 54 + 4*24
    assert(img.length === 150)
    assert((img(2) & 0xff) === 150 && img(3) === 0)
    assert((img(10) & 0xff) === 54, "pixel offset")
    assert((img(18) & 0xff) === 7 && (img(22) & 0xff) === 4)
    assert((img(28) & 0xff) === 24, "bpp")
    // padding bytes at each row tail must be zero (stride 24, row 21)
    for (row <- 0 until 4; p <- 21 until 24)
      assert(img(54 + row * 24 + p) === 0)
  }

  test("decode rejects truncation, bad magic, unsupported bpp") {
    val img = Bmp.encode(5, 2, plane(5, 2, 9))
    intercept[IllegalArgumentException](
      Bmp.decode(img.take(img.length - 1)))
    intercept[IllegalArgumentException](Bmp.decode(img.take(40)))
    val badMagic = img.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    val bad16 = img.clone(); bad16(28) = 16.toByte
    intercept[IllegalArgumentException](Bmp.decode(bad16))
  }

  test("bottom-up row order and BGR swap actually happen on the wire") {
    // 1×2 image: top pixel red, bottom pixel blue
    val px = Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val img = Bmp.encode(1, 2, px)
    // first stored row is the BOTTOM pixel (blue) in BGR order
    assert((img(54) & 0xff) === 255 && img(55) === 0 && img(56) === 0)
    // second stored row is the TOP pixel (red): B=0,G=0,R=255
    assert(img(58) === 0 && (img(60) & 0xff) === 255)
  }
}
