package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Jpeg

/** Byte-level laws for the baseline JPEG codec (no Spark session needed). */
class JpegCodecSpec extends AnyFunSuite {
  private val W = 16
  private val H = 16

  private def constantBlocks(vals: Array[Int]): Array[Byte] = {
    val g = new Array[Byte](W * H)
    for (y <- 0 until H; x <- 0 until W)
      g(y * W + x) = vals((y / 8) * 2 + (x / 8)).toByte
    g
  }

  test("constant-color blocks round-trip exactly (DC-only, quant step 1)") {
    val gray = constantBlocks(Array(7, 99, 127, 42))
    val enc = Jpeg.encodeGray(W, H, gray)
    val (w, h, nc, out) = Jpeg.decode(enc)
    assert(w == W && h == H && nc == 1)
    assert(java.util.Arrays.equals(out, gray))
  }

  test("stream structure: SOI/EOI framing and parseable headers") {
    val enc = Jpeg.encodeGray(W, H, constantBlocks(Array(0, 64, 128, 255)))
    assert((enc(0) & 0xff) == 0xff && (enc(1) & 0xff) == 0xd8)
    assert((enc(enc.length - 2) & 0xff) == 0xff &&
      (enc(enc.length - 1) & 0xff) == 0xd9)
  }

  test("gradient RGB survives the lossy path above 25 dB PSNR") {
    // smooth ramp (no wrap-around edges — JPEG is built for continuous
    // content; the discontinuous case is covered by the determinism test)
    val rgb = new Array[Byte](W * H * 3)
    for (y <- 0 until H; x <- 0 until W; c <- 0 until 3)
      rgb((y * W + x) * 3 + c) = math.min(x * 8 + y * 4 + c * 10, 255).toByte
    val enc = Jpeg.encodeRgb(W, H, rgb)
    val (w, h, nc, out) = Jpeg.decode(enc)
    assert(w == W && h == H && nc == 3)
    var se = 0.0
    rgb.indices.foreach { i =>
      val d = (rgb(i) & 0xff) - (out(i) & 0xff); se += d * d
    }
    val psnr = 10 * math.log10(255.0 * 255.0 / (se / rgb.length))
    assert(psnr > 25, f"psnr $psnr%.1f dB")
  }

  test("encode is deterministic") {
    val rgb = Array.tabulate(W * H * 3)(i => (i * 37 % 256).toByte)
    assert(java.util.Arrays.equals(
      Jpeg.encodeRgb(W, H, rgb), Jpeg.encodeRgb(W, H, rgb)))
  }

  test("truncated or corrupt payloads fail loudly") {
    val enc = Jpeg.encodeGray(W, H, constantBlocks(Array(1, 2, 3, 4)))
    intercept[IllegalArgumentException] {
      Jpeg.decode(enc.take(enc.length / 2))
    }
    intercept[IllegalArgumentException] {
      Jpeg.decode(Array[Byte](1, 2, 3, 4))
    }
  }
}
