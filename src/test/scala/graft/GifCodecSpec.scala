package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal.Gif

/** Codec laws for the real GIF89a/LZW path (q_multimodal_gif). The key
  * suite property: the ENCODER is validated against the JDK's own
  * ImageIO GIF reader — an independent spec implementation — not just
  * against our decoder, so an encoder/decoder pair that agreed on a
  * wrong bitstream could not pass. The grayscale (i,i,i) palette makes
  * a decoded pixel's red channel its palette index.
  */
class GifCodecSpec extends AnyFunSuite {

  private def imageio(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO
      .read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, Array.tabulate(w * h)(p => img.getRGB(p % w, p / w) & 0xff))
  }

  test("random planes round-trip exactly and ImageIO agrees") {
    val rnd = new scala.util.Random(7)
    for (t <- 1 to 50) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val px = t % 4 match {
        case 0 => Array.fill(w * h)(rnd.nextInt(128))
        case 1 => Array.fill(w * h)(rnd.nextInt(2 + t % 6))
        case 2 => Array.tabulate(w * h)(i => (i / (1 + t % 9)) % 128)
        case _ => Array.fill(w * h)(42)
      }
      val enc = Gif.encode(w, h, px)
      val (dw, dh, dec) = Gif.decode(enc)
      assert(dw === w && dh === h)
      assert(dec.sameElements(px), s"own decode t=$t ${w}x$h")
      val (iw, ih, ipx) = imageio(enc)
      assert(iw === w && ih === h)
      assert(ipx.sameElements(px), s"ImageIO decode t=$t ${w}x$h")
    }
  }

  test("deep dictionary crosses 9->10->11 bit code widths") {
    // 64x64 structured plane: dictionary grows past 512 and 1024
    // entries, forcing two width bumps on both encoder and decoder
    val px = Array.tabulate(64 * 64)(i => ((i * 7) ^ (i / 9)) % 128)
    val enc = Gif.encode(64, 64, px)
    val (_, _, dec) = Gif.decode(enc)
    assert(dec.sameElements(px))
    assert(imageio(enc)._3.sameElements(px), "ImageIO agrees at depth")
  }

  test("K-omega-K: decoder handles code == next (cScSc pattern)") {
    // the classic LZW corner: the decoder receives a code one past its
    // table because the encoder just defined it from its own output
    val px = Array.tabulate(96)(i => if (i % 2 == 0) 1 else 2)
    val enc = Gif.encode(96, 1, px)
    val (_, _, dec) = Gif.decode(enc)
    assert(dec.sameElements(px))
    assert(imageio(enc)._3.sameElements(px))
  }

  test("sub-block framing splits streams over 255 bytes") {
    val rnd = new scala.util.Random(11)
    val px = Array.fill(48 * 48)(rnd.nextInt(128)) // ~2KB of LZW data
    val enc = Gif.encode(48, 48, px)
    // at least one full 255-byte sub-block must appear after the LZW
    // min-code byte (offset: 13 header + 384 palette + 10 descriptor)
    val lzwStart = 13 + 384 + 10 + 1
    assert((enc(lzwStart) & 0xff) === 255, "first sub-block saturated")
    assert(Gif.decode(enc)._3.sameElements(px))
  }

  test("full dictionary triggers Clear-code reset and still round-trips") {
    // 160x160 = 25.6k pixels of seeded noise creates well over 3965
    // dictionary entries, forcing the encoder's table-full Clear +
    // reset path (r12 ADVICE: codes >= 4096 would silently corrupt the
    // bitstream); both our decoder and ImageIO must agree byte-exact
    val rnd = new scala.util.Random(19)
    val px = Array.fill(160 * 160)(rnd.nextInt(128))
    val enc = Gif.encode(160, 160, px)
    val (dw, dh, dec) = Gif.decode(enc)
    assert(dw === 160 && dh === 160)
    assert(dec.sameElements(px), "own decode after dictionary reset")
    assert(imageio(enc)._3.sameElements(px), "ImageIO after reset")
  }

  test("EOI at a power-of-two boundary: final-code add must not desync " +
      "the EOI width (r15 regression, found by the 10x corpus sweep)") {
    // After the encoder's FINAL phrase code the decoder performs one
    // more dictionary add before reading EOI; when that add lands
    // `next` exactly on 256 the decoder widens and reads EOI at 9 bits.
    // Pre-fix the encoder wrote it at 8 — the decoder then overran the
    // data buffer (IndexOutOfBounds) or returned garbage. This exact
    // fixture text (sf0.1 doc 250) lands the phrase count on the
    // boundary; 142 of 50k documents in the r15 10x sweep did.
    val text = "scan row value data window slow filter filter value " +
      "spark agg row part"
    val px = Array.tabulate(256)(i => text.charAt(i % text.length) & 0x7f)
    val enc = Gif.encode(16, 16, px)
    val (dw, dh, dec) = Gif.decode(enc)
    assert(dw === 16 && dh === 16)
    assert(dec.sameElements(px), "own decode at the EOI boundary")
    assert(imageio(enc)._3.sameElements(px), "ImageIO at the EOI boundary")
  }

  test("compression beats raw on runs, stays bounded on noise") {
    val runs = Array.fill(64 * 64)(17)
    val encRuns = Gif.encode(64, 64, runs)
    assert(encRuns.length < 64 * 64 / 4,
      "constant plane compresses at least 4:1")
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(64 * 64)(rnd.nextInt(128))
    val encNoise = Gif.encode(64, 64, noise)
    // worst case stays within the 12-bit-code envelope + framing
    assert(encNoise.length < 64 * 64 * 2)
  }
}
