package graft.engine

/** Baseline sequential JPEG (ITU T.81) encoder + decoder, pure JVM bytes —
  * the third REAL media codec beside Ppm and Wav (Multimodal.scala).
  *
  * Scope: 8-bit precision, 4:4:4 sampling (one 8x8 block per component per
  * MCU), grayscale (1 component) or YCbCr color (3 components), standard
  * Annex K Huffman tables, no restart markers, dimensions must be block
  * multiples. Quantization uses the Annex K matrices with the DC step
  * overridden to 1: a constant-color block is then DC-only and round-trips
  * EXACTLY (FDCT scale error ~1e-13 is absorbed by integer rounding), which
  * is what lets q_multimodal_jpeg keep a byte-level DuckDB oracle even
  * though JPEG is lossy in general. Non-constant blocks take the normal
  * lossy path (PSNR-tested in MigrationPipelineSpec).
  *
  * All arithmetic is fixed-order IEEE double + integer — deterministic
  * across JVMs and platforms.
  */
object Jpeg {
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance quant matrix (natural order), DC overridden to 1. */
  private val QLuma: Array[Int] = {
    val q = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    q(0) = 1; q
  }

  /** Annex K chrominance quant matrix, DC overridden to 1. */
  private val QChroma: Array[Int] = {
    val q = Array(
      17, 18, 24, 47, 99, 99, 99, 99,
      18, 21, 26, 66, 99, 99, 99, 99,
      24, 26, 56, 99, 99, 99, 99, 99,
      47, 66, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99)
    q(0) = 1; q
  }

  // Annex K Huffman table specs: (counts per code length 1..16, symbols).
  private val DcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes: symbol -> (code, length). */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          code(vals(k)) = c; len(vals(k)) = l; c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  /** Decode side: (length, code) -> symbol. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    // minCode/maxCode/valPtr per length, T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values = vals
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = c
          c += bits(l - 1); k += bits(l - 1)
          maxCode(l) = c - 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  private val dcLumaE = new HuffEnc(DcLumaBits, DcLumaVals)
  private val acLumaE = new HuffEnc(AcLumaBits, AcLumaVals)
  private val dcChromaE = new HuffEnc(DcChromaBits, DcChromaVals)
  private val acChromaE = new HuffEnc(AcChromaBits, AcChromaVals)

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        out(v * 8 + u) = 0.25 * C(u) * C(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += C(u) * C(v) * coef(v * 8 + u) * CosT(x)(u) * CosT(y)(v)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  private final class BitWriter(sink: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, length: Int): Unit = {
      var i = length - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          sink.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) sink.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0x7f, 8 - nbits) } // pad with 1s
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated entropy data")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated after 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"unexpected marker 0xFF$m%02X in scan")
          pos += 1
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeSym(t: HuffDec): Int = {
      var c = bit()
      var l = 1
      while (c > t.maxCode(l)) {
        c = (c << 1) | bit()
        l += 1
        require(l <= 16, "invalid Huffman code")
      }
      t.values(t.valPtr(l) + c - t.minCode(l))
    }
  }

  private def magnitude(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  private def encodeBlock(bw: BitWriter, px: Array[Double], quant: Array[Int],
      dcT: HuffEnc, acT: HuffEnc, prevDc: Int): Int = {
    val f = fdct(px)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      q(i) = Math.round(f(Zigzag(i)) / quant(Zigzag(i))).toInt
      i += 1
    }
    // DC difference
    val diff = q(0) - prevDc
    val s = magnitude(diff)
    bw.put(dcT.code(s), dcT.len(s))
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    // AC run-lengths
    var run = 0
    var k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) { bw.put(acT.code(0xf0), acT.len(0xf0)); run -= 16 }
        val sz = magnitude(q(k))
        val sym = (run << 4) | sz
        bw.put(acT.code(sym), acT.len(sym))
        bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acT.code(0x00), acT.len(0x00)) // EOB
    q(0)
  }

  private def decodeBlock(br: BitReader, quant: Array[Int], dcT: HuffDec,
      acT: HuffDec, prevDc: Int): (Array[Double], Int) = {
    val q = new Array[Int](64)
    val s = br.decodeSym(dcT)
    val diff = if (s == 0) 0 else extend(br.bits(s), s)
    q(0) = prevDc + diff
    var k = 1
    while (k < 64) {
      val sym = br.decodeSym(acT)
      if (sym == 0x00) k = 64 // EOB
      else if (sym == 0xf0) k += 16 // ZRL
      else {
        k += (sym >> 4)
        require(k < 64, "AC index overflow")
        q(k) = extend(br.bits(sym & 0xf), sym & 0xf)
        k += 1
      }
    }
    val coef = new Array[Double](64)
    var i = 0
    while (i < 64) {
      coef(Zigzag(i)) = q(i).toDouble * quant(Zigzag(i))
      i += 1
    }
    (idct(coef), q(0))
  }

  private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def word(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ word(payload.length + 2) ++ payload

  private def dqtSeg(id: Int, q: Array[Int]): Array[Byte] =
    segment(0xdb, Array(id.toByte) ++
      Array.tabulate(64)(i => q(Zigzag(i)).toByte))

  private def dhtSeg(tcth: Int, bits: Array[Int],
      vals: Array[Int]): Array[Byte] =
    segment(0xc4, Array(tcth.toByte) ++ bits.map(_.toByte) ++
      vals.map(_.toByte))

  /** Encode an 8-bit grayscale plane (w, h multiples of 8). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dimensions must be block multiples")
    require(gray.length == w * h, "plane must be w*h bytes")
    encodeImpl(w, h, Array(gray), isColor = false)
  }

  /** Encode interleaved RGB (w, h multiples of 8) via JFIF YCbCr. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dimensions must be block multiples")
    require(rgb.length == w * h * 3, "plane must be w*h*3 bytes")
    val n = w * h
    val yp = new Array[Byte](n)
    val cb = new Array[Byte](n)
    val cr = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      yp(i) = clamp8(Math.round(0.299 * r + 0.587 * g + 0.114 * b))
      cb(i) = clamp8(Math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
      cr(i) = clamp8(Math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
      i += 1
    }
    encodeImpl(w, h, Array(yp, cb, cr), isColor = true)
  }

  private def clamp8(v: Long): Byte =
    math.max(0L, math.min(255L, v)).toByte

  private def encodeImpl(w: Int, h: Int, planes: Array[Array[Byte]],
      isColor: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // JFIF APP0
    out.write(segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0) ++
      word(1) ++ word(1) ++ Array[Byte](0, 0)))
    out.write(dqtSeg(0x00, QLuma))
    if (isColor) out.write(dqtSeg(0x01, QChroma))
    val nc = planes.length
    val sof = Array[Byte](8) ++ word(h) ++ word(w) ++ Array(nc.toByte) ++
      (0 until nc).flatMap(c =>
        Array((c + 1).toByte, 0x11.toByte,
          (if (c == 0) 0 else 1).toByte)).toArray
    out.write(segment(0xc0, sof)) // SOF0 baseline
    out.write(dhtSeg(0x00, DcLumaBits, DcLumaVals))
    out.write(dhtSeg(0x10, AcLumaBits, AcLumaVals))
    if (isColor) {
      out.write(dhtSeg(0x01, DcChromaBits, DcChromaVals))
      out.write(dhtSeg(0x11, AcChromaBits, AcChromaVals))
    }
    val sos = Array(nc.toByte) ++
      (0 until nc).flatMap(c => Array((c + 1).toByte,
        (if (c == 0) 0x00 else 0x11).toByte)).toArray ++
      Array[Byte](0, 63, 0)
    out.write(segment(0xda, sos))
    val bw = new BitWriter(out)
    val prevDc = new Array[Int](nc)
    val block = new Array[Double](64)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var c = 0
        while (c < nc) {
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              block(y * 8 + x) =
                (planes(c)((by * 8 + y) * w + bx * 8 + x) & 0xff) - 128.0
              x += 1
            }
            y += 1
          }
          val quant = if (c == 0) QLuma else QChroma
          val dcT = if (c == 0) dcLumaE else dcChromaE
          val acT = if (c == 0) acLumaE else acChromaE
          prevDc(c) = encodeBlock(bw, block, quant, dcT, acT, prevDc(c))
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Demux a concatenated-JPEG (MJPEG-style) stream into frames by SOI/EOI
    * framing. Byte stuffing guarantees 0xFFD9 cannot occur inside entropy
    * data; none of the baseline header segments this codec emits contain
    * the sequence either, so marker scanning is exact for self-produced
    * streams (a general demuxer would walk segment lengths).
    */
  def splitStream(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    var start = -1
    while (i + 1 < bytes.length) {
      val m = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      if (m == 0xffd8 && start < 0) { start = i; i += 2 }
      else if (m == 0xffd9 && start >= 0) {
        frames += java.util.Arrays.copyOfRange(bytes, start, i + 2)
        start = -1; i += 2
      } else i += 1
    }
    require(start < 0, "unterminated JPEG frame in stream")
    frames.toSeq
  }

  /** Decode a baseline 4:4:4 JPEG produced by this encoder (or compatible).
    * Returns (w, h, nComponents, pixels) — pixels interleaved RGB for 3
    * components, the raw plane for grayscale.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    var w = 0
    var h = 0
    var nc = 0
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDec](4)
    val acTables = new Array[HuffDec](4)
    val compQuant = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 4 <= bytes.length, "truncated JPEG header")
      require((bytes(pos) & 0xff) == 0xff, "marker expected")
      val marker = bytes(pos + 1) & 0xff
      val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      val body = pos + 4
      require(body + len - 2 <= bytes.length, "truncated segment")
      marker match {
        case 0xdb => // DQT (possibly multiple tables)
          var p = body
          while (p < body + len - 2) {
            val id = bytes(p) & 0x0f
            require((bytes(p) & 0xf0) == 0, "only 8-bit quant supported")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            quantTables(id) = q
            p += 65
          }
        case 0xc0 => // SOF0
          h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
          w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
          nc = bytes(body + 5) & 0xff
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          var c = 0
          while (c < nc) {
            require((bytes(body + 7 + 3 * c) & 0xff) == 0x11,
              "only 4:4:4 sampling supported")
            compQuant(c) = bytes(body + 8 + 3 * c) & 0xff
            c += 1
          }
        case 0xc4 => // DHT (possibly multiple tables)
          var p = body
          while (p < body + len - 2) {
            val tc = (bytes(p) >> 4) & 0x0f
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffDec(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + nv
          }
        case 0xda => // SOS
          val n = bytes(body) & 0xff
          require(n == nc, "scan component count mismatch")
          var c = 0
          while (c < nc) {
            compDc(c) = (bytes(body + 2 + 2 * c) >> 4) & 0x0f
            compAc(c) = bytes(body + 2 + 2 * c) & 0x0f
            c += 1
          }
          scanStart = body + len - 2
        case m if m >= 0xe0 && m <= 0xef => // APPn: skip
        case 0xfe => // COM: skip
        case 0xc2 =>
          throw new IllegalArgumentException(
            "progressive JPEG not supported (baseline only)")
        case m =>
          throw new IllegalArgumentException(f"unsupported marker 0xFF$m%02X")
      }
      pos = body + len - 2
    }
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      "decoder requires block-multiple dimensions")
    val br = new BitReader(bytes, scanStart)
    val planes = Array.fill(nc)(new Array[Byte](w * h))
    val prevDc = new Array[Int](nc)
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        var c = 0
        while (c < nc) {
          val (px, dc) = decodeBlock(br, quantTables(compQuant(c)),
            dcTables(compDc(c)), acTables(compAc(c)), prevDc(c))
          prevDc(c) = dc
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c)((by * 8 + y) * w + bx * 8 + x) =
                clamp8(Math.round(px(y * 8 + x) + 128.0))
              x += 1
            }
            y += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    if (nc == 1) (w, h, 1, planes(0))
    else {
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val y = planes(0)(i) & 0xff
        val cb = (planes(1)(i) & 0xff) - 128
        val cr = (planes(2)(i) & 0xff) - 128
        rgb(3 * i) = clamp8(Math.round(y + 1.402 * cr))
        rgb(3 * i + 1) = clamp8(Math.round(y - 0.344136 * cb - 0.714136 * cr))
        rgb(3 * i + 2) = clamp8(Math.round(y + 1.772 * cb))
        i += 1
      }
      (w, h, 3, rgb)
    }
  }
}
