package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 Multimodal-column plumbing (SURVEY.md north star): media payloads
  * are opaque `binary` columns with a typed metadata struct; the
  * decode/feature-extract stage is a per-partition batch operator.
  *
  * The actual codec is STUBBED with a deterministic byte-hash "decoder"
  * (no image/audio libraries in this environment — see the builder brief);
  * everything Spark-side is real: binary schema, partition-parallel
  * `mapPartitions` with an explicit row encoder, fixed-width feature
  * output, and metadata that survives the round-trip.
  *
  * Scale posture: decode runs once per partition batch, never on the
  * driver; feature vectors are fixed-width arrays so downstream similarity
  * operators (Vectors.scala) apply unchanged.
  */
object Multimodal {

  val FeatureDim = 8

  /** Minimal REAL P6 PPM codec — header parse + pixel plane, pure bytes,
    * no media libraries needed. This makes the decode stage genuine for
    * the simplest raster format; see also [[Png]] (real, zlib-based) and
    * [[Wav]] (real, PCM16). JPEG/compressed audio remain behind the
    * clearly-labeled stubs below.
    */
  object Ppm {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, "pixel plane must be w*h*3 bytes")
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    }

    /** Parses "P6\n<w> <h>\n<maxval>\n" + pixel plane. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      var i = 0
      def token(): String = {
        while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n')) i += 1
        require(i < bytes.length, "truncated ppm header")
        val start = i
        while (i < bytes.length && bytes(i) != ' ' && bytes(i) != '\n') i += 1
        new String(bytes, start, i - start, "US-ASCII")
      }
      val magic = token()
      require(magic == "P6", s"not a P6 ppm: $magic")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval == 255, s"unsupported maxval $maxval")
      i += 1 // single whitespace after maxval
      // copyOfRange zero-pads past the end, which would silently decode a
      // truncated payload as black pixels — fail loudly instead.
      require(bytes.length >= i + w * h * 3, "truncated pixel plane")
      val rgb = java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)
      (w, h, rgb)
    }

    /** Nearest-neighbor resize of the decoded plane; returns a valid PPM. */
    def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
        tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val sx = x * w / tw
          var c = 0
          while (c < 3) {
            out((y * tw + x) * 3 + c) = rgb((sy * w + sx) * 3 + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      encode(tw, th, out)
    }

    /** Per-channel means over the pixel plane (real image statistics). */
    def channelMeans(rgb: Array[Byte]): (Double, Double, Double) = {
      val acc = new Array[Long](3)
      var i = 0
      while (i < rgb.length) { acc(i % 3) += rgb(i) & 0xff; i += 1 }
      val n = rgb.length / 3.0
      (acc(0) / n, acc(1) / n, acc(2) / n)
    }
  }

  /** STUB decoder: stands in for image/audio decode. Deterministic pure
    * function of the payload bytes so results are reproducible and
    * oracle-friendly.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    var h = 1125899906842597L // FNV-ish rolling state
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      acc(i % FeatureDim) += (payload(i) & 0xff)
      i += 1
    }
    val out = new Array[Double](FeatureDim)
    var j = 0
    while (j < FeatureDim) {
      out(j) = (acc(j) % 1000) / 1000.0
      j += 1
    }
    out
  }

  /** Minimal REAL WAV (RIFF/PCM16 mono) codec — like [[Ppm]], pure bytes,
    * no libraries: 44-byte canonical header + little-endian 16-bit
    * samples. Makes audio decode genuine for the one format expressible
    * without codecs; compressed audio stays stubbed.
    */
  object Wav {
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val header =
        "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(1) ++ le16(1) ++                     // PCM, mono
        le32(sampleRate) ++ le32(sampleRate * 2) ++
        le16(2) ++ le16(16) ++                    // block align, bits
        "data".getBytes("US-ASCII") ++ le32(dataLen)
      val out = new Array[Byte](44 + dataLen)
      header.copyToArray(out)
      var i = 0
      while (i < samples.length) {
        out(44 + 2 * i) = (samples(i) & 0xff).toByte
        out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Returns (sampleRate, samples); validates the canonical header. */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE", "not RIFF/WAVE")
      require(ascii(12, 4) == "fmt ", "missing fmt chunk")
      def u16(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def u32(off: Int) = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      require(u16(20) == 1 && u16(22) == 1 && u16(34) == 16,
        "only PCM16 mono supported")
      require(ascii(36, 4) == "data", "missing data chunk")
      val n = u32(40) / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((bytes(44 + 2 * i) & 0xff) |
          (bytes(44 + 2 * i + 1) << 8)).toShort
        i += 1
      }
      (u32(24), samples)
    }

    /** Root-mean-square and peak amplitude — real signal statistics. */
    def stats(samples: Array[Short]): (Double, Int) = {
      var sum = 0.0
      var peak = 0
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toInt
        sum += v.toDouble * v
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      (math.sqrt(sum / samples.length), peak)
    }
  }

  /** Minimal REAL PNG codec for 8-bit truecolor RGB — the third pure-byte
    * format (after [[Ppm]] and [[Wav]]) implementable without media
    * libraries: zlib is in the JDK (`java.util.zip.Deflater`/`Inflater`),
    * leaving chunk framing (CRC-32 verified), IHDR parse, and the five
    * scanline filters (None/Sub/Up/Average/Paeth) to implement per the PNG
    * spec (RFC 2083). The encoder cycles filters Sub→Up→Average→Paeth
    * across rows so the decoder's unfilter path is genuinely exercised.
    * JPEG and compressed audio stay behind the labeled stubs.
    */
  object Png {
    private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    private def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

    private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t)
      crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }

    /** PNG filter-type-4 predictor (nearest of left/up/upper-left). */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def predict(f: Int, left: Int, up: Int, ul: Int): Int = f match {
      case 0 => 0
      case 1 => left
      case 2 => up
      case 3 => (left + up) / 2
      case 4 => paeth(left, up, ul)
      case other => throw new IllegalArgumentException(s"bad filter $other")
    }

    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, "pixel plane must be w*h*3 bytes")
      val ihdr = be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, 0) // bit depth 8, color type 2 (RGB)
      val stride = w * 3
      val raw = new Array[Byte](h * (stride + 1))
      var y = 0
      while (y < h) {
        val f = y % 4 + 1 // cycle Sub/Up/Average/Paeth
        raw(y * (stride + 1)) = f.toByte
        var x = 0
        while (x < stride) {
          val cur = rgb(y * stride + x) & 0xff
          val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
          val up = if (y >= 1) rgb((y - 1) * stride + x) & 0xff else 0
          val ul =
            if (x >= 3 && y >= 1) rgb((y - 1) * stride + x - 3) & 0xff else 0
          raw(y * (stride + 1) + 1 + x) =
            ((cur - predict(f, left, up, ul)) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw)
      deflater.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
      val buf = new Array[Byte](4096)
      while (!deflater.finished())
        out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Full decode: signature + CRC-verified chunk walk + zlib inflate +
      * per-row unfilter. Ancillary chunks are skipped, as the spec allows.
      */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= 8 && Sig.indices.forall(k => bytes(k) == Sig(k)),
        "not a png signature")
      def u32(off: Int): Int =
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      var i = 8
      var w = 0
      var h = 0
      var sawIhdr = false
      var sawIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawIend) {
        require(i + 12 <= bytes.length, "truncated chunk header")
        val len = u32(i)
        require(len >= 0 && i + 12 + len <= bytes.length, "truncated chunk")
        val tpe = new String(bytes, i + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, i + 4, 4 + len)
        require(crc.getValue.toInt == u32(i + 8 + len), s"bad CRC in $tpe")
        tpe match {
          case "IHDR" =>
            w = u32(i + 8); h = u32(i + 12)
            require(bytes(i + 16) == 8 && bytes(i + 17) == 2,
              "only 8-bit truecolor RGB supported")
            require(bytes(i + 18) == 0 && bytes(i + 19) == 0 &&
              bytes(i + 20) == 0, "unsupported compression/filter/interlace")
            sawIhdr = true
          case "IDAT" => idat.write(bytes, i + 8, len)
          case "IEND" => sawIend = true
          case _ => () // ancillary chunk, skip
        }
        i += 12 + len
      }
      require(sawIhdr, "missing IHDR")
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val stride = w * 3
      val raw = new Array[Byte](h * (stride + 1))
      var off = 0
      while (!inflater.finished() && off < raw.length) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || inflater.finished(), "truncated IDAT stream")
        off += n
      }
      inflater.end()
      require(off == raw.length, "decompressed size mismatch")
      val rgb = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        var x = 0
        while (x < stride) {
          val v = raw(y * (stride + 1) + 1 + x) & 0xff
          val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
          val up = if (y >= 1) rgb((y - 1) * stride + x) & 0xff else 0
          val ul =
            if (x >= 3 && y >= 1) rgb((y - 1) * stride + x - 3) & 0xff else 0
          rgb(y * stride + x) = ((v + predict(f, left, up, ul)) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      (w, h, rgb)
    }
  }

  /** Media-shaped frame from the documents fixture: payload bytes (UTF-8 of
    * the text, standing in for encoded media) + typed metadata struct.
    */
  def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("text/plain").as("mime_type"),
        length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB resize: stands in for image resize — deterministic byte
    * subsampling down to at most `target` bytes.
    */
  def fakeResize(payload: Array[Byte], target: Int): Array[Byte] = {
    if (payload.length <= target) payload
    else {
      val step = math.ceil(payload.length.toDouble / target).toInt
      payload.indices.collect { case i if i % step == 0 => payload(i) }.toArray
    }
  }

  /** STUB frame sampling: stands in for video frame extraction — split the
    * payload into `n` equal byte ranges (remainder dropped), one "frame"
    * per range.
    */
  def frameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val len = payload.length / n
    if (len == 0) Seq.empty
    else (0 until n).map(k => payload.slice(k * len, (k + 1) * len))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Oracle-checked metadata path: binary length + md5 digest.
    "q_multimodal_meta" -> { (s, d) =>
      mediaFrame(s, d).select(
        col("media_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("meta.mime_type").as("mime_type"),
        col("meta.origin").as("origin"))
        .orderBy(col("media_id"))
    },

    // Partition-parallel decode/feature-extract (stubbed codec); rows-only
    // check + ScalaTest determinism assertions.
    "q_multimodal_features" -> { (s, d) =>
      val frame = mediaFrame(s, d)
      val outSchema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("n_bytes", IntegerType),
        StructField("features", ArrayType(DoubleType, containsNull = false))))
      val decoded = frame.select(col("media_id"), col("payload"))
        .mapPartitions { rows =>
          rows.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            Row(r.getLong(0), payload.length, fakeDecodeFeatures(payload).toSeq)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
      decoded
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f1"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6)
            .as("f_sum"))
        .orderBy(col("media_id"))
    },

    // Frame sampling (stubbed video decode): one row per sampled frame,
    // digest per frame. Byte ranges are plain substrings of the (ASCII)
    // payload, so the frame digests are oracle-checkable in SQL.
    "q_multimodal_frames" -> { (s, d) =>
      val frame = mediaFrame(s, d)
      val outSchema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("frame", BinaryType)))
      frame.select(col("media_id"), col("payload"))
        .mapPartitions { rows =>
          rows.flatMap { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            frameSample(payload, 4).zipWithIndex.map { case (f, i) =>
              Row(r.getLong(0), i, f)
            }
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"),
          md5(col("frame")).as("frame_digest"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // REAL image path: deterministic 8x4 PPM images are synthesized from
    // the document characters, then the genuine codec round-trips them —
    // encode -> header-parse decode -> channel statistics -> real
    // nearest-neighbor resize -> decode again. Fully oracle-checked (the
    // oracle recomputes the channel means from the same characters).
    "q_multimodal_ppm" -> { (s, d) =>
      val frame = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("w", IntegerType),
        StructField("h", IntegerType),
        StructField("r_mean", DoubleType),
        StructField("g_mean", DoubleType),
        StructField("b_mean", DoubleType),
        StructField("rw", IntegerType),
        StructField("rh", IntegerType)))
      frame.mapPartitions { rows =>
        rows.map { r =>
          val text = r.getString(1)
          // 7-bit mask on BOTH engines (oracle: ascii(...) % 128): charAt is
          // a UTF-16 unit, so & 0xff would silently diverge from the
          // oracle's code-point ascii() on any non-ASCII input.
          val px = Array.tabulate(8 * 4 * 3)(i =>
            (text.charAt(i % text.length) & 0x7f).toByte)
          val img = Ppm.encode(8, 4, px)
          val (w, h, rgb) = Ppm.decode(img)
          val (rm, gm, bm) = Ppm.channelMeans(rgb)
          val (rw, rh, _) = Ppm.decode(Ppm.resizeNearest(w, h, rgb, 4, 2))
          Row(r.getLong(0), w, h, rm, gm, bm, rw, rh)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
        .select(col("doc_id"), col("w"), col("h"),
          round(col("r_mean") + lit(5e-10), 4).as("r_mean"),
          round(col("g_mean") + lit(5e-10), 4).as("g_mean"),
          round(col("b_mean") + lit(5e-10), 4).as("b_mean"),
          col("rw"), col("rh"))
        .orderBy(col("doc_id"))
    },

    // REAL audio path (like q_multimodal_ppm for images): deterministic
    // PCM16 waveforms are synthesized from document characters, encoded to
    // canonical RIFF/WAV, then the genuine codec parses the header,
    // extracts samples, and computes real signal statistics (RMS, peak).
    // Fully oracle-checked.
    "q_multimodal_wav" -> { (s, d) =>
      val frame = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sample_rate", IntegerType),
        StructField("n_samples", IntegerType),
        StructField("rms", DoubleType),
        StructField("peak", IntegerType)))
      frame.mapPartitions { rows =>
        rows.map { r =>
          val text = r.getString(1)
          // 7-bit mask (see q_multimodal_ppm): (0x7f - 64) * 256 = 16128
          // stays within Short range, so the .toShort never wraps.
          val samples = Array.tabulate(64)(i =>
            (((text.charAt(i % text.length) & 0x7f) - 64) * 256).toShort)
          val (rate, back) = Wav.decode(Wav.encode(8000, samples))
          val (rms, peak) = Wav.stats(back)
          Row(r.getLong(0), rate, back.length, rms, peak)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          round(col("rms") + lit(5e-10), 4).as("rms"), col("peak"))
        .orderBy(col("doc_id"))
    },

    // REAL PNG path: the same synthesized 8x4 pixel plane as
    // q_multimodal_ppm, but round-tripped through the genuine PNG codec —
    // zlib deflate/inflate, CRC-verified chunk framing, and
    // Sub/Up/Average/Paeth scanline unfiltering — then channel statistics
    // and a real resize. png_bytes (the compressed size) is emitted
    // rows-only (deflate output isn't SQL-expressible); the
    // oracle-checked columns recompute the channel means from the same
    // characters.
    "q_multimodal_png" -> { (s, d) =>
      val frame = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val outSchema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("w", IntegerType),
        StructField("h", IntegerType),
        StructField("r_mean", DoubleType),
        StructField("g_mean", DoubleType),
        StructField("b_mean", DoubleType),
        StructField("rw", IntegerType),
        StructField("rh", IntegerType)))
      frame.mapPartitions { rows =>
        rows.map { r =>
          val text = r.getString(1)
          val px = Array.tabulate(8 * 4 * 3)(i =>
            (text.charAt(i % text.length) & 0x7f).toByte)
          val img = Png.encode(8, 4, px)
          val (w, h, rgb) = Png.decode(img)
          val (rm, gm, bm) = Ppm.channelMeans(rgb)
          val (rw, rh, _) = Png.decode(
            Png.encode(4, 2, Ppm.decode(
              Ppm.resizeNearest(w, h, rgb, 4, 2))._3))
          Row(r.getLong(0), w, h, rm, gm, bm, rw, rh)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
        .select(col("doc_id"), col("w"), col("h"),
          round(col("r_mean") + lit(5e-10), 4).as("r_mean"),
          round(col("g_mean") + lit(5e-10), 4).as("g_mean"),
          round(col("b_mean") + lit(5e-10), 4).as("b_mean"),
          col("rw"), col("rh"))
        .orderBy(col("doc_id"))
    },

    // Resize (stubbed image decode): deterministic byte subsample; no
    // oracle (subsample stride logic), determinism asserted in ScalaTest.
    "q_multimodal_resize" -> { (s, d) =>
      val frame = mediaFrame(s, d)
      val outSchema = StructType(Seq(
        StructField("media_id", LongType),
        StructField("orig_bytes", IntegerType),
        StructField("resized", BinaryType)))
      frame.select(col("media_id"), col("payload"))
        .mapPartitions { rows =>
          rows.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            Row(r.getLong(0), payload.length, fakeResize(payload, 64))
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
        .select(col("media_id"), col("orig_bytes"),
          octet_length(col("resized")).as("resized_bytes"),
          md5(col("resized")).as("resized_digest"))
        .orderBy(col("media_id"))
    },

  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_ppm" ->
      """WITH px AS (
        | SELECT doc_id, i,
        |  ascii(substring(text, (i % length(text)) + 1, 1)) % 128 AS v
        | FROM documents, LATERAL unnest(generate_series(0, 95)) u(i))
        | SELECT doc_id, 8 AS w, 4 AS h,
        |  round(avg(v) FILTER (i % 3 = 0) + 5e-10, 4) AS r_mean,
        |  round(avg(v) FILTER (i % 3 = 1) + 5e-10, 4) AS g_mean,
        |  round(avg(v) FILTER (i % 3 = 2) + 5e-10, 4) AS b_mean,
        |  4 AS rw, 2 AS rh
        | FROM px GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),

    // Pixel-identical to the ppm oracle: the png codec must round-trip the
    // same synthesized plane bit-for-bit.
    "q_multimodal_png" ->
      """WITH px AS (
        | SELECT doc_id, i,
        |  ascii(substring(text, (i % length(text)) + 1, 1)) % 128 AS v
        | FROM documents, LATERAL unnest(generate_series(0, 95)) u(i))
        | SELECT doc_id, 8 AS w, 4 AS h,
        |  round(avg(v) FILTER (i % 3 = 0) + 5e-10, 4) AS r_mean,
        |  round(avg(v) FILTER (i % 3 = 1) + 5e-10, 4) AS g_mean,
        |  round(avg(v) FILTER (i % 3 = 2) + 5e-10, 4) AS b_mean,
        |  4 AS rw, 2 AS rh
        | FROM px GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_multimodal_wav" ->
      """WITH sm AS (
        | SELECT doc_id,
        |  (ascii(substring(text, (i % length(text)) + 1, 1)) % 128 - 64) * 256 AS v
        | FROM documents, LATERAL unnest(generate_series(0, 63)) u(i))
        | SELECT doc_id, 8000 AS sample_rate, 64 AS n_samples,
        |  round(sqrt(avg(CAST(v AS DOUBLE) * v)) + 5e-10, 4) AS rms,
        |  CAST(max(abs(v)) AS INT) AS peak
        | FROM sm GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replaceAll("\n", " "),

    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id, k AS frame_idx,
        | length(text) // 4 AS frame_bytes,
        | md5(substring(text, k * (length(text) // 4) + 1,
        |   length(text) // 4)) AS frame_digest
        | FROM documents, LATERAL unnest(generate_series(0, 3)) u(k)
        | WHERE length(text) // 4 > 0
        | ORDER BY media_id, frame_idx"""
        .stripMargin.replaceAll("\n", " "),
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | md5(text) AS digest,
        | 'text/plain' AS mime_type,
        | source AS origin
        | FROM documents ORDER BY media_id"""
        .stripMargin.replaceAll("\n", " ")
  )
}
