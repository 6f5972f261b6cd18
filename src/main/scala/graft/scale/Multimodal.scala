package graft.scale

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * BINARY columns with typed metadata structs.
  *
  * Image metadata decode, resize AND feature extraction are REAL:
  * PNG/JPEG/GIF/BMP headers are parsed with the JDK's `javax.imageio`
  * (`ImageReader.getWidth/getHeight` reads the header only — no pixel
  * decode), [[resize]] fully decodes, nearest-neighbor-rescales, and
  * PNG-re-encodes through the same JDK codecs, and [[extractFeatures]]
  * computes classical pixel statistics (channel means, luma, aspect)
  * from a full decode via [[imageStats]]. Non-image payloads (and any
  * byte stream the codec rejects) fall back to the deterministic
  * ==STUB== arithmetic (length/prefix derived), which is where a
  * libjpeg-turbo/ffmpeg native call (or a learned vision encoder for
  * features) would plug in for formats the JDK lacks (webp, audio,
  * video). Frame sampling stays a documented stub — no JDK video codec. */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType), StructField("n_bytes", LongType)))

  case class MediaMeta(width: Int, height: Int, format: String, n_bytes: Long)

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of a
    * text column — in production this is the raw image/audio blob read
    * from object storage). */
  def attachBinary(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", to_binary(col(srcCol), lit("utf-8")))

  /** Magic-byte sniff for the container formats the JDK can read.
    * PNG/JPEG magics start with 0x89/0xFF — impossible as a UTF-8 first
    * byte, so text payloads can never take those branches. The GIF and
    * BMP magics ARE printable ("GIF87a", "BM"), and the JDK readers
    * accept them with barely any further validation (BMP dims are read
    * from fixed offsets unchecked), so those branches verify additional
    * header structure: the exact 6-byte GIF version, and a known DIB
    * header size + positive bounded dims for BMP. A text document
    * starting with "BM" therefore still falls through to the stub. */
  private def sniffFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("png")
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF)
      Some("jpeg")
    else if (b.length >= 14 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
             (b(4) == '7' || b(4) == '9') && b(5) == 'a' && gifTrailerNearEnd(b))
      Some("gif")
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && {
      // DIB header size at offset 14 must be one of the defined variants
      // — ASCII text at that offset decodes to values >= 0x20202020, so
      // this alone rejects text payloads. (The bfSize field is NOT
      // checked: common encoders write 0 or stale values there.)
      val dib = (b(14) & 0xFFL) | (b(15) & 0xFFL) << 8 | (b(16) & 0xFFL) << 16 | (b(17) & 0xFFL) << 24
      dibHeaderSizes.contains(dib)
    })
      Some("bmp")
    else None

  private val dibHeaderSizes = Set(12L, 40L, 52L, 56L, 64L, 108L, 124L)

  /** A document could legitimately START with the printable "GIF89a"
    * magic, so GIF additionally requires the 0x3B trailer — allowing up
    * to 16 trailing padding bytes (NUL/whitespace appended by text-mode
    * transit), which English text never satisfies (it ends in letters).
    * Residual tradeoff: a real GIF with >16 bytes of appended junk takes
    * the stub path. */
  private def gifTrailerNearEnd(b: Array[Byte]): Boolean = {
    var i = b.length - 1
    // k padding bytes leave the trailer at index length-1-k; permitting
    // k <= 16 means scanning down to index length-17
    val floor = math.max(b.length - 17, 6)
    while (i >= floor && (b(i) == 0x00 || b(i) == 0x0A || b(i) == 0x0D || b(i) == 0x20))
      i -= 1
    i >= floor && (b(i) & 0xFF) == 0x3B
  }

  /** Header-only image decode via `javax.imageio` — returns None when the
    * bytes are not a parsable image (caller falls back to the stub). */
  def decodeImageMeta(bytes: Array[Byte]): Option[MediaMeta] =
    sniffFormat(bytes).flatMap { fmt =>
      scala.util.Try {
        ImageIO.setUseCache(false) // no executor-local temp files
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) throw new IllegalArgumentException("no reader")
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0); val h = r.getHeight(0)
            // belt-and-braces for readers that parse headers without
            // validation: absurd dims mean the sniff was fooled
            require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20), "implausible dims")
            MediaMeta(w, h, fmt, bytes.length.toLong)
          } finally r.dispose()
        } finally iis.close()
      }.toOption
    }

  /** ==STUB== fallback for non-image bytes: width/height/format derived
    * deterministically from byte length. */
  private def stubMeta(n: Long): MediaMeta = {
    val format = (n % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    MediaMeta((32 + n % 64).toInt, (32 + (n * 7) % 64).toInt, format, n)
  }

  /** Decode media metadata as a columnar UDF on the binary column — no
    * RDD hop, so upstream/downstream stages stay in whole-stage codegen
    * and only the binary payload (not the whole row) crosses into Scala.
    * Real `javax.imageio` header decode for PNG/JPEG/GIF/BMP; stub
    * arithmetic for everything else. */
  def decodeMeta(df: DataFrame): DataFrame = {
    val decode = udf { (bytes: Array[Byte]) =>
      if (bytes == null) stubMeta(0L)
      else decodeImageMeta(bytes).getOrElse(stubMeta(bytes.length.toLong))
    }
    df.withColumn("meta", decode(col("media")))
  }

  /** Deterministic PNG fixture encoder (real codec, both directions): a
    * w×h RGB image with an LCG pixel fill, encoded by `ImageIO.write`.
    * Used by the decode-path oracle query and specs. */
  def encodePng(w: Int, h: Int, seed: Long = 0L, shift: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = seed * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val p = ((s >>> 40) & 0xFFFFFF).toInt
        // optional clamped brightness shift: the near-identical-variant
        // generator for perceptual-hash fixtures (dHash is invariant
        // except where a channel clamps at 255)
        val r = math.min((p >> 16) + shift, 255)
        val g = math.min(((p >> 8) & 0xFF) + shift, 255)
        val b = math.min((p & 0xFF) + shift, 255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL per-image pixel statistics: full `ImageIO` decode → integer
    * channel sums over all pixels (exact — PNG is lossless and the sums
    * are longs, so this is hash-checkable against an engine that can
    * reproduce the pixel stream). Returns None for non-image bytes. */
  def imageStats(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    sniffFormat(bytes).flatMap { _ =>
      scala.util.Try {
        ImageIO.setUseCache(false)
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        require(img != null, "undecodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y) & 0xFFFFFF
            sr += p >> 16; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            x += 1
          }
          y += 1
        }
        (w, h, sr, sg, sb)
      }.toOption
    }

  /** Feature extraction: REAL classical pixel statistics for decodable
    * images — [w, h, mean R, mean G, mean B, mean luma (Rec.601),
    * aspect, n_pixels] from a full decode via [[imageStats]] — padded or
    * truncated to the k-float contract downstream Similarity operators
    * consume. This is where a learned vision encoder would plug in at
    * scale (the batch shape and output schema are the encoder contract);
    * the classical stats are themselves real, useful features (dominant
    * color, brightness, aspect bucketing). Non-image bytes keep the
    * ==STUB== rolling-hash embedding, the slot for a native
    * webp/audio/video codec. */
  def extractFeatures(df: DataFrame, k: Int = 8): DataFrame = {
    val extract = udf { (bytes: Array[Byte]) =>
      val real = if (bytes == null) None else imageStats(bytes)
      real match {
        case Some((w, h, sr, sg, sb)) =>
          val n = w.toLong * h
          val (mr, mg, mb) = (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          val full = Array(w.toFloat, h.toFloat, mr.toFloat, mg.toFloat, mb.toFloat,
                           (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat,
                           (w.toDouble / h).toFloat, n.toFloat)
          if (k <= full.length) full.take(k) else full ++ Array.fill(k - full.length)(0.0f)
        case None =>
          if (bytes == null) Array.fill(k)(0.0f)
          else {
            var h = 1125899906842597L
            val out = new Array[Float](k)
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1
              out(i % k) = ((h >>> 11) % 1000) / 1000.0f }
            out
          }
      }
    }
    df.withColumn("features", extract(col("media")))
  }

  /** REAL image resize, zero new dependencies: full `ImageIO` decode →
    * nearest-neighbor rescale with pure integer index arithmetic
    * (srcX = x·srcW / w — bit-deterministic, no interpolation-kernel or
    * render-pipeline variance) → PNG re-encode (lossless, so the pixel
    * spec can assert exact values). Returns None when the bytes are not
    * a decodable image. */
  /** REAL perceptual hash (dHash, Krawetz): full `ImageIO` decode →
    * integer nearest-neighbor 9×8 luma grid (the SAME sx = ⌊x·w/9⌋,
    * sy = ⌊y·h/8⌋ mapping as [[resizeImage]]) → 64 horizontal-gradient
    * bits, bit(y,x) = 1 iff luma(x+1,y) > luma(x,y). Luma is the
    * integer Rec.601 form 299R+587G+114B (×1000, never divided — exact
    * in Int), so the whole hash is integer arithmetic over decoded
    * pixels: hash-checkable against an engine that replays the pixel
    * stream, like [[imageStats]].
    *
    * Gradient bits are invariant under uniform brightness shifts (adding
    * a constant to every channel preserves all comparisons, absent
    * clipping) — the property that makes dHash a NEAR-dup key where a
    * cryptographic hash is an exact-dup key; Hamming distance on these
    * 64 bits is the image-side analogue of SimHash on text, and the
    * `StreamDedup`/`d4_simhash` block-keyed matching machinery applies
    * verbatim to its output. None for non-image bytes. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    sniffFormat(bytes).flatMap { _ =>
      scala.util.Try {
        ImageIO.setUseCache(false)
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        require(img != null, "undecodable image")
        val w = img.getWidth; val h = img.getHeight
        var hash = 0L
        var bit = 0
        var y = 0
        while (y < 8) {
          val sy = (y.toLong * h / 8).toInt
          val lum = new Array[Int](9)
          var x = 0
          while (x < 9) {
            val p = img.getRGB((x.toLong * w / 9).toInt, sy) & 0xFFFFFF
            lum(x) = 299 * (p >> 16) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)
            x += 1
          }
          x = 0
          while (x < 8) {
            if (lum(x + 1) > lum(x)) hash |= 1L << bit
            bit += 1
            x += 1
          }
          y += 1
        }
        hash
      }.toOption
    }

  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    sniffFormat(bytes).flatMap { _ =>
      scala.util.Try {
        ImageIO.setUseCache(false)
        val src = ImageIO.read(new ByteArrayInputStream(bytes))
        require(src != null, "undecodable image")
        val sw = src.getWidth; val sh = src.getHeight
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val sy = (y.toLong * sh / h).toInt
          var x = 0
          while (x < w) {
            out.setRGB(x, y, src.getRGB((x.toLong * sw / w).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }.toOption
    }

  /** Resize to w×h: REAL pixels for decodable images (nearest-neighbor +
    * PNG re-encode via [[resizeImage]] — the output is a valid PNG whose
    * header decodes to exactly (w, h)); the ==STUB== byte arithmetic
    * (truncate / cycle-pad to w·h bytes, format preserved) only for
    * non-image payloads, where the native codec would plug in. Requires
    * `meta` (run [[decodeMeta]] first). */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val target = w * h
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      resizeImage(if (bytes == null) Array.empty[Byte] else bytes, w, h)
        .getOrElse {
          val out = new Array[Byte](target)
          if (bytes != null && bytes.length > 0) {
            var i = 0
            while (i < target) { out(i) = bytes(i % bytes.length); i += 1 }
          }
          out
        }
    }
    df.withColumn("media", resizeUdf(col("media")))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        // the real path re-encodes as PNG; recognize it from the OUTPUT
        // bytes (stub payloads keep their sniffed-or-stub format)
        when(hex(substring(col("media"), 1, 4)) === "89504E47", lit("png"))
          .otherwise(col("meta.format")).as("format"),
        length(col("media")).cast("long").as("n_bytes")))
  }

  /** ==STUB FRAME SAMPLE== — "video" frame sampling as byte slices at a
    * fixed stride; the real path seeks keyframes. Generator shape
    * (posexplode → one row per frame) is the real contract. */
  def sampleFrames(df: DataFrame, stride: Int = 256, maxFrames: Int = 4): DataFrame =
    df.select(col("*"), posexplode(expr(
      s"transform(sequence(0, least(int(length(media) / $stride), ${maxFrames - 1})), " +
      s"i -> substring(media, i * $stride + 1, $stride))")))
      .withColumnRenamed("pos", "frame_idx").withColumnRenamed("col", "frame_bytes")

  // ---- audio ---------------------------------------------------------------

  /** REAL RIFF/WAVE header parse: ("RIFF", size, "WAVE") then the fmt
    * chunk's (audioFormat, channels, sampleRate, bitsPerSample) and the
    * data chunk's byte length, walking chunks with little-endian sizes
    * exactly as the container specifies. Returns None for anything that
    * is not a structurally valid WAV (text payloads never are). */
  def decodeWavMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u16(i: Int) = (bytes(i) & 0xFF) | (bytes(i + 1) & 0xFF) << 8
    def u32(i: Int) = (bytes(i) & 0xFFL) | (bytes(i + 1) & 0xFFL) << 8 |
      (bytes(i + 2) & 0xFFL) << 16 | (bytes(i + 3) & 0xFFL) << 24
    def tag(i: Int, s: String) =
      bytes.length >= i + 4 && (0 until 4).forall(j => bytes(i + j) == s(j))
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) None
    else {
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var dataLen = -1
      var ok = true
      while (ok && pos + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
        // sz is untrusted: a size whose low bits encode -8 would make the
        // walk non-advancing (an executor-hanging infinite loop), and a
        // huge one overflows Int. Walk in Long and require strict advance.
        val sz = u32(pos + 4) // 0 .. 2^32-1, never negative as a Long
        val next = pos.toLong + 8L + sz + (sz & 1L)
        if (next <= pos || next > Int.MaxValue) ok = false
        else {
          if (tag(pos, "fmt ") && pos + 8 + 16 <= bytes.length)
            fmt = Some((u16(pos + 8), u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22)))
          else if (tag(pos, "data"))
            dataLen = math.min(sz, (bytes.length - pos - 8).toLong).toInt
          pos = next.toInt // chunks are word-aligned
        }
      }
      fmt.collect { case (af, ch, sr, bps) if ok && dataLen >= 0 =>
        (af, ch, sr, bps, dataLen)
      }
    }
  }

  /** REAL 16-bit PCM sample extraction from a WAV payload (first
    * `maxSamples` interleaved samples, little-endian signed). None when
    * the container/format is not 16-bit PCM. */
  def wavSamples(bytes: Array[Byte], maxSamples: Int): Option[Array[Int]] =
    decodeWavMeta(bytes).collect { case (1, _, _, 16, dataLen) =>
      // locate the data chunk again with the SAME guarded walk as
      // decodeWavMeta (bounds + strict advance — never trust sizes)
      var pos = 12
      while (pos + 8 <= bytes.length &&
             !(bytes(pos) == 'd' && bytes(pos + 1) == 'a' &&
               bytes(pos + 2) == 't' && bytes(pos + 3) == 'a')) {
        val sz = (bytes(pos + 4) & 0xFFL) | (bytes(pos + 5) & 0xFFL) << 8 |
          (bytes(pos + 6) & 0xFFL) << 16 | (bytes(pos + 7) & 0xFFL) << 24
        val next = pos.toLong + 8L + sz + (sz & 1L)
        pos = if (next <= pos || next > Int.MaxValue) bytes.length else next.toInt
      }
      if (pos + 8 > bytes.length) Array.empty[Int]
      else {
        val start = pos + 8
        val n = math.max(0,
          math.min(maxSamples.toLong,
            math.min(dataLen / 2L, (bytes.length - start) / 2L)).toInt)
        Array.tabulate(n) { i =>
          ((bytes(start + 2 * i) & 0xFF) |
            (bytes(start + 2 * i + 1) << 8)).toShort.toInt
        }
      }
    }

  /** Audio frame features over a ==STUB==-synthesized PCM stream: the
    * sample decode is the deterministic text-derived fake
    * s_i = ((ascii(char_i)·131 + i·17) mod 4096) − 2048 (the WAV-real
    * twin is [[wavSamples]] — swap it in where payloads are actual
    * audio), but the FRAMING MATH IS REAL and exactly what a feature
    * extractor computes: frames of `frame` samples at stride `hop`,
    * per-frame RMS energy √(Σs²/frame) and zero-crossing count
    * |{i : s_i·s_{i+1} < 0}| — integer Σs² and crossing counts fold
    * exactly, the one sqrt is grid-rounded.
    *
    * Emits (id, frame_idx, n_samples, rms, zcr) — one row per frame,
    * pure map-side scalar expressions (sequence/transform/aggregate
    * HOFs), zero shuffle, codegen-friendly: the 100-TB shape for
    * per-object media feature extraction. */
  def audioFramesFromText(df: DataFrame, textCol: String, idCol: String,
                          frame: Int = 32, hop: Int = 16,
                          maxSamples: Int = 256): DataFrame = {
    require(frame >= 2 && hop >= 1, s"need frame >= 2, hop >= 1; got ($frame, $hop)")
    val samples =
      s"""transform(sequence(0, least(length($textCol), $maxSamples) - 1),
            i -> (CAST(ascii(substr($textCol, CAST(i + 1 AS INT), 1)) AS BIGINT)
                  * 131 + i * 17) % 4096 - 2048)"""
    val frames =
      s"""transform(sequence(0, (size(s) - $frame) div $hop),
            f -> named_struct(
              'frame_idx', CAST(f AS BIGINT),
              'sumsq', aggregate(slice(s, CAST(f * $hop + 1 AS INT), $frame),
                CAST(0 AS BIGINT), (a, x) -> a + x * x),
              'zcr', aggregate(sequence(1, ${frame - 1}), CAST(0 AS BIGINT),
                (a, i) -> a + (CASE WHEN
                  element_at(slice(s, CAST(f * $hop + 1 AS INT), $frame), CAST(i AS INT))
                  * element_at(slice(s, CAST(f * $hop + 1 AS INT), $frame), CAST(i + 1 AS INT))
                  < 0 THEN 1 ELSE 0 END))))"""
    df.select(col(idCol), expr(samples).as("s"))
      .withColumn("n_samples", size(col("s")).cast("long"))
      .filter(col("n_samples") >= frame.toLong)
      .select(col(idCol), col("n_samples"), explode(expr(frames)).as("fr"))
      .select(col(idCol), col("fr.frame_idx").as("frame_idx"),
        col("n_samples"),
        graft.queries.Det.dround(
          sqrt(col("fr.sumsq").cast("double") / frame), 6).as("rms"),
        col("fr.zcr").as("zcr"))
  }
}
