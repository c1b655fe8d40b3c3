package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable media-decode seam: the Spark-side plumbing (schema contract,
  * binary columns, partition-wise batching, fixed-dim `array<float>`
  * features feeding [[Ann]]) is real and gated; the codec itself is
  * injected. [[ImageIoDecoder]] is a REAL pure-JVM image codec (the
  * JDK's headless `javax.imageio` — PNG/GIF/BMP); [[StubDecoder]] is the
  * format-agnostic fallback for media the JDK cannot decode (video,
  * proprietary codecs) — a deployment with native codec libraries
  * supplies its own implementation without touching the gated pipeline.
  *
  * Implementations MUST be serializable: instances ship to executors
  * inside the `mapPartitions` closures, and any expensive codec context
  * should be opened lazily per partition (inside `features`/`frames` on
  * first use, or via a `@transient lazy val`), not in the constructor.
  */
trait MediaDecoder extends Serializable {

  /** bytes in → fixed-dim float features out (the decode→embed contract). */
  def features(bytes: Array[Byte]): Array[Float]

  /** bytes in → up to `n` (frame index, frame bytes) samples (the video
    * frame-extraction contract). */
  def frames(bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])]
}

/** STUB decoder — deterministic fakes for media with no pure-JVM codec
  * (video containers, proprietary audio): features = L1-normalized
  * 16-bin byte histogram; frames = evenly-spaced byte slices. The
  * signatures and batch shapes are the production contract; for images
  * the real [[ImageIoDecoder]] replaces it.
  */
object StubDecoder extends MediaDecoder {

  val FeatureDim = 16

  override def features(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](FeatureDim)
    if (bytes == null || bytes.isEmpty) return new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) % FeatureDim) += 1; i += 1 }
    // divide in DOUBLE then narrow — the rounding any SQL engine doing
    // `CAST(c AS DOUBLE)/n → REAL` produces, so the oracle can match bitwise
    val n = bytes.length.toDouble
    hist.map(c => (c / n).toFloat)
  }

  override def frames(bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])] =
    if (bytes == null || bytes.isEmpty) Iterator.empty
    else {
      val step = math.max(bytes.length / n, 1)
      (0 until math.min(n, bytes.length)).iterator.map { f =>
        (f, bytes.slice(f * step, math.min(f * step + step, bytes.length)))
      }
    }
}

/** REAL image decoder over the JDK's headless `javax.imageio` codecs
  * (PNG/GIF/BMP — pure JVM, no native libraries, works in any container).
  *
  * Features (dim 9): `[width, height, meanR, meanG, meanB, lumHist0..3]`
  * — the luminance histogram bins `(r+g+b)/3` into four 64-wide bins,
  * each reported as a fraction of the pixel count. Channel sums
  * accumulate in exact integer arithmetic; each mean/fraction is ONE
  * double division then a float narrowing, so a SQL oracle that knows
  * the pixel content can restate every feature bitwise (the
  * `multimodal_decode` gate does exactly that over planted PNGs).
  *
  * Undecodable / empty input → all-zero features, mirroring
  * [[StubDecoder]]'s null-object convention: a corrupt blob in a 100 TB
  * corpus must yield a filterable row, not a task failure.
  */
object ImageIoDecoder extends MediaDecoder {

  val FeatureDim = 9

  override def features(bytes: Array[Byte]): Array[Float] = {
    val img = decode(bytes)
    if (img == null) return new Array[Float](FeatureDim)
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        sr += r; sg += g; sb += b
        // truncation == floor (nonnegative); bin 3 absorbs lum in [192,256)
        hist(math.min(3, ((r + g + b) / 3.0 / 64.0).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    Array(w.toFloat, h.toFloat,
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      (hist(0) / n).toFloat, (hist(1) / n).toFloat,
      (hist(2) / n).toFloat, (hist(3) / n).toFloat)
  }

  /** A still image is its own single frame. Multi-frame video needs
    * native codecs the JDK does not ship — that media stays on
    * [[StubDecoder]] or a deployment-supplied decoder.
    */
  override def frames(bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])] =
    if (n <= 0 || decode(bytes) == null) Iterator.empty else Iterator((0, bytes))

  private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null || bytes.isEmpty) null
    else
      try {
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file cache on executors
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        // NonFatal, not just IOException: imageio readers throw
        // IllegalArgumentException / ArrayIndexOutOfBounds / NegativeArraySize
        // on malformed headers, and those must not kill the task either
      } catch { case scala.util.control.NonFatal(_) => null }
}

/** REAL audio decoder for RIFF/WAVE PCM — a pure-JVM header+sample
  * parser (no codec library at all: PCM bytes ARE the samples), proving
  * the [[MediaDecoder]] seam is format-general, not image-shaped.
  *
  * Features (dim 6): `[channels, sampleRate, bitsPerSample, nSamples,
  * meanAmp, rmsAmp]` over the FIRST channel's 16-bit little-endian
  * samples. Amplitude sums accumulate exactly in long (|s| ≤ 2^15, s² ≤
  * 2^30), so mean and RMS are one double division (+ one sqrt) each —
  * restatable bitwise by a SQL oracle that knows the sample values (the
  * `multimodal_audio` gate plants exactly such WAVs).
  *
  * Non-WAV / non-PCM-16 / truncated input → all-zero features (same
  * null-object convention as the other decoders).
  */
object WavDecoder extends MediaDecoder {

  val FeatureDim = 6

  override def features(bytes: Array[Byte]): Array[Float] = {
    val parsed = parse(bytes)
    if (parsed == null) return new Array[Float](FeatureDim)
    val (channels, sampleRate, bits, dataOff, dataLen) = parsed
    val frameBytes = channels * 2
    val n = dataLen / frameBytes
    if (n == 0) return Array(channels.toFloat, sampleRate.toFloat, bits.toFloat, 0f, 0f, 0f)
    var sum = 0L
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val off = dataOff + i * frameBytes // first channel of each frame
      val s = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toInt
      sum += s
      sumSq += s.toLong * s
      i += 1
    }
    val nd = n.toDouble
    Array(channels.toFloat, sampleRate.toFloat, bits.toFloat, n.toFloat,
      (sum / nd).toFloat, math.sqrt(sumSq / nd).toFloat)
  }

  /** Audio frames = up to `n` contiguous equal sample windows, each
    * re-wrapped as a standalone valid WAV (header + its slice of PCM
    * data) — the shape a real segmenter hands to downstream per-clip
    * featurization.
    */
  override def frames(bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])] = {
    val parsed = parse(bytes)
    if (n <= 0 || parsed == null) return Iterator.empty
    val (channels, sampleRate, _, dataOff, dataLen) = parsed
    val frameBytes = channels * 2
    val total = dataLen / frameBytes
    if (total == 0) return Iterator.empty
    val per = math.max(total / n, 1)
    (0 until math.min(n, total)).iterator.map { f =>
      val from = f * per
      val cnt = math.min(per, total - from)
      val pcm = java.util.Arrays.copyOfRange(bytes,
        dataOff + from * frameBytes, dataOff + (from + cnt) * frameBytes)
      (f, wrapPcm(pcm, channels, sampleRate))
    }
  }

  /** (channels, sampleRate, bits, dataOffset, dataLength), or null when
    * not a PCM-16 RIFF/WAVE blob. Chunk-walks the container (chunks are
    * 2-byte aligned), so non-canonical headers with extra chunks parse
    * too.
    */
  private def parse(bytes: Array[Byte]): (Int, Int, Int, Int, Int) =
    if (bytes == null || bytes.length < 44 ||
        !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) null
    else {
      var channels = 0; var sampleRate = 0; var bits = 0; var fmt = 0
      var dataOff = -1; var dataLen = 0
      var p = 12
      while (p + 8 <= bytes.length) {
        val size = le32(bytes, p + 4)
        if (size < 0 || p + 8 + size > bytes.length) return null
        if (tag(bytes, p, "fmt ") && size >= 16) {
          fmt = le16(bytes, p + 8)
          channels = le16(bytes, p + 10)
          sampleRate = le32(bytes, p + 12)
          bits = le16(bytes, p + 22)
        } else if (tag(bytes, p, "data")) {
          dataOff = p + 8; dataLen = size
        }
        p += 8 + size + (size & 1)
      }
      if (fmt == 1 && bits == 16 && channels > 0 && dataOff >= 0)
        (channels, sampleRate, bits, dataOff, dataLen)
      else null
    }

  /** Canonical 44-byte PCM-16 header around raw little-endian samples. */
  def wrapPcm(pcm: Array[Byte], channels: Int, sampleRate: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out.array()
  }

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => (b(off + i) & 0xFF) == t.charAt(i))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise through a
  * [[MediaDecoder]].
  */
object Multimodal {

  /** media metadata struct: (format, width, height, duration_ms). */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", metaSchema)))

  /** Feature dimension of the default [[StubDecoder]]. */
  val FeatureDim: Int = StubDecoder.FeatureDim

  /** Feature extraction over a binary column, batched per partition.
    * Implemented with mapPartitions on the typed Dataset so per-partition
    * setup (a real codec context) happens once per task, not per row.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => (id, decoder.features(bytes)) }
      }
    out.toDF(idCol, "features")
      .withColumn("features", col("features").cast("array<float>"))
  }

  /** Frame sampling: one row per (id, frame index, frame bytes) — the
    * explode shape a real frame sampler produces.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int,
                   decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decoder.frames(bytes, n).map { case (f, b) => (id, f, b) }
      }
    out.toDF(idCol, "frame_idx", "frame")
  }

  /** "Resize" STUB: truncate/pad the binary to a target size — the shape
    * of a thumbnailing step (bytes in, smaller bytes out). */
  def resizeStub(bin: Column, targetBytes: Int): Column = {
    // substring on binary is 1-based and native; padding skipped (real
    // resize never pads).
    substring(bin, 1, targetBytes)
  }
}
