package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extract / frame-sample run as partition-local batch transforms.
  *
  * IMAGE decoding is REAL: [[imageDims]] parses PNG/JPEG/GIF/BMP
  * headers and [[ImageHistogramDecoder]] extracts pixel-derived
  * grayscale-histogram features, both through the JDK's
  * dependency-free `javax.imageio` (no codec libraries needed).
  * AUDIO decoding is REAL too: [[WavFeatureDecoder]] parses WAV/AIFF/AU
  * through `javax.sound.sampled` and emits PCM statistics (q133 gates
  * it against an independent analytic recomputation). Only VIDEO
  * remains stubbed ([[StubDecoder]] — deterministic md5-derived
  * floats; no JDK video codec exists); swapping in a true decoder is
  * replacing one [[Decoder]] instance. The Spark-side contract —
  * schema, batch iteration shape, partitioning behavior — is real and
  * tested throughout.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); the binary column should be written to parquet with a
  * generous `spark.sql.files.maxPartitionBytes` *down*-adjustment, since
  * a 128 MB split of 5 MB media blobs is only ~25 rows — partition count,
  * not row count, is the parallelism lever for media tables.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType, nullable = false)))

  /** Feature schema produced by decoders. */
  val featureSchema: StructType = StructType(Seq(
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Batch decoder contract: one call per partition, iterator-to-iterator
    * (never materializes a partition), mirroring the Pandas-UDF /
    * mapInPandas batch shape.
    */
  trait Decoder extends Serializable {
    /** bytes → fixed-width feature vector. */
    def decode(payload: Array[Byte]): Array[Float]
    def dim: Int
  }

  /** STUB decoder — deterministic fake: features are md5-derived floats.
    * Still the right tool for AUDIO/VIDEO payloads (no JDK codec
    * exists; a real deployment binds JNI/javacpp and nothing else in
    * the pipeline changes) and as the [[ImageHistogramDecoder]]
    * fallback for undecodable bytes. Its md5 formulation is also what
    * makes the q51 gate SQL-expressible end to end.
    */
  final class StubDecoder(val dim: Int = 8) extends Decoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff).toFloat) / 255.0f)
    }
  }

  /** REAL image feature decoder — pixel-derived, no stub: a `dim`-bin
    * grayscale histogram over the decoded image, normalized to
    * fractions summing to ~1. Luma is integer ITU-R BT.601
    * (`(299·R + 587·G + 114·B) / 1000`) and binning is exact integer
    * arithmetic (`lum · dim / 256`), so features are bit-deterministic
    * across JVMs. Decoding runs through the same dependency-free
    * `javax.imageio` path as [[decodeDims]] — PNG/JPEG/GIF/BMP out of
    * the box.
    *
    * Payloads no reader understands route to `fallback` (default: the
    * md5 [[StubDecoder]]) — corrupt media is data, not an error, at
    * corpus scale, and the fallback keeps the feature column total.
    * Pixels are fetched a SCANLINE at a time (one reused int buffer),
    * not per-pixel getRGB calls and not a whole-image copy — the batch
    * shape a 10-megapixel row must not break.
    */
  final class ImageHistogramDecoder(val dim: Int = 8,
      fallback: Decoder = null) extends Decoder {
    require(dim >= 1 && dim <= 256, "histogram needs 1..256 bins")
    private def fb: Decoder = if (fallback != null) fallback else new StubDecoder(dim)

    def decode(payload: Array[Byte]): Array[Float] = {
      val img = decodeImage(payload)
      if (img == null) fb.decode(payload)
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) fb.decode(payload)
        else {
          val counts = new Array[Long](dim)
          val line = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, line, 0, w)
            var x = 0
            while (x < w) {
              val rgb = line(x)
              val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              counts(lum * dim / 256) += 1
              x += 1
            }
            y += 1
          }
          val total = (w.toLong * h).toDouble
          Array.tabulate(dim)(i => (counts(i) / total).toFloat)
        }
      }
    }
  }

  /** REAL audio feature decoder — no stub: parses WAV/AIFF/AU through
    * the JDK's dependency-free `javax.sound.sampled` (the audio
    * analogue of the `javax.imageio` posture; only VIDEO still rides
    * the md5 [[StubDecoder]] — no JDK video codec exists). Features
    * are 8 deterministic channel-0 PCM statistics:
    *
    *   [n_samples, mean, mean_abs, zero_crossings, min, max,
    *    mean_square, sample_rate]
    *
    * — integer sums divided by the sample count, so for fixtures with
    * power-of-two length and bounded amplitude every feature is
    * float-EXACT and the q133 gate can recompute them analytically in
    * SQL from first principles (the strongest check a real decoder can
    * get: DuckDB never sees the bytes, only the waveform definition).
    * Zero crossings count strict sign flips (a 0 sample carries the
    * previous sign). Non-PCM/compressed payloads and parse failures
    * route to `fallback`, as [[ImageHistogramDecoder]] does.
    */
  final class WavFeatureDecoder(fallback: Decoder = null) extends Decoder {
    val dim = 8
    private def fb: Decoder = if (fallback != null) fallback else new StubDecoder(dim)

    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return fb.decode(payload)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          if ((!signed && !unsigned) || (bits != 8 && bits != 16) || ch < 1)
            return fb.decode(payload)
          val data = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * ch
          val n = data.length / frameBytes
          if (n == 0) return fb.decode(payload)
          var i = 0
          var sum = 0L; var sumAbs = 0L; var sumSq = 0L
          var mn = Int.MaxValue; var mx = Int.MinValue
          var zc = 0L; var prevNeg = false
          while (i < n) {
            val off = i * frameBytes // channel 0 of the frame
            val s =
              if (bits == 8) {
                if (signed) data(off).toInt else (data(off) & 0xff) - 128
              } else {
                val lo = data(off) & 0xff
                val hi = data(off + 1) & 0xff
                val raw =
                  if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo
                val sgn = if (signed) raw.toShort.toInt else raw - 32768
                sgn
              }
            sum += s; sumAbs += math.abs(s).toLong
            sumSq += s.toLong * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            val neg = s < 0
            if (i > 0 && neg != prevNeg && s != 0) zc += 1
            if (s != 0) prevNeg = neg
            else if (i == 0) prevNeg = false
            i += 1
          }
          val nd = n.toDouble
          Array(
            n.toFloat,
            (sum / nd).toFloat,
            (sumAbs / nd).toFloat,
            zc.toFloat,
            mn.toFloat,
            mx.toFloat,
            (sumSq / nd).toFloat,
            fmt.getSampleRate)
        } finally ais.close()
      } catch { case _: Exception => fb.decode(payload) }
    }
  }

  /** Minimal RIFF/WAVE writer: 16-bit signed little-endian mono PCM —
    * the test-fixture and synthetic-gate generator ([[WavFeatureDecoder]]
    * decodes it back through the real `javax.sound.sampled` path).
    */
  def syntheticWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)             // PCM
      .putShort(1.toShort)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)          // byte rate
      .putShort(2.toShort)             // block align
      .putShort(16.toShort)            // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic per-id square wave: 1024 samples, half-period
    * `4 + (id mod 7)·2`, amplitude `1000 + (id mod 13)·100`, 16 kHz —
    * parameters chosen so every [[WavFeatureDecoder]] feature is
    * float-exact (n a power of two, A² < 2²⁴) and the q133 oracle can
    * regenerate the waveform in SQL. Exposed for the gate and specs.
    */
  def squareWaveSamples(id: Long): Array[Short] = {
    val h = (4 + (java.lang.Math.floorMod(id, 7L)) * 2).toInt
    val a = (1000 + java.lang.Math.floorMod(id, 13L) * 100).toInt
    Array.tabulate(1024)(i =>
      (if ((i / h) % 2 == 0) a else -a).toShort)
  }

  /** Media table of genuine WAV payloads, one per input id — the
    * partition-local generator feeding the q133 real-decode gate.
    */
  def syntheticWavTable(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.select(col(idCol).cast(LongType))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          org.apache.spark.sql.Row(id,
            syntheticWav(squareWaveSamples(id), 16000))
        }
      }(enc)
  }

  /** Full pixel decode via `javax.imageio`, or null for bytes no
    * installed reader accepts. Same memory-cached stream discipline as
    * [[decodeDims]] (never a temp file per row).
    */
  private[graft] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself; a bare
      // finally-close would throw "IOException: closed" AFTER a
      // successful read and discard the image into the catch below.
      try javax.imageio.ImageIO.read(iis)
      finally try iis.close() catch { case _: java.io.IOException => () }
    } catch { case _: Exception => null }
  }

  /** Wrap a text/binary source table as a media table: payload bytes +
    * populated metadata struct (deterministic fake dims for the stub).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame = {
    val bin = col(payloadCol).cast(BinaryType)
    df.select(
      col(idCol).as("media_id"),
      bin.as("payload"),
      struct(
        lit(kind).as("kind"),
        lit(s"application/x-$kind").as("mime"),
        when(lit(kind) === "image", pmod(length(bin), lit(1024)) + 32)
          .otherwise(lit(null).cast(IntegerType)).as("width"),
        when(lit(kind) === "image", pmod(length(bin), lit(768)) + 32)
          .otherwise(lit(null).cast(IntegerType)).as("height"),
        when(lit(kind) === "audio", lit(16000))
          .otherwise(lit(null).cast(IntegerType)).as("sample_rate"),
        when(lit(kind) =!= "image", length(bin).cast(LongType) * 10)
          .otherwise(lit(null).cast(LongType)).as("duration_ms"),
        length(bin).cast(LongType).as("n_bytes")).as("meta"))
  }

  /** Partition-local batch decode: media table → (media_id, feature).
    * Iterator-to-iterator mapPartitions, the Scala analogue of
    * mapInPandas batches.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          org.apache.spark.sql.Row(id, decoder.decode(bytes).toSeq)
        }
      }(enc)
  }

  /** REAL image dimensions — no stub: header-only width/height via the
    * JDK's `javax.imageio` registry (PNG/JPEG/GIF/BMP out of the box,
    * zero added dependencies). `reader.getWidth(0)` parses the image
    * HEADER, not the pixel data, so the per-row cost is a few hundred
    * bytes of parsing regardless of payload size — the right shape for
    * a metadata-backfill pass over a 100 TB media table (the
    * feature-vector decode, which genuinely needs a codec, stays a
    * [[Decoder]]). Undecodable payloads yield NULL dims rather than
    * failing the batch — corrupt media is data, not an error, at
    * corpus scale.
    */
  private[graft] def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      // MemoryCacheImageInputStream, NOT createImageInputStream: the
      // factory's default file cache would create+delete a temp file
      // PER ROW (and an unwritable executor tmpdir would turn every
      // row's dims NULL); the payload is already in memory.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Partition-local header scan: media table → (media_id, width,
    * height), NULL dims for payloads no installed reader understands.
    * Same iterator-to-iterator batch shape as [[decodeFeatures]];
    * callers join the result back to overwrite the metadata struct's
    * declared dims with measured ones.
    */
  def imageDims(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id").cast(LongType), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val dims = decodeDims(r.getAs[Array[Byte]](1))
          // NULL ids ride through like corrupt payloads do — one bad
          // row must never fail a 100 TB backfill batch.
          org.apache.spark.sql.Row(
            if (r.isNullAt(0)) null else Long.box(r.getLong(0)),
            dims.map(d => Int.box(d._1)).orNull,
            dims.map(d => Int.box(d._2)).orNull)
        }
      }(enc)
  }

  /** "Resize": deterministic stub for the image-resize verb — keeps
    * every `factor`-th byte of the payload and rewrites the metadata
    * dims accordingly. The real pipeline swaps the byte transform for a
    * codec call; the engine-side contract (binary in/out, metadata
    * rewrite, pure projection — no shuffle) is what's exercised here.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1)
    val n = length(col("payload"))
    val idxs = sequence(lit(1), greatest((n / factor).cast(IntegerType), lit(1)))
    // Byte-safe AND linear: each kept byte goes through hex (2 chars),
    // one array_join builds the string, one unhex restores the bytes.
    // (A binary fold-concat would copy the growing accumulator per
    // step — quadratic in payload size.)
    val resized = unhex(array_join(transform(idxs,
      i => hex(col("payload").substr((i - 1) * factor + 1, lit(1)))), ""))
    media
      .withColumn("payload", resized)
      .withColumn("meta", struct(
        col("meta.kind"), col("meta.mime"),
        (col("meta.width") / factor).cast(IntegerType).as("width"),
        (col("meta.height") / factor).cast(IntegerType).as("height"),
        col("meta.sample_rate"), col("meta.duration_ms"),
        length(col("payload")).cast(LongType).as("n_bytes")))
  }

  /** Frame sampling: slice the payload into fixed-size "frames" at a
    * stride, as an array<binary> column — pure built-ins (substring on
    * binary), no UDF, codegen-friendly.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int,
      maxFrames: Int): DataFrame = {
    val nFrames = least(
      greatest(ceil((length(col("payload")) - lit(frameBytes) + 1)
        .cast(DoubleType) / stride).cast(IntegerType), lit(0)),
      lit(maxFrames))
    media.withColumn("frames",
      when(nFrames > 0,
        transform(sequence(lit(0), nFrames - 1),
          i => col("payload").substr(i * lit(stride) + 1, lit(frameBytes))))
        .otherwise(array().cast(ArrayType(BinaryType))))
  }
}
