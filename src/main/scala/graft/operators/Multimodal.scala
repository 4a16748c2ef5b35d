package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Multimodal binary-column plumbing (SURVEY.md §2 C8): media payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs per-partition in bounded batches. Image
 * decode is REAL for the formats the JDK ships codecs for
 * (`javax.imageio`: PNG/JPEG/BMP/GIF — no extra jars, guarded by a
 * header-dims pixel cap against decompression bombs), and audio decode
 * is REAL for JDK-supported streams (`javax.sound.sampled`: WAV/AIFF/
 * AU). Payloads neither stack can read fall back to the deterministic
 * byte-level features, so only video stays honestly stubbed (no
 * demuxer/codec in the JDK). The Spark-side plumbing (schema, batch
 * shape, per-partition iteration) is what matters at 100 TB: payloads
 * are never collected, never shuffled wider than their repartition
 * key, and feature extraction is a map-only pass.
 */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_len", LongType),
    StructField("head_byte", IntegerType),
    StructField("byte_sum", LongType),
    // image fields: NULL when the payload is not a JDK-decodable image
    StructField("img_width", IntegerType, nullable = true),
    StructField("img_height", IntegerType, nullable = true),
    StructField("img_luma_mean", IntegerType, nullable = true),
    // audio fields: NULL when the payload is not a JDK-decodable audio
    // stream (javax.sound.sampled: WAV/AIFF/AU — no external codecs)
    StructField("audio_ms", IntegerType, nullable = true),
    StructField("audio_rate", IntegerType, nullable = true),
    StructField("audio_channels", IntegerType, nullable = true),
    StructField("audio_rms", IntegerType, nullable = true)))

  /** Untrusted-corpus guard: refuse to materialize rasters above this
   * many pixels (header-declared dims are attacker-controlled; a tiny
   * payload can declare a multi-GB raster). 2^26 px ≈ 256 MB ARGB. */
  val DefaultMaxImagePixels: Long = 1L << 26

  /** Byte-level features, computed for EVERY payload (decodable or
   * not): length, first byte, byte sum. Deterministic and cheap — the
   * oracle-checked part of the contract (q_c8). */
  private def byteFeatures(bytes: Array[Byte]): Seq[Any] = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    Seq(bytes.length.toLong, if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum)
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF —
   * javax.imageio needs no external jars). Returns
   * (width, height, mean ITU-R 601 luma 0-255, integer-rounded) or
   * nulls when the payload isn't a readable image. Disk caching is
   * disabled: an executor task must not write temp files per image. */
  private def imageFeatures(bytes: Array[Byte], maxPixels: Long): Seq[Any] = {
    if (bytes.length < 8) return Seq(null, null, null)
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq(null, null, null)
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // header-only dims first: a decompression bomb declares huge
          // dims in a tiny payload — skip before read() allocates them
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return Seq(null, null, null)
          val img = reader.read(0)
          var luma = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              luma += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L
              x += 1
            }
            y += 1
          }
          Seq(w, h, (luma / (w.toLong * h)).toInt)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => Seq(null, null, null) }
  }

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU —
   * no external codecs). Returns (duration ms, sample rate, channels,
   * RMS amplitude) as integers, or nulls when the payload isn't a
   * readable audio stream. RMS is computed only for 16-bit signed PCM
   * (the dominant uncompressed layout); floor'd to int so the value is
   * oracle-computable for synthetic constant-|amplitude| signals. */
  private def audioFeatures(bytes: Array[Byte]): Seq[Any] = {
    if (bytes.length < 12) return Seq(null, null, null, null)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val rate = math.round(fmt.getSampleRate)
        val frames = ais.getFrameLength
        if (rate <= 0 || frames < 0) return Seq(null, null, null, null)
        val ms = (frames * 1000L / rate).toInt
        val rms: Any =
          if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16) {
            val data = ais.readAllBytes()
            val n = data.length / 2
            if (n == 0) 0
            else {
              // sum of squares: n·(2^15)^2 ≤ 2^30·n — no overflow below
              // ~2^33 samples, far past any single payload's size
              var sumSq = 0L
              var i = 0
              while (i < n) {
                val s =
                  if (fmt.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
                  else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
                sumSq += s.toLong * s
                i += 1
              }
              math.sqrt(sumSq.toDouble / n).toInt
            }
          } else null
        Seq(ms, rate, fmt.getChannels, rms)
      } finally ais.close()
    } catch { case _: Exception => Seq(null, null, null, null) }
  }

  /**
   * Deterministic 16-bit mono PCM WAV synthesizer (spec/query harness
   * for the audio decode path — the sandbox has no media files).
   * Samples alternate +amplitude/-amplitude, so RMS == amplitude
   * exactly and every feature is integer-predictable from the inputs.
   */
  def wavBytes(samples: Int, rate: Int, amplitude: Int): Array[Byte] = {
    require(samples >= 0 && rate > 0 && amplitude >= 0 && amplitude <= 32767)
    val dataLen = samples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16).putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples) {
      buf.putShort((if (i % 2 == 0) amplitude else -amplitude).toShort)
      i += 1
    }
    buf.array()
  }

  /** Attach a synthetic WAV payload derived deterministically from
   * `idCol` (8 kHz mono; 8·(100+id%80) samples → duration 100+id%80 ms;
   * amplitude 100+(id%50)·10 → RMS). Map-only; the harness that lets
   * q_c8 hash-check the audio decode against a DuckDB-computable
   * closed form. */
  def withSyntheticWav(df: DataFrame, idCol: String, outCol: String = "wav"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val samples = (8L * (100 + id % 80)).toInt
        val amp = (100 + (id % 50) * 10).toInt
        Row.fromSeq(r.toSeq :+ wavBytes(samples, rate = 8000, amplitude = amp))
      }
    }(enc)
  }

  /**
   * Attach extracted features to a DataFrame with (`idCol`, `binCol`).
   * `partitions` controls batch parallelism — size it so one partition's
   * payloads fit executor memory (e.g. 128 MB of media per task).
   */
  /** `prefix` renames the appended feature columns (`wav_media_len`, …)
   * so two extractions over DIFFERENT binary columns of the same row
   * chain in ONE pass — one scan, no self-join (the q_c8 shape). */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      partitions: Int = 0,
      maxImagePixels: Long = DefaultMaxImagePixels,
      prefix: String = ""): DataFrame = {
    val in = if (partitions > 0) df.repartition(partitions, col(idCol)) else df
    val feats = featureSchema.fields.map(f => f.copy(name = prefix + f.name))
    val schema = StructType(in.schema.fields ++ feats)
    val binIdx = in.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        Row.fromSeq(r.toSeq ++ byteFeatures(bytes) ++
          imageFeatures(bytes, maxImagePixels) ++ audioFeatures(bytes))
      }
    }(enc)
  }

  /**
   * STUB resize: a real implementation would decode, scale to
   * `targetBytes` of pixel data, and re-encode. The deterministic fake
   * stride-samples the payload down to exactly `targetBytes` bytes
   * (or passes short payloads through), preserving the contract that
   * matters for the pipeline: bounded, uniform output size per row —
   * what makes downstream batching/shuffle planning predictable.
   */
  def resize(df: DataFrame, binCol: String, targetBytes: Int, outCol: String = "resized"): DataFrame = {
    require(targetBytes > 0)
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        val out =
          if (bytes.length <= targetBytes) bytes
          else Array.tabulate(targetBytes)(i => bytes((i.toLong * bytes.length / targetBytes).toInt))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /**
   * STUB frame sampling: a real implementation would demux the video
   * and decode `frames` evenly-spaced frames. The deterministic fake
   * slices the payload into `frames` equal spans and emits one row per
   * frame (`frame_idx`, `frame` bytes) — the explode shape that lets
   * per-frame feature extraction parallelize beyond per-video rows.
   */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, frames: Int): DataFrame = {
    require(frames > 0)
    val schema = StructType(df.schema.fields ++
      Seq(StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        val span = math.max(1, bytes.length / frames)
        (0 until frames).iterator.map { f =>
          val from = math.min(f * span, bytes.length)
          val until = if (f == frames - 1) bytes.length else math.min(from + span, bytes.length)
          Row.fromSeq(r.toSeq ++ Seq(f, java.util.Arrays.copyOfRange(bytes, from, until)))
        }
      }
    }(enc)
  }
}
