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
 * AU), and video frame sampling is REAL for MJPEG-in-AVI (RIFF demux
 * is pure byte parsing; each demuxed frame is a standalone JPEG the
 * image path decodes). Payloads none of these can read fall back to
 * the deterministic byte-level features / stride-slice — honestly
 * degraded, never wrong. The Spark-side plumbing (schema, batch
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
  private[operators] def byteFeatures(bytes: Array[Byte]): Seq[Any] = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    Seq(bytes.length.toLong, if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum)
  }

  /** Magic-byte sniff: ImageIO format name for the JDK-decodable
   * formats, or null. Pure byte compares — the common corpus case
   * (payload is NOT an image) never touches the ImageIO registry,
   * whose per-call provider iteration is synchronized JVM-wide and
   * collapses a 32-thread executor to ~1 core (measured: AudioSystem's
   * equivalent lock gave 52k/s AGGREGATE across 32 threads vs 88k/s
   * single-threaded). */
  private def sniffImageFormat(b: Array[Byte]): String = {
    if (b.length < 8) null
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else null
  }

  /** Per-thread cached ImageReader per format: the registry lookup
   * (synchronized) runs once per executor thread per format instead of
   * once per ROW. ImageReader is not thread-safe but is reusable via
   * setInput; thread confinement makes that safe. */
  @transient private lazy val readerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageReader]](
      () => new java.util.HashMap[String, javax.imageio.ImageReader])

  /** Real image decode via the JDK's ImageIO codecs (PNG/JPEG/BMP/GIF
   * — no external jars), with the registry kept OFF the per-row path:
   * magic-sniff first, thread-local reader reuse after. Returns null
   * when the payload isn't a readable image or the header-declared
   * raster exceeds `maxPixels` (a decompression bomb declares huge
   * dims in a tiny payload — checked BEFORE read() allocates them).
   * Disk caching is disabled: an executor task must not write temp
   * files per image. */
  private[operators] def decodeImage(
      bytes: Array[Byte], maxPixels: Long): java.awt.image.BufferedImage = {
    val fmt = sniffImageFormat(bytes)
    if (fmt == null) return null
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val cache = readerCache.get()
      var reader = cache.get(fmt)
      if (reader == null) {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) return null
        reader = it.next()
        cache.put(fmt, reader)
      }
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return null
        reader.read(0)
      } finally {
        reader.setInput(null)
        iis.close()
      }
    } catch { case _: Exception => null }
  }

  /** (width, height, mean ITU-R 601 luma 0-255, floored per pixel) or
   * nulls when the payload isn't a readable image within the cap. */
  private[operators] def imageFeatures(bytes: Array[Byte], maxPixels: Long): Seq[Any] = {
    val img = decodeImage(bytes, maxPixels)
    if (img == null) return Seq(null, null, null)
    val (w, h) = (img.getWidth, img.getHeight)
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
  }

  /** Lock-free fast path for RIFF/WAVE PCM: AudioSystem
   * .getAudioInputStream iterates SPI providers under a JVM-wide lock —
   * measured 52k decodes/s AGGREGATE across 32 threads vs 88k/s on ONE
   * thread — so the dominant uncompressed format is parsed directly
   * (fmt + data chunk walk, same long-arithmetic bounds discipline as
   * [[aviVideoChunks]]). Returns null when the payload is not a
   * parseable WAV (caller falls back to the SPI path for AIFF/AU).
   * Feature math is IDENTICAL to the SPI path: frames = dataLen/block,
   * ms floored, RMS over all interleaved 16-bit LE samples. */
  private def wavFeaturesDirect(bytes: Array[Byte]): Seq[Any] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def cc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || cc(0) != "RIFF" || cc(8) != "WAVE") return null
    val end = math.min(bytes.length.toLong, 8L + le32(4)).toInt
    var fmtTag, channels, rate, blockAlign, bits = -1
    var dataOff, dataLen = -1
    var p = 12
    var done = false
    while (!done && p + 8 <= end) {
      val id = cc(p)
      val sz = le32(p + 4)
      if (sz < 0 || p + 8L + sz > end) done = true
      else {
        if (id == "fmt " && sz >= 16) {
          fmtTag = le16(p + 8); channels = le16(p + 10); rate = le32(p + 12)
          blockAlign = le16(p + 20); bits = le16(p + 22)
        } else if (id == "data") { dataOff = p + 8; dataLen = sz }
        p += 8 + sz + (sz & 1)
      }
    }
    if (fmtTag < 0 || dataOff < 0 || rate <= 0 || channels <= 0 || blockAlign <= 0)
      return null
    val frames = dataLen / blockAlign
    val ms = (frames.toLong * 1000L / rate).toInt
    val rms: Any =
      if (fmtTag == 1 && bits == 16) {
        val n = dataLen / 2
        if (n == 0) 0
        else {
          var sumSq = 0L
          var i = 0
          while (i < n) {
            val s = (bytes(dataOff + 2 * i + 1) << 8) | (bytes(dataOff + 2 * i) & 0xff)
            sumSq += s.toLong * s
            i += 1
          }
          math.sqrt(sumSq.toDouble / n).toInt
        }
      } else null
    Seq(ms, rate, channels, rms)
  }

  /** Real audio decode: the lock-free WAV parser above for RIFF/WAVE
   * (the hot path), javax.sound.sampled for the other JDK-supported
   * streams (AIFF/AU — rare enough that the SPI lock doesn't matter).
   * Returns (duration ms, sample rate, channels, RMS amplitude) as
   * integers, or nulls when the payload isn't readable audio. RMS only
   * for 16-bit signed PCM; floor'd to int so the value is
   * oracle-computable for synthetic constant-|amplitude| signals. */
  private[operators] def audioFeatures(bytes: Array[Byte]): Seq[Any] = {
    if (bytes.length < 12) return Seq(null, null, null, null)
    if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
      val direct = try wavFeaturesDirect(bytes) catch { case _: Exception => null }
      if (direct != null) return direct
      // RIFF but not parseable WAV (e.g. AVI): not audio
      return Seq(null, null, null, null)
    }
    // the SPI fallback must be gated on container magic too: for a
    // NON-audio payload (the common corpus case) getAudioInputStream
    // walks every provider — including MIDI — under the same JVM-wide
    // lock before concluding "not audio". jstack on the 1M-row stress
    // showed all 32 executor threads blocked on JSSecurityManager.
    val isAiff = bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M'
    val isAu = bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd'
    if (!isAiff && !isAu) return Seq(null, null, null, null)
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

  /** Thread-local PNG ImageWriter: ImageIO.write's per-call registry
   * lookup is synchronized JVM-wide (same SPI lock as the readers) —
   * one lookup per executor thread, then reuse. */
  @transient private lazy val pngWriterCache =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() => {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      if (it.hasNext) it.next() else null
    })

  /** Exact integer box-filter (area-average) downscale/upscale: target
   * pixel (tx,ty) averages the source box [tx·w/tw, (tx+1)·w/tw) ×
   * [ty·h/th, (ty+1)·h/th) per channel with floor division — fully
   * deterministic, so a solid-colour source keeps its exact colour at
   * any target size (the closed form the q_c8c oracle pins). */
  private[operators] def areaAverage(
      img: java.awt.image.BufferedImage, tw: Int, th: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * h / th).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * h / th).toInt)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * w / tw).toInt
        val x1 = math.max(x0 + 1, ((tx + 1).toLong * w / tw).toInt)
        var sr, sg, sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        out.setRGB(tx, ty,
          ((sr / n).toInt << 16) | ((sg / n).toInt << 8) | (sb / n).toInt)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** PNG-encode via the thread-local writer (lossless, so decode→
   * resize→encode→decode round-trips pixels exactly). */
  private[operators] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = pngWriterCache.get()
    if (writer == null) return null
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally {
      writer.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }

  /**
   * REAL image resize: decode (thread-local readers, bomb-capped),
   * exact area-average to `targetW`×`targetH`, re-encode PNG. Output
   * column is NULL for payloads that aren't decodable images within
   * the pixel cap — honest degrade, never a fake raster. Map-only,
   * bounded output (target raster + PNG framing) per row.
   */
  def resizeImage(
      df: DataFrame,
      binCol: String,
      targetW: Int,
      targetH: Int,
      outCol: String = "resized",
      maxImagePixels: Long = DefaultMaxImagePixels): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        val img = decodeImage(bytes, maxImagePixels)
        val out: Array[Byte] =
          if (img == null) null
          else try encodePng(areaAverage(img, targetW, targetH))
          catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Attach a solid-colour synthetic PNG derived deterministically from
   * `idCol`: dims (4+id%5)×(3+id%4), RGB (id%251, id·7%251, id·13%251).
   * Solid colour is the closed form that survives [[areaAverage]] at
   * any target size, so q_c8c can hash-check decode→resize→re-encode→
   * decode end to end against SQL-computable luma/dims. */
  def withSyntheticPng(df: DataFrame, idCol: String, outCol: String = "img"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
        val rgb = (((id % 251).toInt) << 16) |
          ((((id * 7) % 251).toInt) << 8) | ((id * 13) % 251).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        Row.fromSeq(r.toSeq :+ encodePng(img))
      }
    }(enc)
  }

  /**
   * Byte-budget downsampler (NOT an image operation — see
   * [[resizeImage]] for real raster resize): stride-samples any
   * payload down to exactly `targetBytes` bytes (short payloads pass
   * through), preserving the contract that matters for the pipeline:
   * bounded, uniform output size per row — what makes downstream
   * batching/shuffle planning predictable for opaque media blobs.
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
   * Frame sampling. REAL for MJPEG-in-AVI payloads (RIFF chunk walk)
   * AND MP4/ISO-BMFF payloads (moov→trak→stbl box walk: the video
   * trak's stsz/stsc/stco sample table maps every sample to its byte
   * span in mdat) — both pure byte parsing, no codec; `frames`
   * evenly-spaced source frames are emitted. For MJPEG-in-AVI each
   * frame is a standalone JPEG that [[extractFeatures]]' image path
   * decodes. Payloads that are neither fall back to the deterministic
   * stride-slice (frames tile the payload), keeping the byte-level
   * contract of earlier rounds. Either way the output shape is the
   * explode that lets per-frame feature extraction parallelize beyond
   * per-video rows: one row per (video, frame_idx).
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
        aviVideoChunks(bytes).orElse(mp4VideoSamples(bytes)) match {
          case Some(chunks) if chunks.nonEmpty =>
            // real demux: pick `frames` evenly spaced source frames
            // (fewer when the video is shorter than the request)
            val take = math.min(frames, chunks.length)
            (0 until take).iterator.map { f =>
              val (off, len) = chunks((f * chunks.length) / take)
              Row.fromSeq(r.toSeq ++ Seq(f, java.util.Arrays.copyOfRange(bytes, off, off + len)))
            }
          case _ =>
            val span = math.max(1, bytes.length / frames)
            (0 until frames).iterator.map { f =>
              val from = math.min(f * span, bytes.length)
              val until = if (f == frames - 1) bytes.length else math.min(from + span, bytes.length)
              Row.fromSeq(r.toSeq ++ Seq(f, java.util.Arrays.copyOfRange(bytes, from, until)))
            }
        }
      }
    }(enc)
  }

  /**
   * MP4/ISO-BMFF demux: (offset, length) of every sample of the FIRST
   * video trak (hdlr handler `vide`), resolved through the sample
   * table — stsz sizes × stsc samples-per-chunk × stco/co64 chunk
   * offsets — or None when the payload is not ISO-BMFF. Same contract
   * as [[aviVideoChunks]]: pure byte walk, no decode, every table
   * count validated against the bytes actually present (a hostile
   * stsz claiming 2^31 samples fails the payload-length check before
   * any allocation), every emitted span bounds-checked against the
   * payload, truncated/hostile input degrades to None/fewer samples,
   * never OOB and never a throw. Box descent follows only the fixed
   * moov→trak→mdia→minf→stbl path (depth 5, no recursion).
   */
  private[operators] def mp4VideoSamples(bytes: Array[Byte]): Option[Vector[(Int, Int)]] = {
    val n = bytes.length
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def typ(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    // ISO-BMFF sniff: a valid first box whose type is a well-known
    // top-level brand (ftyp leads every real MP4)
    if (n < 16 || typ(4) != "ftyp") return None

    /** Children of the container span [from, to): (type, payloadStart,
     * payloadEnd) triples. Handles size==1 (64-bit largesize) and
     * size==0 (box extends to container end); stops at the first
     * malformed header (truncation degrade). */
    def children(from: Int, to: Int): Vector[(String, Int, Int)] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var p = from
      var stop = false
      while (!stop && p + 8 <= to) {
        val sz32 = be32(p)
        val t = typ(p + 4)
        val (hdr, sz): (Int, Long) =
          if (sz32 == 1L && p + 16 <= to) (16, be64(p + 8))
          else if (sz32 == 0L) (8, (to - p).toLong)
          else (8, sz32)
        if (sz < hdr || p + sz > to) stop = true // malformed/truncated
        else {
          out += ((t, p + hdr, (p + sz).toInt))
          p = (p + sz).toInt
        }
      }
      out.result()
    }
    def child(from: Int, to: Int, t: String): Option[(Int, Int)] =
      children(from, to).collectFirst { case (`t`, s, e) => (s, e) }

    val moov = child(0, n, "moov").getOrElse(return None)
    // first trak whose mdia/hdlr declares a video handler
    val videoStbl: Option[(Int, Int)] =
      children(moov._1, moov._2).collectFirst {
        case ("trak", ts, te) if {
          val mdia = child(ts, te, "mdia")
          mdia.exists { case (ms, me) =>
            child(ms, me, "hdlr").exists { case (hs, he) =>
              // hdlr payload: version/flags(4) pre_defined(4) handler(4)
              hs + 12 <= he && typ(hs + 8) == "vide"
            }
          }
        } =>
          val (ms, me) = child(ts, te, "mdia").get
          val (fs, fe) = child(ms, me, "minf").getOrElse((0, 0))
          child(fs, fe, "stbl").getOrElse((0, 0))
      }
    val (ss, se) = videoStbl.filter(t => t._2 > t._1).getOrElse(return Some(Vector.empty))

    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes...]
    val sizes: IndexedSeq[Long] = child(ss, se, "stsz") match {
      case Some((s, e)) if s + 12 <= e =>
        val fixed = be32(s + 4)
        val count = be32(s + 8)
        if (count < 0 || count > Int.MaxValue) return Some(Vector.empty)
        val c = count.toInt
        if (fixed != 0L) IndexedSeq.fill(c)(fixed)
        else if (s + 12 + 4L * c <= e) (0 until c).map(i => be32(s + 12 + 4 * i))
        else return Some(Vector.empty) // count exceeds the bytes present
      case _ => return Some(Vector.empty)
    }
    // stco (u32) or co64 (u64): version/flags(4) entry_count(4) [offs]
    val chunkOffs: IndexedSeq[Long] = child(ss, se, "stco") match {
      case Some((s, e)) if s + 8 <= e =>
        val c = be32(s + 4)
        if (c > Int.MaxValue || s + 8 + 4L * c > e) return Some(Vector.empty)
        (0 until c.toInt).map(i => be32(s + 8 + 4 * i))
      case _ => child(ss, se, "co64") match {
        case Some((s, e)) if s + 8 <= e =>
          val c = be32(s + 4)
          if (c > Int.MaxValue || s + 8 + 8L * c > e) return Some(Vector.empty)
          (0 until c.toInt).map(i => be64(s + 8 + 8 * i))
        case _ => return Some(Vector.empty)
      }
    }
    // stsc: version/flags(4) entry_count(4) [(first_chunk, samples_per
    // _chunk, sample_desc_idx)...] — run-length over chunk numbers
    val stsc: IndexedSeq[(Long, Long)] = child(ss, se, "stsc") match {
      case Some((s, e)) if s + 8 <= e =>
        val c = be32(s + 4)
        if (c > Int.MaxValue || s + 8 + 12L * c > e) return Some(Vector.empty)
        (0 until c.toInt).map(i => (be32(s + 8 + 12 * i), be32(s + 12 + 12 * i)))
      case _ => return Some(Vector.empty)
    }
    if (sizes.isEmpty || chunkOffs.isEmpty || stsc.isEmpty) return Some(Vector.empty)

    // expand: walk chunks in order, current samples-per-chunk from the
    // last stsc entry with first_chunk <= chunk number (1-based)
    val out = Vector.newBuilder[(Int, Int)]
    var sample = 0
    var stscIdx = 0
    var chunk = 0
    while (chunk < chunkOffs.length && sample < sizes.length) {
      val chunkNo = chunk + 1L
      while (stscIdx + 1 < stsc.length && stsc(stscIdx + 1)._1 <= chunkNo) stscIdx += 1
      val spc = math.min(stsc(stscIdx)._2, sizes.length.toLong - sample)
      var off = chunkOffs(chunk)
      var i = 0L
      while (i < spc && sample < sizes.length) {
        val len = sizes(sample)
        // emit only spans that actually fit the payload (truncation/
        // hostile tables degrade to fewer samples, never OOB)
        if (off >= 0 && len > 0 && len <= Int.MaxValue && off + len <= n)
          out += ((off.toInt, len.toInt))
        off += len
        sample += 1
        i += 1
      }
      chunk += 1
    }
    Some(out.result())
  }

  /** Attach a synthetic MP4 payload derived deterministically from
   * `idCol`: 3 + id%5 samples, sample f = 16 bytes of value
   * (id·31 + f) % 251 — the SAME closed form as [[withSyntheticAvi]],
   * so the q_c8b oracle algebra carries over verbatim (q_c8d). The
   * ISO-BMFF box walk ([[mp4VideoSamples]]) is the REAL code path
   * under test. */
  def withSyntheticMp4(df: DataFrame, idCol: String, outCol: String = "video"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val cnt = (3 + id % 5).toInt
        val frames = (0 until cnt).map(f =>
          Array.fill(16)(((id * 31 + f) % 251).toByte))
        Row.fromSeq(r.toSeq :+ mp4Bytes(frames))
      }
    }(enc)
  }

  /** Minimal ISO-BMFF/MP4 synthesizer (spec/query harness — the
   * sandbox has no media files): ftyp + moov(mvhd, trak(tkhd,
   * mdia(mdhd, hdlr `vide`, minf(stbl(stsd, stsz, stsc, stco))))) +
   * mdat with the samples back-to-back, one chunk per sample. The
   * non-table boxes carry plausible fixed payloads so a real parser
   * (and [[mp4VideoSamples]]) must skip them correctly. */
  def mp4Bytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes, "iso2".getBytes)
    val mvhd = box("mvhd", new Array[Byte](100)) // version/flags + fixed fields
    val tkhd = box("tkhd", new Array[Byte](84))
    val mdhd = box("mdhd", new Array[Byte](24))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes, new Array[Byte](13))
    val stsd = box("stsd", be32(0), be32(0)) // zero sample descriptions
    val stsz = box("stsz", be32(0), be32(0), be32(frames.length),
      frames.map(f => be32(f.length)).flatten.toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    // chunk offsets are absolute file offsets into mdat — computed
    // after the moov size is known, so build moov with a placeholder
    // then rebuild with real offsets (sizes don't change)
    def moovWith(offsets: Seq[Long]): Array[Byte] = {
      val stco = box("stco", be32(0), be32(offsets.length),
        offsets.map(be32).flatten.toArray)
      val stbl = box("stbl", stsd, stsz, stsc, stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }
    val moovLen = moovWith(frames.map(_ => 0L)).length
    val mdatStart = ftyp.length + moovLen + 8 // mdat payload offset
    val offsets = frames.scanLeft(mdatStart.toLong)(_ + _.length).init
    val mdat = box("mdat", frames.flatten.toArray)
    ftyp ++ moovWith(offsets) ++ mdat
  }

  /** RIFF-AVI demux: (offset, length) of every video chunk (fourcc
   * `##dc`/`##db`) inside the `movi` list, or None when the payload is
   * not an AVI. Chunk walk only — no frame decode, no allocation
   * proportional to frame size, and every length is bounds-checked so
   * a truncated/hostile payload degrades to None/shorter, never OOB.
   * The LIST descent uses an explicit worklist, not recursion: ~12
   * bytes per nesting level means a 120 KB payload could otherwise
   * drive ~10k stack frames and throw StackOverflowError — an Error
   * that no `catch Exception` contract catches. */
  private[operators] def aviVideoChunks(bytes: Array[Byte]): Option[Vector[(Int, Int)]] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 24 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val end = math.min(bytes.length, 8L + le32(4)).toInt
    val out = Vector.newBuilder[(Int, Int)]
    // walk chunks; descend only into LIST movi (and LISTs inside movi).
    // Worklist of (from, to, inMovi) spans — heap-bounded by payload size.
    val work = scala.collection.mutable.Stack((12, end, false))
    while (work.nonEmpty) {
      var (p, to, inMovi) = work.pop()
      var stop = false
      while (!stop && p + 8 <= to) {
        val id = fourcc(p)
        val sz = le32(p + 4)
        // long arithmetic: a hostile ~2^31 declared size must not wrap
        // p+8+sz negative and sneak past the bounds check
        if (sz < 0 || p + 8L + sz > to) stop = true // truncated/hostile
        else {
          if (id == "LIST" && sz >= 4) {
            val listType = fourcc(p + 8)
            if (listType == "movi" || inMovi)
              work.push((p + 12, p + 8 + sz, listType == "movi" || inMovi))
          } else if (inMovi && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")) && sz > 0) {
            out += ((p + 8, sz))
          }
          p += 8 + sz + (sz & 1) // chunks pad to even
        }
      }
    }
    // worklist traversal visits nested LISTs out of document order;
    // offset-sort restores the recursive walk's chunk ordering exactly
    Some(out.result().sortBy(_._1))
  }

  /** Attach a synthetic AVI payload derived deterministically from
   * `idCol`: 3 + id%5 frames, frame f = 16 bytes of value
   * (id·31 + f) % 251. The container demux ([[aviVideoChunks]]) is the
   * REAL code path under test; constant-byte frames make every sampled
   * frame's byte_sum a closed form a SQL oracle can compute (q_c8b). */
  def withSyntheticAvi(df: DataFrame, idCol: String, outCol: String = "video"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val cnt = (3 + id % 5).toInt
        val frames = (0 until cnt).map(f =>
          Array.fill(16)(((id * 31 + f) % 251).toByte))
        Row.fromSeq(r.toSeq :+ aviBytes(frames, width = 8, height = 6))
      }
    }(enc)
  }

  /** Minimal MJPEG-in-AVI synthesizer (spec/query harness — the
   * sandbox has no media files): wraps pre-encoded JPEG frames in a
   * RIFF AVI with one video stream. [[aviVideoChunks]] (and any
   * standard AVI demuxer) recovers the exact frame bytes. */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // strl: strh(56) + strf(40)
    val strh = cc("strh") ++ le32(56) ++ cc("vids") ++ cc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(frames.map(_.length).max) ++ le32(-1) ++
      le32(0) ++ le32(0) ++ le32(0)
    val strf = cc("strf") ++ le32(40) ++ le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ cc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = cc("LIST") ++ le32(4 + strh.length + strf.length) ++ cc("strl") ++ strh ++ strf
    val avih = cc("avih") ++ le32(56) ++ le32(1000000 / fps) ++ le32(0) ++
      le32(0) ++ le32(0x10) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++
      le32(0) ++ le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = cc("LIST") ++ le32(4 + avih.length + strl.length) ++ cc("hdrl") ++ avih ++ strl
    val moviBody = frames.flatMap { f =>
      val padded = if (f.length % 2 == 1) f :+ 0.toByte else f
      cc("00dc") ++ le32(f.length) ++ padded
    }.toArray
    val movi = cc("LIST") ++ le32(4 + moviBody.length) ++ cc("movi") ++ moviBody
    val riffBody = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(le32(riffBody.length)); bos.write(riffBody)
    bos.toByteArray
  }
  // ---- C86: perceptual image near-dedup support -----------------------

  /**
   * C86: 64-bit difference hash (dHash — the standard perceptual
   * image-dedup signature, e.g. the LAION near-dup pipeline shape):
   * decode (thread-local readers, bomb-capped) → exact [[areaAverage]]
   * to (hashW+1)×hashH → integer ITU-R 601 luma per pixel → bit
   * (y·hashW + x) set iff luma(x+1, y) > luma(x, y). Every step is
   * integer-deterministic, so a synthetic raster with a closed-form
   * edge layout yields a closed-form hash the DuckDB oracle can
   * compute analytically (the q_c8c device). NULL for payloads that
   * aren't decodable images within the pixel cap. Map-only.
   */
  def dHash(
      df: DataFrame,
      binCol: String,
      outCol: String = "dhash",
      hashW: Int = 8,
      hashH: Int = 8,
      maxImagePixels: Long = DefaultMaxImagePixels): DataFrame = {
    require(hashW > 0 && hashH > 0 && hashW * hashH <= 64,
      s"dHash needs hashW*hashH <= 64 bits, got ${hashW}x$hashH")
    val schema = StructType(df.schema.fields :+ StructField(outCol, LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        val img = decodeImage(bytes, maxImagePixels)
        val out: Any =
          if (img == null) null
          else {
            val small = areaAverage(img, hashW + 1, hashH)
            var hash = 0L
            var y = 0
            while (y < hashH) {
              var prev = lumaAt(small, 0, y)
              var x = 0
              while (x < hashW) {
                val cur = lumaAt(small, x + 1, y)
                if (cur > prev) hash |= 1L << (y * hashW + x)
                prev = cur
                x += 1
              }
              y += 1
            }
            hash
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Integer ITU-R 601 luma of one pixel, floored — the
   * [[imageFeatures]] per-pixel formula factored out for [[dHash]]. */
  private def lumaAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    ((299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
      114L * (rgb & 0xff)) / 1000L).toInt
  }

  /**
   * C86 synthetic: an 18×16 grayscale PNG with a vertical step edge
   * whose position is a closed form of `idCol` — the dHash analogue of
   * [[withSyntheticPng]]'s solid colour. Downsampled 9×8 pixel (x, y)
   * is dark (40) iff x ≤ p else light (200), with p = id % 7; docs
   * with id % 16 ≥ 14 are NEAR-DUPLICATE variants that move the edge
   * to p' = (p+3) % 7 in the bottom quarter only (downsampled rows
   * 6–7), flipping exactly 4 dHash bits — all in the top 16-bit band,
   * so banded candidate recall is exhaustive on this layout. Every
   * 2×2 source block is constant and gray luma is exact, so the
   * decode → area-average → luma → compare chain reproduces
   * dhash = Σ_y 2^(8y + p_y) bit-for-bit (p ≤ 6 keeps bit 62 the
   * highest — no sign-bit divergence between BIGINT engines).
   */
  def withSyntheticEdgePng(df: DataFrame, idCol: String, outCol: String = "img"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val p = (id % 7).toInt
        val p2 = (p + 3) % 7
        val variant = id % 16 >= 14
        val img = new java.awt.image.BufferedImage(
          18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y0 = 0
        while (y0 < 16) {
          val edge = if (variant && y0 >= 12) p2 else p
          var x0 = 0
          while (x0 < 18) {
            val v = if (x0 / 2 <= edge) 40 else 200
            img.setRGB(x0, y0, (v << 16) | (v << 8) | v)
            x0 += 1
          }
          y0 += 1
        }
        Row.fromSeq(r.toSeq :+ encodePng(img))
      }
    }(enc)
  }
}
