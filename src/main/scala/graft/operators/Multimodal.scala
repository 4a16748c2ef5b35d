package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Multimodal binary-column plumbing (SURVEY.md §2 C8): media payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs per-partition in bounded batches. Image
 * decode is REAL for the formats the JDK ships codecs for
 * (`javax.imageio`: PNG/JPEG/BMP/GIF — no extra jars); payloads
 * ImageIO cannot read fall back to the deterministic byte-level
 * features, so audio/video stay honestly stubbed (no codecs in this
 * environment). The Spark-side plumbing (schema, partitioning, batch
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
    StructField("img_luma_mean", IntegerType, nullable = true)))

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
  private def imageFeatures(bytes: Array[Byte]): Seq[Any] = {
    if (bytes.length < 8) return Seq(null, null, null)
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) Seq(null, null, null)
      else {
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
    } catch { case _: Exception => Seq(null, null, null) }
  }

  /**
   * Attach extracted features to a DataFrame with (`idCol`, `binCol`).
   * `partitions` controls batch parallelism — size it so one partition's
   * payloads fit executor memory (e.g. 128 MB of media per task).
   */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, partitions: Int = 0): DataFrame = {
    val in = if (partitions > 0) df.repartition(partitions, col(idCol)) else df
    val schema = StructType(in.schema.fields ++ featureSchema.fields)
    val binIdx = in.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        Row.fromSeq(r.toSeq ++ byteFeatures(bytes) ++ imageFeatures(bytes))
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
