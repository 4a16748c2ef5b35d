package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/**
 * Multimodal binary-column plumbing (SURVEY.md §2 C8): media payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extraction runs per-partition in bounded batches. The decode
 * step is STUBBED (no image/audio codecs in this environment) with a
 * deterministic fake — the Spark-side plumbing (schema, partitioning,
 * batch shape, per-partition iteration) is real and is what matters at
 * 100 TB: payloads are never collected, never shuffled wider than their
 * repartition key, and feature extraction is a map-only pass.
 */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_len", LongType),
    StructField("head_byte", IntegerType),
    StructField("byte_sum", LongType)))

  /**
   * STUB decoder: a real implementation would decode the image/audio
   * payload here (e.g. JPEG → RGB tensor). The deterministic fake
   * derives features from the raw bytes so tests/oracles can verify the
   * plumbing end-to-end.
   */
  private def decodeStub(bytes: Array[Byte]): Row = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    Row(bytes.length.toLong, if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum)
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
        val bytes = r.getAs[Array[Byte]](binIdx)
        val f = decodeStub(if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(r.toSeq ++ f.toSeq)
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
