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
}
