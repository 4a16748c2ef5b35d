package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Capstone composition: the end-to-end shape of an LLM training-data
 * pipeline over a raw document corpus, built entirely from the C-tier
 * operators — each stage is a narrow, shuffle-bounded transformation, so
 * the whole pipeline is the sum of its parts at 100 TB:
 *
 *  1. annotate: language ID, token counts, quality features (map-only)
 *  2. filter: quality gates (map-only, pushes into the scan)
 *  3. exact dedup (one hash shuffle on the fingerprint)
 *  4. near dedup (MinHash-LSH bucket shuffle + verify join)
 *  5. fingerprint + stable sample bucketing for train/eval splits
 */
object CorpusPipeline {

  /** Stage 1: per-document annotations (all built-in codegen'd exprs). */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("lang_pred", TF.langId(col(textCol)))
      .withColumn("n_tokens", TF.tokenCount(col(textCol)))
      .withColumn("n_chars_measured", TF.charCount(col(textCol)))
      .withColumn("punct_ratio",
        TF.punctCount(col(textCol)).cast(DoubleType) /
          greatest(TF.charCount(col(textCol)), lit(1)))
      .withColumn("stopword_ratio",
        TF.stopwordCount(col(textCol)).cast(DoubleType) /
          greatest(TF.tokenCount(col(textCol)), lit(1)))
      .withColumn("fingerprint", TF.fingerprintMd5(col(textCol)))

  /** Stage 2: quality gates (tune per corpus; defaults are permissive). */
  def qualityFilter(
      annotated: DataFrame,
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.3): DataFrame =
    annotated
      .filter(col("n_tokens") >= minTokens)
      .filter(col("punct_ratio") <= maxPunctRatio)

  /**
   * Full pipeline: annotate → gate → exact dedup (fingerprint) →
   * near dedup (MinHash-LSH + Jaccard verify) → deterministic split
   * bucket (hash of fingerprint → stable under reprocessing).
   */
  def run(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      nearDupThreshold: Double = 0.8,
      evalFraction: Int = 100): DataFrame = {
    val gated = qualityFilter(annotate(docs, textCol))
    val exact = Dedup.exact(gated, "fingerprint", idCol)
    val near = Dedup.dropNearDuplicates(exact, idCol, textCol, nearDupThreshold)
    near.withColumn("split",
      when(pmod(xxhash64(col("fingerprint")), lit(evalFraction)) === 0, "eval")
        .otherwise("train"))
  }
}
