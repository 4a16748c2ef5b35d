package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * C51: exact classifier evaluation at corpus scale — the QA step before
 * a quality/toxicity/language classifier is unleashed on 100 TB of
 * crawl: is its score actually separating the labeled classes?
 *
 * AUC is computed exactly via the Mann–Whitney rank-sum identity
 *
 *   AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)
 *
 * where R⁺ is the sum of the positives' ranks under ascending score,
 * ties taking the AVERAGE rank of their tie group. Everything stays in
 * integer arithmetic by carrying 2·R⁺ (twice an average rank of a tie
 * group is the integer 2·cumBefore + cnt + 1), and the single final
 * division happens driver-side in BigInt — so the result is bit-exact
 * and engine-portable (the DuckDB oracle reproduces it with a window
 * cumulative sum).
 *
 * Scale shape: the naive formulation ranks every ROW with a global
 * `row_number() OVER (ORDER BY score)` — one task sorting the corpus.
 * Here rows first melt into one combining aggregate per DISTINCT score
 * (map-side combine: the only shuffle is |distinct scores| rows of
 * three longs), the tie-group cumulative counts come from the
 * distributed prefix-sum pattern (range sort on score, O(partitions)
 * driver longs — `CorpusPipeline.packedSequenceSpans` shape), and the
 * final reduce is three longs. No single-task sort, no per-row window,
 * nothing collected but partition subtotals and the 3-long result.
 */
object Evaluation {

  /**
   * Exact ROC-AUC of integer `scoreCol` against {0,1} `labelCol`.
   * Returns one row: n_pos, n_neg, r2_pos (= 2·R⁺), auc_ppm
   * (⌊AUC·10⁶⌋). Degenerate labelings (no positives or no negatives)
   * return auc_ppm NULL rather than a division blow-up.
   */
  def exactAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val byScore = df
      .select(col(scoreCol).cast(LongType).as("s"), col(labelCol).cast(LongType).as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s")
      .agg(count(lit(1)).as("c"), sum("y").as("p"))
    val sorted = byScore
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("s"))
      .sortWithinPartitions("s")
    val rdd = sorted.rdd
    val partCounts = rdd
      .mapPartitionsWithIndex { case (pi, it) =>
        var rows = 0L
        it.foreach(rows += _.getLong(1))
        Iterator((pi, rows))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partCounts.scanLeft(0L)(_ + _))
    // per tie group: positives contribute p · (2·cumBefore + c + 1) to 2·R⁺
    val (r2pos, npos, n) = rdd
      .mapPartitionsWithIndex { case (pi, it) =>
        var acc = offsets.value(pi)
        it.map { r =>
          val c = r.getLong(1); val p = r.getLong(2)
          val before = acc
          acc += c
          (p * (2 * before + c + 1), p, c)
        }
      }
      .fold((0L, 0L, 0L)) { case ((a1, a2, a3), (b1, b2, b3)) => (a1 + b1, a2 + b2, a3 + b3) }
    val nneg = n - npos
    // one row: BigInt keeps n⁺·n⁻ exact past the Long range
    val aucPpm: Any =
      if (npos == 0L || nneg == 0L) null
      else ((BigInt(r2pos) - BigInt(npos) * (npos + 1)) * 1000000 /
        (BigInt(2) * npos * nneg)).toLong
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(npos, nneg, r2pos, aucPpm)),
      StructType(Seq(
        StructField("n_pos", LongType),
        StructField("n_neg", LongType),
        StructField("r2_pos", LongType),
        StructField("auc_ppm", LongType))))
  }
}
