package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Distributed interval (range) join — SURVEY.md §2 B14.
 *
 * Matches each probe value x to every interval [lo, hi) that contains
 * it (intervals may overlap — the IP-geolocation / time-validity-range
 * shape). A naive formulation is a BroadcastNestedLoopJoin (or worse, a
 * CartesianProduct) on the non-equi predicate; this operator turns it
 * into an equi-join:
 *
 *   bucket(x)      = floor(x / W)
 *   interval covers buckets floor(lo/W) .. floor(hi/W)   (exploded)
 *   equi-join on bucket, then the exact residual predicate.
 *
 * floor monotonicity guarantees no candidate is missed; the residual
 * filter removes same-bucket non-overlaps, so results are exact. At
 * 100 TB both sides shuffle once on an 8-byte bucket key and every
 * bucket's work is local; an interval is duplicated ceil(len/W)+1
 * times, so pick W near the typical interval length (W far below it
 * explodes the build side; W far above it fattens buckets toward the
 * nested-loop worst case).
 */
object IntervalJoin {

  /**
   * @param probe     rows carrying the point value; all columns pass through
   * @param probeCol  numeric (double-castable) point column on `probe`
   * @param intervals rows carrying [lo, hi) bounds; all columns pass through
   * @param loCol     inclusive lower bound column on `intervals`
   * @param hiCol     exclusive upper bound column on `intervals`
   * @param bucketWidth fixed bucket width W (> 0)
   * @return inner join of probe x intervals where lo <= x < hi
   */
  def overlap(
      probe: DataFrame,
      probeCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / w).cast("long"),
        floor(col(hiCol).cast("double") / w).cast("long"))))
    val p = probe.withColumn(
      "__bucket",
      floor(col(probeCol).cast("double") / w).cast("long"))
    p.join(iv, Seq("__bucket"))
      .filter(col(probeCol) >= col(loCol) && col(probeCol) < col(hiCol))
      .drop("__bucket")
  }
}
