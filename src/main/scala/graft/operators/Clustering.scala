package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, Column}

/**
 * Distributed Lloyd k-means over integer-quantized embedding columns —
 * the topic-bucketing / mixture-curation clustering step, as a real
 * iterated Lloyd loop rather than the sampled single-shot variants the
 * ANN operators use ([[Similarity.ivfTopK]] trains on a bounded sample;
 * [[Dedup.semDedup]] routes through seeded cells).
 *
 * Scale shape (the connected-components pattern): the DRIVER holds only
 * the k×D centroid matrix (KBs) and the loop counter; each round is one
 * map-only assignment pass (codegen'd [[graft.functions.NearestCells]]
 * with the centroid matrix embedded as a task-closure constant — no
 * join, no broadcast exchange) plus ONE map-side-combining aggregate
 * (D `avg` columns per cell, no explode — a 64-dim corpus aggregates
 * 64 sums+counts per cell per partition). Rounds are FIXED (no
 * convergence test), so the whole run is a pure function of the data:
 *
 *  - centroids₀ = the first k rows by id (the seeded-IVF contract);
 *  - assignment = argmax of v·c − ‖c‖²/2, ties to the lower cell id —
 *    exact in double for integer vectors/centroids (q_c7b contract);
 *  - update = per-dim `floor(avg)` (floor in DOUBLE, then cast: the
 *    one cross-engine-safe int conversion — CLAUDE.md oracle rules),
 *    so centroids stay INTEGER and every later affinity stays exact;
 *  - an empty cell keeps its previous centroid.
 *
 * `rounds` = number of assignment passes (updates happen between
 * passes), so `rounds = 3` is assign → update → assign → update →
 * assign; the returned frame carries the LAST assignment.
 */
object Clustering {

  def lloydAssign(
      df: DataFrame,
      idCol: String,
      quantVecCol: String,
      k: Int,
      rounds: Int = 3): DataFrame = {
    require(k > 0 && rounds > 0)
    var cent: Array[Array[Long]] = df
      .filter(col(idCol) < k).orderBy(idCol)
      .select(col(quantVecCol)).collect().map(_.getSeq[Long](0).toArray)
    require(cent.length == k, s"need $k seed rows with $idCol < $k, got ${cent.length}")
    val dim = cent(0).length
    val data = df.select(col(idCol).as("__id"), col(quantVecCol).as("__v"))

    def assigned(c: Array[Array[Long]]): DataFrame = data.withColumn("__cell",
      element_at(graft.functions.NearestCells(
        col("__v").cast("array<double>"), c.map(_.map(_.toDouble)), 1), 1))

    var round = 1
    while (round < rounds) {
      val aggs: Seq[Column] =
        (0 until dim).map(i => floor(avg(col("__v").getItem(i))).cast(LongType).as(s"c$i"))
      val rows = assigned(cent).groupBy("__cell").agg(aggs.head, aggs.tail: _*).collect()
      val next = cent.map(_.clone()) // empty cells keep their centroid
      rows.foreach { r =>
        val cell = r.getInt(0)
        next(cell) = Array.tabulate(dim)(i => r.getLong(i + 1))
      }
      cent = next
      round += 1
    }
    // exact v·centroid(cell) fingerprint for oracle-strength membership
    // checks: the final centroid matrix rides along as an array literal
    val centLit = typedlit(cent.toSeq.map(_.toSeq))
    assigned(cent)
      .withColumn("dot", graft.functions.VectorFunctions.dotLong(
        col("__v"), element_at(centLit, col("__cell") + 1)))
      .select(col("__id").as(idCol), col("__cell").as("cell"), col("dot"))
  }

  /**
   * C105: k-center greedy coreset selection (Gonzalez 1985 farthest-
   * point traversal — the classic coverage/data-pruning baseline, and
   * a 2-approximation of the optimal k-center cover): seed = the
   * minimum id; each round selects the point FARTHEST from the chosen
   * set (max min-distance², ties to the smallest id) and records the
   * coverage radius the selection certifies. Where [[lloydAssign]]
   * (C47) finds density centers, k-center finds COVERAGE extremes —
   * the points a pruned training set must keep so nothing is far from
   * everything.
   *
   * Scale shape: the quantized corpus persists once; each of the k−1
   * rounds is ONE map-side aggregate (`max(struct(minDist², ¬id, v))`)
   * over codegen'd integer dot products — the running min-distance is
   * a `least(...)` chain of exact `‖v‖² − 2·v·c + ‖c‖²` terms against
   * center LITERALS, so no join and no shuffle beyond the aggregate.
   * The winner's VECTOR rides the argmax struct (the (d, ¬id) prefix
   * is a unique key, so the array field never participates in the
   * comparison) — no per-round filter-scan fetches it back (r13
   * verdict #4: 2(k−1)+1 jobs → k jobs). If the max min-distance²
   * reaches 0 with rounds remaining, every point IS a center already
   * and selection stops early rather than re-picking a duplicate;
   * driver state is the k×D center matrix (KBs). The final assignment
   * (covered_n per center, nearest-center ties to the EARLIEST
   * selection — the [[graft.functions.NearestCells]] lower-index rule)
   * is one more aggregate; the returned k-row frame is a local
   * relation. Everything is exact integer arithmetic, so the DuckDB
   * replay unrolls the same greedy rounds as CTEs and hash-matches.
   */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      quantVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val spark = df.sparkSession
    val data = Scoped.persistTracked(
      df.select(col(idCol).as("__id"), col(quantVecCol).as("__v")))
    def dist2To(c: Array[Long]): Column = {
      val cNorm = c.map(x => x * x).sum
      graft.functions.VectorFunctions.dotLong(col("__v"), col("__v")) -
        lit(2L) * graft.functions.VectorFunctions.dotLong(
          col("__v"), typedlit(c.toSeq)) + lit(cNorm)
    }
    // seed = min id; its vector folds into the same one-job aggregate
    // (__id is unique, so __v never participates in the comparison)
    val seedRow = data.agg(min(struct(col("__id"), col("__v")))).head().getStruct(0)
    val seedId = seedRow.getLong(0)
    // the min-id tie-break encodes as max(−id): total for every Long
    // except MIN_VALUE, which −id maps to itself (advisor r13 finding)
    require(seedId != Long.MinValue, s"$idCol must exceed Long.MinValue")
    val selected = scala.collection.mutable.ArrayBuffer((seedId, 0L))
    val centers = scala.collection.mutable.ArrayBuffer(
      seedRow.getSeq[Long](1).toArray)
    var r = 2
    var exhausted = false
    while (r <= k && !exhausted) {
      val md = centers.map(dist2To).reduce((a, b) => least(a, b))
      // lexicographic struct max = max distance, then MIN id; the
      // winner's vector rides as payload (no vecOf re-scan)
      val pick = data
        .agg(max(struct(md.as("d"), (-col("__id")).as("ni"), col("__v").as("v"))))
        .head().getStruct(0)
      val (dist, cid) = (pick.getLong(0), -pick.getLong(1))
      if (dist == 0L) {
        // every point coincides with a chosen center: selecting again
        // would duplicate the min-id center (advisor r13 finding)
        exhausted = true
      } else {
        selected += ((cid, dist))
        centers += pick.getSeq[Long](2).toArray
        r += 1
      }
    }
    // final coverage: nearest center, ties to the earliest selection
    val pops = data
      .withColumn("__cell", element_at(graft.functions.NearestCells(
        col("__v").cast("array<double>"),
        centers.toArray.map(_.map(_.toDouble)), 1), 1))
      .groupBy("__cell").agg(count(lit(1)).as("n"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    val rows = selected.zipWithIndex.map { case ((cid, radius), i) =>
      org.apache.spark.sql.Row(
        (i + 1).toLong, cid, radius, pops.getOrElse(i, 0L))
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sel_round", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("center_id", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("radius_sq", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("covered_n", LongType, nullable = false))))
  }
}
