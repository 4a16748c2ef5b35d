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
}
