package graft.streaming

import graft.functions.VectorFunctions.dotLong
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/**
 * D10: online similarity search — a STREAM of query vectors served
 * against a static corpus (SURVEY.md §2; the streaming face of C7b).
 * The production shape: an ingest/serving pipeline looks up nearest
 * neighbors for each arriving item (dedup-at-ingest, retrieval, cluster
 * routing) without re-batching the corpus.
 *
 * Plan: the corpus side is STATIC — cell-assigned once with the same
 * deterministic sampled-seed IVF as [[graft.operators.Similarity.ivfTopKSeeded]]
 * (first `nSeeds` ids are the centroids; affinity 2·v·c − ‖c‖², exact
 * in double for integer-quantized vectors). Each arriving query
 * explodes to its `probes` nearest cells and equi-joins the corpus
 * cells — a stateless stream-static join, costing exactly the batch
 * plan per micro-batch. Top-k is a per-query flatMapGroups pass (state
 * unused: a query's candidates are all produced in the micro-batch of
 * its arrival, by construction of the join).
 *
 * Determinism: every number is the same integer math as the batch
 * operator, so the streamed results hash-match the SAME DuckDB oracle
 * as q_c7b — batch/stream parity for the whole ANN path.
 */
object AnnStream {

  def ivfServe(
      queryStream: DataFrame,
      corpus: DataFrame,
      idCol: String,
      quantVecCol: String,
      k: Int,
      nSeeds: Int = 16,
      probes: Int = 2): Dataset[AnnResult] = {
    import queryStream.sparkSession.implicits._
    val cmat: Array[Array[Double]] = corpus
      .filter(col(idCol) < nSeeds).orderBy(idCol)
      .select(col(quantVecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cmat.nonEmpty, s"no seed rows with $idCol < $nSeeds")
    def cells(v: Column, p: Int): Column =
      graft.functions.NearestCells(v.cast("array<double>"), cmat, p)
    val c = corpus.select(
        col(idCol).as("neighbor_id"), col(quantVecCol).as("__cv"),
        dotLong(col(quantVecCol), col(quantVecCol)).as("__ncv"))
      .withColumn("__cell", element_at(cells(col("__cv"), 1), 1))
    val q = queryStream.select(
        col(idCol).as("query_id"), col(quantVecCol).as("__qv"),
        dotLong(col(quantVecCol), col(quantVecCol)).as("__nqv"))
      .withColumn("__cell", explode(cells(col("__qv"), probes)))
    val scored = q.join(c, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotLong(col("__qv"), col("__cv")).cast("double") /
          sqrt(col("__nqv").cast("double") * col("__ncv").cast("double")))
          .as("cosine"))
      .as[AnnCandidate]
    scored
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (qid: Long, batch: Iterator[AnnCandidate], state: GroupState[Int]) => {
          // state intentionally unused — candidates are batch-complete;
          // the signature is what Structured Streaming requires for a
          // per-key pass in append mode
          batch.toVector
            .sortBy(cand => (-cand.cosine, cand.neighbor_id))
            .take(k).iterator.zipWithIndex
            .map { case (cand, i) => AnnResult(qid, cand.neighbor_id, cand.cosine, i + 1) }
        })
  }

  /**
   * D20: streaming IVF growth monitor — the ingest-side twin of the
   * batch index-maintenance audit (C81), closing the IVF lifecycle
   * (C7b builds, D10 serves, C81 audits a snapshot, THIS watches the
   * index grow): every arriving vector routes to its nearest seeded
   * cell (the same stateless codegen pass as serving), and a per-cell
   * counter emits a GROWTH EVENT each time the cell's population
   * crosses a power of two — the standard exponential-ledger contract
   * that yields O(log n) events per cell, enough to reconstruct every
   * cell's growth curve and spot a runaway cell long before a batch
   * audit would run, without per-vector output.
   *
   * State: ONE long per cell, at most `nSeeds` keys — the smallest
   * possible keyed-state footprint; no watermark needed (counters are
   * monotone and never expire). Determinism for the oracle: within a
   * micro-batch the group's rows are processed in vec_id order, so a
   * harness feeding vec_id-sorted chunks makes the n-th arrival of a
   * cell the n-th smallest vec_id — the crossing events are then a
   * pure function of the data and the DuckDB oracle replays them with
   * a row_number over the batch assignment.
   */
  def ivfGrowthMonitor(
      vecStream: DataFrame,
      seeds: DataFrame,
      idCol: String,
      quantVecCol: String,
      nSeeds: Int = 16): Dataset[GrowthEvent] = {
    import vecStream.sparkSession.implicits._
    val cmat: Array[Array[Double]] = seeds
      .filter(col(idCol) < nSeeds).orderBy(idCol)
      .select(col(quantVecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(cmat.length == nSeeds,
      s"expected $nSeeds seed rows with $idCol < $nSeeds, found ${cmat.length}")
    vecStream
      .select(
        element_at(graft.functions.NearestCells(
          col(quantVecCol).cast("array<double>"), cmat, 1), 1).as("cell"),
        col(idCol).as("vec_id"))
      .as[RoutedVec]
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (cell: Int, batch: Iterator[RoutedVec], state: GroupState[Long]) => {
          var cnt = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[GrowthEvent]
          batch.toVector.sortBy(_.vec_id).foreach { v =>
            cnt += 1L
            if (cnt >= 2L && (cnt & (cnt - 1L)) == 0L)
              out += GrowthEvent(cell, cnt, v.vec_id)
          }
          state.update(cnt)
          out.result().iterator
        })
  }
}

/** One query vector row for driver-fed streaming harnesses (D10). */
final case class QueryVec(vec_id: Long, qv: Seq[Long])

/** One scored (query, neighbor) candidate inside the stream (D10). */
final case class AnnCandidate(query_id: Long, neighbor_id: Long, cosine: Double)

/** One served neighbor: query, neighbor, exact cosine, 1-based rank (D10). */
final case class AnnResult(query_id: Long, neighbor_id: Long, cosine: Double, rank: Int)

/** One cell-routed vector inside the growth monitor (D20). */
final case class RoutedVec(cell: Int, vec_id: Long)

/** One power-of-two population crossing: the cell hit `level` members
 * when `vec_id` arrived (D20). */
final case class GrowthEvent(cell: Int, level: Long, vec_id: Long)
