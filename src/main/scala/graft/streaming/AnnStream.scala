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
}

/** One query vector row for driver-fed streaming harnesses (D10). */
final case class QueryVec(vec_id: Long, qv: Seq[Long])

/** One scored (query, neighbor) candidate inside the stream (D10). */
final case class AnnCandidate(query_id: Long, neighbor_id: Long, cosine: Double)

/** One served neighbor: query, neighbor, exact cosine, 1-based rank (D10). */
final case class AnnResult(query_id: Long, neighbor_id: Long, cosine: Double, rank: Int)
