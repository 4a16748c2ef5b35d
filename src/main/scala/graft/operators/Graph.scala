package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/**
 * C57: link-graph authority scoring — PageRank over an edge list.
 *
 * In a 100 TB crawl pipeline the host/domain link graph ranks sources
 * for crawl prioritization and quality weighting (the "domain
 * authority" feature most quality classifiers consume). The reference
 * engine has no graph surface; this is the Spark-native shape of the
 * operation: the edge list is the only big dataset, it is normalized
 * ONCE (distinct edges + out-degree attached, persisted, partitioned
 * by source), and every PageRank round is one shuffle of slim
 * `(node, rank)` pairs joined against that stable edge partitioning.
 * The driver holds nothing but the loop counter — no per-node state,
 * no collect.
 *
 * Determinism: ranks are fixed-point longs (`scale` = 1.0). Each round
 * computes `rank' = (100-dampPct)% · scale + dampPct% · Σ_in
 * floor(rank_src / outdeg_src)` in integer arithmetic (floor division
 * both Spark's `div` and DuckDB's `//` reproduce bit-for-bit), so a
 * SQL oracle can replay every round exactly. Dangling-node mass decays
 * (the standard simplified formulation — deterministic in both
 * engines).
 */
object Graph {

  /**
   * PageRank over `edges(srcCol, dstCol)`. Returns `(node, rank)` where
   * rank is the fixed-point score after `iters` rounds from a uniform
   * `scale` start. Duplicate edges collapse first (link counts don't
   * multiply authority); self-loops are kept (they feed a node's own
   * rank back, deterministically).
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"), col(dstCol).cast(LongType).as("dst"))
      .distinct()
    // Out-degree rides WITH each edge so a round is edge⋈rank only —
    // attaching it per round would add a second join. Persist: every
    // round (and the node seed) re-reads this; at real scale this is
    // the one materialization the algorithm owns.
    // No eager count() pin here: unlike sourceDivergence's four
    // broadcast-racing consumers inside ONE action, every consumer of
    // eDeg below is its own sequential job (the nodes checkpoint runs
    // first and populates the cache) — the pin would just be one extra
    // full pass.
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .transform(Scoped.persistTracked)

    // Iterative-DataFrame rule (the connectedComponents lesson): ranks
    // feed two plan branches per round, so the LOGICAL plan grows
    // multiplicatively per iteration if merely composed (33 scan
    // references at 3 rounds, analyzer stall at 20) — truncate lineage
    // every round (localCheckpoint → LogicalRDD) and release the
    // previous round's blocks once the next is materialized.
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val base = (100L - dampPct) * scale / 100L
    // rank₀ is a constant column over the nodes checkpoint — deriving
    // it lazily costs nothing extra; checkpointing it would be a
    // whole redundant materialization job.
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div outdeg")).as("in_mass"))
      val next0 = nodes
        .join(contrib, Seq("node"), "left")
        .withColumn("rank",
          lit(base) + expr(s"$dampPct * coalesce(in_mass, 0L) div 100"))
        .select("node", "rank")
      // The LAST round returns lazy (r19): its eager localCheckpoint
      // was a whole redundant materialization — the caller's single
      // action computes the same one-join plan over the (still
      // checkpointed) previous ranks, which therefore must NOT be
      // unpersisted under a lazy tail.
      if (i < iters) {
        val next = next0.localCheckpoint(true)
        ranks.unpersist(blocking = false)
        ranks = next
      } else ranks = next0
    }
    ranks
  }
}
