package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C57 PageRank: hand-computed fixed-point arithmetic on known graphs,
 * edge-dedup invariance, dangling-mass decay. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("C57: two-node cycle is the exact fixed point 1000000") {
    // A→B→A: r' = 150000 + 85·r div 100; r=1000000 maps to itself.
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("C57: chain A→B — dangling mass decays by hand-computed steps") {
    // iter1: A=150000 (no in-edges), B=150000+850000=1000000
    // iter2: B=150000 + 85·(150000 div 1) div 100 = 277500
    val r1 = ranks(Seq((1L, 2L)), 1)
    assert(r1 == Map(1L -> 150000L, 2L -> 1000000L))
    val r2 = ranks(Seq((1L, 2L)), 2)
    assert(r2 == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("C57: duplicate edges collapse — repeating the list changes nothing") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(ranks(e, 3) == ranks(e ++ e ++ e, 3))
  }

  test("C57: out-degree split — a 2-out node halves its contribution") {
    // A→B, A→C: iter1 B = C = 150000 + 85·(1000000 div 2) div 100
    val r = ranks(Seq((1L, 2L), (1L, 3L)), 1)
    assert(r(2L) == 150000L + 85L * 500000L / 100L)
    assert(r(2L) == r(3L))
  }

  test("C57: matches a driver-side dense replay on a random 40-node graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val dedup = edges.distinct
    val nodes = (dedup.map(_._1) ++ dedup.map(_._2)).distinct
    val outdeg = dedup.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      dedup.foreach { case (s, d) => in(d) += rank(s) / outdeg(s) }
      rank = nodes.map(n => n -> (150000L + 85L * in(n) / 100L)).toMap
    }
    assert(ranks(edges, 3) == rank)
  }

  test("C57: hub with in-links accumulates proportionally to in-degree") {
    val spokes = (2L to 6L).map(i => (i, 1L))
    val r = ranks(spokes, 1)
    // 5 spokes each contribute their full 1000000
    assert(r(1L) == 150000L + 85L * 5000000L / 100L)
    assert((2L to 6L).forall(r(_) == 150000L))
  }
}
