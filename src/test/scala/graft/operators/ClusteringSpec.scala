package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions.quantize
import org.apache.spark.sql.functions._

/** Lloyd k-means against a naive driver-side replay of the exact loop
 * contract (seeded init, 2·dot−‖c‖² argmax with low-cell ties, per-dim
 * floor-avg updates, empty cells keep their centroid). */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("lloydAssign matches a naive replay; empty cells keep centroids") {
    val rng = new scala.util.Random(11)
    val dim = 10
    val n = 80
    val data = (0 until n).map(i => (i.toLong, Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)))
    val df = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val (k, rounds) = (5, 3)
    val got = Clustering.lloydAssign(df, "vec_id", "qv", k, rounds)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val qv = data.map { case (id, e) => id -> e.map(x => math.floor(x * 1000).toLong) }.toMap
    var cent: Array[Array[Long]] = (0 until k).map(i => qv(i.toLong)).toArray
    def assign(v: Array[Long], cs: Array[Array[Long]]): Int =
      cs.zipWithIndex.maxBy { case (c, i) =>
        (2L * v.zip(c).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum, -i)
      }._2
    for (_ <- 1 until rounds) {
      val cells = data.map { case (id, _) => id -> assign(qv(id), cent) }.toMap
      val next = cent.map(_.clone())
      for (c <- 0 until k) {
        val members = data.map(_._1).filter(cells(_) == c)
        if (members.nonEmpty)
          next(c) = Array.tabulate(cent(0).length) { d =>
            math.floor(members.map(id => qv(id)(d)).sum.toDouble / members.size).toLong
          }
      }
      cent = next
    }
    val expect = data.map { case (id, _) =>
      val cell = assign(qv(id), cent)
      (id, cell, qv(id).zip(cent(cell)).map { case (a, b) => a * b }.sum)
    }
    assert(got.toSeq == expect)
    // empty-cell path: k > distinct points forces empty cells
    val tiny = data.take(6).toDF("vec_id", "embedding")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val cellsTiny = Clustering.lloydAssign(tiny, "vec_id", "qv", 6, 2)
    assert(cellsTiny.count() == 6)
  }

  test("C105: k-center greedy picks farthest points with exact radii and coverage") {
    import spark.implicits._
    // points on a line: 0,(0) 1,(10) 2,(4) 3,(10.1ish→[10,1]) — seed is
    // min id, then farthest-first: id3 (101), id2 (16), id1 (1)
    val pts = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(4L, 0L)), (3L, Seq(10L, 1L)))
      .toDF("vec_id", "qv")
    val out = Clustering.kCenterGreedy(pts, "vec_id", "qv", k = 4)
      .orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 1L), (2L, 3L, 101L, 1L), (3L, 2L, 16L, 1L), (4L, 1L, 1L, 1L)))
    spark.catalog.clearCache()
  }

  test("C105: selection ties go to the smallest id; coverage ties to the earliest center") {
    import spark.implicits._
    // id1 and id3 both at dist² 4 from the seed → min id (1) selected;
    // id2 equidistant (1) between centers id0 (round 1) and id1
    // (round 2) → covered by the EARLIEST selection
    val pts = Seq(
      (0L, Seq(0L)), (1L, Seq(2L)), (2L, Seq(1L)), (3L, Seq(-2L)))
      .toDF("vec_id", "qv")
    val out = Clustering.kCenterGreedy(pts, "vec_id", "qv", k = 2)
      .orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // coverage: id0 covers itself + id2 (tie) + id3 (dist 4 vs 16) = 3
    assert(out == Seq((1L, 0L, 0L, 3L), (2L, 1L, 4L, 1L)))
    spark.catalog.clearCache()
  }

  test("C105: k beyond distinct vectors stops early instead of duplicating a center") {
    import spark.implicits._
    // only two distinct vectors: rounds select id0 then id1; round 3's
    // max min-distance² is 0 → selection stops (no duplicate center)
    val pts = Seq(
      (0L, Seq(0L)), (1L, Seq(5L)), (2L, Seq(0L)), (3L, Seq(5L)))
      .toDF("vec_id", "qv")
    val out = Clustering.kCenterGreedy(pts, "vec_id", "qv", k = 4)
      .orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 0L, 0L, 2L), (2L, 1L, 25L, 2L)))
    spark.catalog.clearCache()
  }

  test("C105: negative ids select correctly (no tie-break overflow)") {
    import spark.implicits._
    val pts = Seq((-3L, Seq(0L)), (-1L, Seq(7L)), (4L, Seq(3L)))
      .toDF("vec_id", "qv")
    val out = Clustering.kCenterGreedy(pts, "vec_id", "qv", k = 3)
      .orderBy("sel_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // seed −3 (vec 0); farthest −1 (49); then 4 at min(9, 16) = 9
    assert(out == Seq((1L, -3L, 0L, 1L), (2L, -1L, 49L, 1L), (3L, 4L, 9L, 1L)))
    spark.catalog.clearCache()
  }

  test("C105: winner vector rides the argmax — k+1 jobs, no per-round vecOf re-scan") {
    import spark.implicits._
    val pts = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)), (2L, Seq(4L, 0L)), (3L, Seq(10L, 1L)))
      .toDF("vec_id", "qv")
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Clustering.kCenterGreedy(pts, "vec_id", "qv", k = 4)
      assert(out.collect().length == 4) // local relation: no extra job
      // listener delivery is async — wait for the count to settle
      val deadline = System.currentTimeMillis + 5000
      var last = -1
      while (System.currentTimeMillis < deadline && n.get() != last) {
        last = n.get(); Thread.sleep(200)
      }
      // ceiling measured 2026-08-15: 11 jobs under AQE (each of the
      // k = 4 aggregates materializes as 2 jobs, coverage adds 3);
      // the r13 vecOf shape paid k more filter-scan jobs on top — a
      // count above the pin means a per-round re-scan crept back
      assert(n.get() <= 11, s"expected ≤ 11 jobs (k+1 aggregates), saw ${n.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }
}
