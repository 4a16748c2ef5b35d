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
}
