package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions.quantize
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization primitives + IVF-PQ end-to-end against naive
 * driver-side recomputations. */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val dim = 12
  private val m = 4 // sub = 3
  private val ks = 3

  private def vec(): Array[Long] = Array.fill(dim)(rng.nextInt(200).toLong - 100)

  private val cbRows = Array.fill(ks)(vec())
  private val sub = (dim + m - 1) / m
  private val cb: Array[Array[Array[Long]]] = Array.tabulate(m) { j =>
    cbRows.map(_.slice(j * sub, math.min((j + 1) * sub, dim)))
  }

  private def naiveL2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def naiveCodes(v: Array[Long]): Array[Int] =
    (0 until m).map { j =>
      val s = v.slice(j * sub, math.min((j + 1) * sub, dim))
      cb(j).zipWithIndex.minBy { case (c, i) => (naiveL2(s, c), i) }._2
    }.toArray

  test("PqCodes / PqAdcTable / PqTableDist match naive recomputation") {
    val vs = (0 until 50).map(i => (i.toLong, vec()))
    val df = vs.toDF("id", "v")
      .withColumn("codes", PqCodes(col("v"), cb))
      .withColumn("adc", PqAdcTable(col("v"), cb))
    val got: Map[Long, (Array[Int], Array[Long])] = df.select("id", "codes", "adc").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toArray, r.getSeq[Long](2).toArray))).toMap
    for ((id, v) <- vs) {
      val (codes, adc) = (got(id)._1, got(id)._2)
      assert(codes.sameElements(naiveCodes(v)), s"codes mismatch for $id")
      for (j <- 0 until m; c <- 0 until ks) {
        val s = v.slice(j * sub, math.min((j + 1) * sub, dim))
        assert(adc(j * ks + c) == naiveL2(s, cb(j)(c)), s"adc mismatch $id $j $c")
      }
    }
    // tableDist = sum of the query's table entries at the codes
    val pair = vs.toDF("id", "v")
      .withColumn("adc", PqAdcTable(col("v"), cb))
      .crossJoin(vs.take(3).toDF("id2", "v2").withColumn("codes", PqCodes(col("v2"), cb)))
      .withColumn("ad", PqTableDist(col("adc"), col("codes"), ks))
      .select("id", "id2", "ad").collect()
    val vmap = vs.toMap
    pair.foreach { r =>
      val (q, x) = (vmap(r.getLong(0)), vmap(r.getLong(1)))
      val expect = naiveCodes(x).zipWithIndex.map { case (c, j) =>
        naiveL2(q.slice(j * sub, math.min((j + 1) * sub, dim)), cb(j)(c))
      }.sum
      assert(r.getLong(2) == expect)
    }
  }

  test("ivfPqTopKSeeded end-to-end matches a naive driver reimplementation") {
    val n = 120
    val data = (0 until n).map { i =>
      (i.toLong, Array.fill(16)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val (nSeeds, probes, mm, kks, depth, k) = (8, 2, 4, 8, 12, 3)
    val got = Similarity.ivfPqTopKSeeded(df, df.filter(col("vec_id") < 4),
        "vec_id", "qv", k = k, nSeeds = nSeeds, probes = probes, m = mm, ks = kks,
        rerankDepth = depth)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    // naive replay
    val qv = data.map { case (id, e) => id -> e.map(x => math.floor(x * 1000).toLong) }.toMap
    val d16 = 16
    val sb = (d16 + mm - 1) / mm
    val cbN: Array[Array[Array[Long]]] = Array.tabulate(mm) { j =>
      (0 until kks).map(i => qv(i.toLong).slice(j * sb, math.min((j + 1) * sb, d16))).toArray
    }
    val cmatN = (0 until nSeeds).map(i => qv(i.toLong).map(_.toDouble)).toArray
    def cellsOf(v: Array[Long], p: Int): Seq[Int] =
      cmatN.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2, i)
      }.sortBy { case (s, i) => (-s, i) }.take(p).map(_._2).toSeq
    def codesOf(v: Array[Long]): Array[Int] = (0 until mm).map { j =>
      val s = v.slice(j * sb, math.min((j + 1) * sb, d16))
      cbN(j).zipWithIndex.minBy { case (c, i) => (naiveL2(s, c), i) }._2
    }.toArray
    val assignN = data.map { case (id, _) => id -> cellsOf(qv(id), 1).head }.toMap
    val expect = (0L until 4L).flatMap { q =>
      val probed = cellsOf(qv(q), probes).toSet
      val cand = data.map(_._1).filter(x => x != q && probed.contains(assignN(x)))
      val ad = cand.map { x =>
        val cs = codesOf(qv(x))
        val d = cs.zipWithIndex.map { case (c, j) =>
          naiveL2(qv(q).slice(j * sb, math.min((j + 1) * sb, d16)), cbN(j)(c))
        }.sum
        (x, d)
      }.sortBy { case (x, d) => (d, x) }.take(depth)
      val cos = ad.map { case (x, _) =>
        val (a, b) = (qv(q), qv(x))
        val c = a.zip(b).map { case (p1, p2) => p1 * p2 }.sum.toDouble /
          math.sqrt(a.map(p => p * p).sum.toDouble * b.map(p => p * p).sum.toDouble)
        (x, c)
      }.sortBy { case (x, c) => (-c, x) }.take(k)
      cos.zipWithIndex.map { case ((x, _), r) => (q, x, r + 1) }
    }
    assert(got.toSeq == expect)
  }
}
