package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C66/C67 specs: perceptron training vs a driver-side replay of the
 * exact update rule (and linear separation on a clean corpus);
 * power-iteration dominant direction vs a driver-side integer replay
 * (and alignment with a planted dominant direction). */
class TrainingSpec extends SparkSpec {

  import spark.implicits._

  private def bucket(tok: String, features: Int): Int =
    (BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 13), 16) % features).toInt

  /** Driver-side replay of the exact batch-perceptron rule. */
  private def refPerceptron(
      rows: Seq[(Long, Long, Seq[String])], features: Int, rounds: Int)
      : Map[(Long, Long), (Long, Long)] = {
    val fv = rows.map { case (_, y, toks) =>
      val v = Array.fill(features)(0L)
      toks.foreach(t => v(bucket(t, features)) += 1L)
      (y, v)
    }
    var w = Array.fill(features)(0L)
    var b = 0L
    for (_ <- 1 to rounds) {
      val mis = fv.filter { case (y, v) =>
        y * (v.zip(w).map { case (a, c) => a * c }.sum + b) <= 0 }
      val dw = Array.tabulate(features)(i => mis.map { case (y, v) => y * v(i) }.sum)
      w = w.zip(dw).map { case (a, d) => a + d }
      b += mis.map(_._1).sum
    }
    fv.groupBy { case (y, v) =>
      val m = v.zip(w).map { case (a, c) => a * c }.sum + b
      (y, if (m > 0) 1L else 0L)
    }.map { case (k, docs) =>
      k -> (docs.size.toLong,
        docs.map { case (_, v) => v.zip(w).map { case (a, c) => a * c }.sum + b }.sum)
    }
  }

  test("C66: clean two-vocab corpus separates perfectly in 3 rounds") {
    // buckets: good=27 quality=19 / bad=9 spam=10 — no collisions at F=32
    val docs = ((0 until 40).map(i => (i.toLong, 1L, "good quality good")) ++
      (40 until 90).map(i => (i.toLong, -1L, "bad spam bad bad")))
      .toDF("doc_id", "y", "text")
    val got = Training.perceptron(docs, "doc_id", "text", "y", 32, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 40L, (-1L, 0L) -> 50L))
  }

  test("C66: confusion matrix matches the driver-side replay on noisy data") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "gamma", "zulu", "yankee", "xray",
      "good", "bad", "quality", "spam", "delta")
    val rows = (0 until 200).map { i =>
      val y = if (rnd.nextBoolean()) 1L else -1L
      val biased = if (y > 0) vocab.take(6) else vocab.drop(4)
      val toks = Seq.fill(3 + rnd.nextInt(8))(biased(rnd.nextInt(biased.size)))
      (i.toLong, y, toks)
    }
    val df = rows.map { case (id, y, t) => (id, y, t.mkString(" ")) }
      .toDF("doc_id", "y", "text")
    val got = Training.perceptron(df, "doc_id", "text", "y", 32, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == refPerceptron(rows, 32, 3))
  }

  test("C74 mostUncertain: bottom-k |margin| docs match the driver-side replay") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "gamma", "zulu", "yankee", "xray",
      "good", "bad", "quality", "spam", "delta")
    val rows = (0 until 150).map { i =>
      val y = if (rnd.nextBoolean()) 1L else -1L
      val biased = if (y > 0) vocab.take(6) else vocab.drop(4)
      (i.toLong, y, Seq.fill(3 + rnd.nextInt(8))(biased(rnd.nextInt(biased.size))))
    }
    val df = rows.map { case (id, y, t) => (id, y, t.mkString(" ")) }
      .toDF("doc_id", "y", "text")
    val got = Training.mostUncertain(df, "doc_id", "text", "y", 32, 3, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay: same loop as refPerceptron, but keep per-doc margins
    val features = 32
    val fv = rows.map { case (id, y, toks) =>
      val v = Array.fill(features)(0L)
      toks.foreach(t => v(bucket(t, features)) += 1L)
      (id, y, v)
    }
    var w = Array.fill(features)(0L)
    var b = 0L
    for (_ <- 1 to 3) {
      val mis = fv.filter { case (_, y, v) =>
        y * (v.zip(w).map { case (a, c) => a * c }.sum + b) <= 0 }
      val dw = Array.tabulate(features)(i => mis.map { case (_, y, v) => y * v(i) }.sum)
      w = w.zip(dw).map { case (a, d) => a + d }
      b += mis.map(_._2).sum
    }
    val want = fv.map { case (id, y, v) =>
      (id, y, v.zip(w).map { case (a, c) => a * c }.sum + b) }
      .sortBy { case (id, _, m) => (math.abs(m), id) }.take(10)
      .zipWithIndex.map { case ((id, y, m), i) => (i + 1, id, y, m) }
    assert(got.toSeq == want)
  }

  test("C96 matryoshkaRecall: exact per-prefix recall vs an independent replay; full dim is 1e6") {
    val dim = 8
    val rnd = new scala.util.Random(41)
    // tail dims carry most of the energy for half the vectors, so
    // prefix truncation genuinely reorders neighbors
    val vecs = Seq.tabulate(30) { i =>
      val head = Seq.fill(dim / 2)((rnd.nextInt(201) - 100).toLong)
      val tail = Seq.fill(dim / 2)(
        if (i % 2 == 0) (rnd.nextInt(2001) - 1000).toLong
        else (rnd.nextInt(21) - 10).toLong)
      (i.toLong, head ++ tail)
    }
    val dims = Seq(2, 4, 8); val k = 3; val nProbes = 4
    val got = Embeddings.matryoshkaRecall(
        vecs.toDF("vec_id", "qv"), "vec_id", "qv", dims, k, nProbes)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent replay
    def topK(m: Int): Map[Long, Seq[Long]] =
      (0L until nProbes.toLong).map { q =>
        val qa = vecs(q.toInt)._2.take(m)
        q -> vecs.filter(_._1 != q).map { case (id, v) =>
          val vb = v.take(m)
          val dot = qa.zip(vb).map { case (a, b) => a * b }.sum.toDouble
          val cos = dot / math.sqrt(
            qa.map(x => x * x).sum.toDouble * vb.map(x => x * x).sum.toDouble)
          (id, cos)
        }.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      }.toMap
    val full = topK(dim)
    dims.foreach { m =>
      val t = topK(m)
      val hits = (0L until nProbes.toLong)
        .map(q => t(q).count(full(q).contains)).sum.toLong
      val pairs = nProbes.toLong * k
      assert(got(m.toLong) == ((nProbes.toLong, pairs, hits, hits * 1000000L / pairs)),
        s"prefix $m: got ${got(m.toLong)}")
    }
    assert(got(dim.toLong)._4 == 1000000L, "full dimension must recall itself")
    assert(got(2L)._4 < 1000000L,
      "tail-heavy vectors must lose recall under aggressive truncation")
    intercept[IllegalArgumentException](Embeddings.matryoshkaRecall(
      vecs.toDF("vec_id", "qv"), "vec_id", "qv", Seq.empty))
    // pairs=0 inputs must refuse eagerly (r12 ADVICE): no probe ids
    // below nProbes, and a single-row corpus with no neighbors — both
    // would NULL recall_ppm in Spark while the oracle divides by zero
    intercept[IllegalArgumentException](Embeddings.matryoshkaRecall(
      vecs.map { case (id, v) => (id + 100L, v) }.toDF("vec_id", "qv"),
      "vec_id", "qv", dims, k, nProbes))
    intercept[IllegalArgumentException](Embeddings.matryoshkaRecall(
      vecs.take(1).toDF("vec_id", "qv"), "vec_id", "qv", dims, k, nProbes))
  }

  test("C75 jlProject: projections are the exact LCG-parity signed sums") {
    val dim = 16
    val rnd = new scala.util.Random(29)
    val vecs = Seq.tabulate(20)(i => (i.toLong, Seq.fill(dim)((rnd.nextInt(2001) - 1000).toLong)))
    val got = Embeddings.jlProject(vecs.toDF("id", "qv"), "id", "qv", dim, outDim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = (0 until 4).map { p =>
        val signs = graft.functions.VectorFunctions.arithPlaneWeights(p, dim)
        v.zip(signs).map { case (x, s) => x * s.toLong }.sum
      }
      assert(got(id) == want, s"vec $id projection mismatch")
    }
  }

  /** Driver-side replay of the exact power-iteration rule. */
  private def refTopComponent(vecs: Seq[Array[Long]], dim: Int, rounds: Int)
      : (Array[Long], Array[Long]) = {
    val n = vecs.size
    val means = Array.tabulate(dim)(i =>
      math.floor(vecs.map(_(i)).sum.toDouble / n).toLong)
    val xc = vecs.map(v => Array.tabulate(dim)(i => v(i) - means(i)))
    var w = Array.fill(dim)(Embeddings.Scale)
    var s = Array.fill(dim)(0L)
    for (_ <- 1 to rounds) {
      s = Array.tabulate(dim) { i =>
        xc.map(x => x.zip(w).map { case (a, c) => a * c }.sum * x(i)).sum
      }
      val m = BigInt(s.map(math.abs).max).max(BigInt(1))
      w = s.map(v => ((BigInt(v) * Embeddings.Scale) / m).toLong)
    }
    (w, s)
  }

  test("C67: component and final sums match the driver-side integer replay") {
    val rnd = new scala.util.Random(11)
    val dim = 8
    val vecs = Seq.fill(120)(Array.fill(dim)((rnd.nextInt(4001) - 2000).toLong))
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "qv")
    val got = Embeddings.topComponent(df, "id", "qv", dim, rounds = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (w, s) = refTopComponent(vecs, dim, 3)
    assert(got.map(_._1).toSeq == w.toSeq)
    assert(got.map(_._2).toSeq == s.toSeq)
  }

  test("C71: ablation stats match a driver-side integer replay") {
    val rnd = new scala.util.Random(31)
    val dim = 8
    val rows = Seq.tabulate(150)(i =>
      (i.toLong, (i % 3).toLong, Array.fill(dim)((rnd.nextInt(4001) - 2000).toLong)))
    val df = rows.map { case (id, lbl, v) => (id, lbl, v.toSeq) }
      .toDF("id", "lbl", "qv")
    val got = Embeddings.ablationStats(df, "id", "qv", "lbl", dim, rounds = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val vecs = rows.map(_._3)
    val (w, _) = refTopComponent(vecs, dim, 3)
    val n = vecs.size
    val means = Array.tabulate(dim)(i =>
      math.floor(vecs.map(_(i)).sum.toDouble / n).toLong)
    val want = rows.groupBy(_._2).map { case (lbl, rs) =>
      val stats = rs.map { case (_, _, v) =>
        val x = Array.tabulate(dim)(i => v(i) - means(i))
        val p = x.zip(w).map { case (a, c) => a * c }.sum / Embeddings.Scale
        (p, x.map(a => a * a).sum)
      }
      lbl -> (rs.size.toLong, stats.map { case (p, _) => math.abs(p) }.sum,
        stats.map { case (p, _) => math.abs(p) }.max,
        stats.map { case (p, _) => p * p / 1000 }.sum,
        stats.map(_._2).sum)
    }
    assert(got == want)
  }

  test("C71: a 1-sparse planted direction is fully explained") {
    // mean-zero values on dim 0 only: component = (Scale, 0, …),
    // p = x0 exactly, so sum_q·1000 == sum_x2 and max_abs_p = 100
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, (i % 2).toLong,
        Seq(if (i % 2 == 0) 100L else -100L) ++ Seq.fill(7)(0L)))
    val df = rows.toDF("id", "lbl", "qv")
    val got = Embeddings.ablationStats(df, "id", "qv", "lbl", dim = 8, rounds = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      0L -> (30L, 3000L, 100L, 300L, 300000L),
      1L -> (30L, 3000L, 100L, 300L, 300000L)))
  }

  test("C67: recovers a planted dominant direction") {
    val rnd = new scala.util.Random(23)
    val dim = 16
    val d = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -0.5)
    val vecs = Seq.fill(300) {
      val t = rnd.nextGaussian() * 1000
      Array.tabulate(dim)(i => (t * d(i) + rnd.nextGaussian() * 50).toLong)
    }
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "qv")
    val comp = Embeddings.topComponent(df, "id", "qv", dim, rounds = 3)
      .collect().map(_.getLong(1).toDouble)
    val cos = math.abs(comp.zip(d).map { case (a, b) => a * b }.sum) /
      (math.sqrt(comp.map(x => x * x).sum) * math.sqrt(d.map(x => x * x).sum))
    assert(cos > 0.98, s"cosine with planted direction was $cos")
  }

  test("C104: centered-centroid classifier separates marked classes exactly") {
    // three classes sharing a noise vocabulary; each doc carries its
    // class marker -> centering cancels the shared direction and the
    // marker presence decides every prediction
    val docs = (0 until 30).map { i =>
      val cls = Seq("aa", "bb", "cc")(i % 3)
      (i.toLong, s"the quick brown fox tok$i mark_$cls", cls)
    }.toDF("doc_id", "text", "lang")
    val out = Training.centroidClassifier(docs, "doc_id", "text", "lang",
      features = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4))).toSeq
    assert(out == Seq(("aa", "aa", 10L, 10L), ("bb", "bb", 10L, 10L),
      ("cc", "cc", 10L, 10L)))
    spark.catalog.clearCache()
  }

  test("C104: identical classes tie to the lowest class name; label_docs exact") {
    // both classes have the SAME single text -> all weights zero ->
    // every score ties -> argmax first occurrence = class "a"
    val docs = Seq((0L, "m", "a"), (1L, "m", "b")).toDF("doc_id", "text", "lang")
    val out = Training.centroidClassifier(docs, "doc_id", "text", "lang",
      features = 16)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(("a", "a", 1L, 0L, 1L), ("b", "a", 1L, 0L, 1L)))
    spark.catalog.clearCache()
  }

  test("C104: weights match an independent local replay, score fingerprints included") {
    val rows = Seq(
      (0L, "x y mark_p", "p"), (1L, "x z mark_p", "p"),
      (2L, "y z mark_q", "q"), (3L, "x mark_q extra", "q"), (4L, "z odd", "p"))
    val F = 32
    val out = Training.centroidClassifier(
        rows.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang", features = F)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // independent replay: own tokenizer/bucketing/means/argmax
    def bucket(t: String): Int = (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t).substring(0, 13),
      16) % F).toInt
    val classes = rows.map(_._3).distinct.sorted
    val fvs = rows.map { case (_, t, l) =>
      val fv = new Array[Long](F)
      t.trim.split("\\s+").toSet[String].foreach(tok => fv(bucket(tok)) = 1L)
      (l, fv)
    }
    val n = classes.map(c => fvs.count(_._1 == c)).toArray
    val cs = classes.zipWithIndex.map { case (c, ci) =>
      Array.tabulate(F)(i => fvs.filter(_._1 == c).map(_._2(i)).sum)
    }
    val as = Array.tabulate(F)(i => fvs.map(_._2(i)).sum)
    val w = classes.indices.map(ci => Array.tabulate(F)(i =>
      cs(ci)(i) * 1000L / n(ci) - as(i) * 1000L / fvs.length))
    val expect = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    fvs.foreach { case (l, fv) =>
      val scores = classes.indices.map(ci =>
        (0 until F).map(i => fv(i) * w(ci)(i)).sum)
      val p = scores.indices.minBy(ci => (-scores(ci), ci))
      val k = (l, classes(p))
      val (n0, s0) = expect.getOrElse(k, (0L, 0L))
      expect(k) = (n0 + 1L, s0 + scores(p))
    }
    assert(out == expect.toMap)
    spark.catalog.clearCache()
  }
}
