package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C121: train/eval split-leakage audit (Dedup.splitLeakage). */
class SplitLeakageSpec extends SparkSpec {

  import spark.implicits._

  /** The operator's split coin, replicated independently. */
  private def isTrain(id: Long, trainPpm: Int, seed: String = "split"): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$id".getBytes("UTF-8"))
    var v = 0L
    for (i <- 0 until 6) v = (v << 8) | (d(i) & 0xffL)
    v = (v << 4) | ((d(6) & 0xffL) >>> 4)
    v % 1000000L < trainPpm
  }

  test("each rung detects exactly its own leakage class") {
    val ppm = 500000
    // pick ids with KNOWN split sides from the real coin
    val ids = (1L to 200L)
    val train = ids.filter(isTrain(_, ppm))
    val eval = ids.filterNot(isTrain(_, ppm))
    assert(train.size >= 4 && eval.size >= 4)
    val (t1, t2, t3) = (train(0), train(1), train(2))
    val (e1, e2, e3, e4) = (eval(0), eval(1), eval(2), eval(3))
    val rows = Seq(
      (t1, "A", "alpha beta gamma delta epsilon zeta"),
      (e1, "A", "alpha beta gamma delta epsilon zeta"), // exact leak
      (t2, "A", "one two three four five six"),
      (e2, "A", "  ONE two THREE four five six !!!"),   // normalized leak
      (t3, "A", "p q r s t u v w x y"),
      (e3, "A", "p q r s t u v w x y zz qq"),           // near-dup leak (shared shingles)
      (e4, "B", "wholly unique evaluation document content here"))
    val out = Dedup.splitLeakage(rows.toDF("doc_id", "source", "text"),
        trainPpm = ppm)
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // source A has 3 eval docs; B has 1
    assert(out((0L, "A")) == ((3L, 1L)), s"exact: $out")   // only e1
    assert(out((1L, "A")) == ((3L, 2L)), s"norm: $out")    // e1 + e2
    // minhash works on RAW-text shingles: e1 (identical -> every band
    // collides) and e3 (near-dup -> shared shingles dominate the
    // slot mins) — but NOT e2, whose case-variant shingles hash apart;
    // the rungs are independent detectors, not a superset chain
    assert(out((2L, "A")) == ((3L, 2L)), s"minhash: $out")
    assert(out((0L, "B")) == ((1L, 0L)) && out((1L, "B")) == ((1L, 0L)) &&
      out((2L, "B")) == ((1L, 0L)), s"B never leaks: $out")
  }

  test("null-text twins across splits ARE leakage (sentinel length keys)") {
    // r17 advice: length(NULL) is NULL and the famEval⋈famTrain
    // equi-join drops null keys — the -1 sentinel must keep the
    // null-text family joinable so "identical empty content across
    // splits IS leakage" stays true for NULL as well as "".
    val ppm = 500000
    val ids = (1L to 200L)
    val train = ids.filter(isTrain(_, ppm))
    val eval = ids.filterNot(isTrain(_, ppm))
    val rows = Seq(
      (train(0), "A", null.asInstanceOf[String]), // null-text train twin
      (eval(0), "A", null.asInstanceOf[String]),  // null-text eval doc → leaked
      (eval(1), "A", "unique eval content that never leaks anywhere"))
    val out = Dedup.splitLeakage(rows.toDF("doc_id", "source", "text"),
        trainPpm = ppm)
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out((0L, "A")) == ((2L, 1L)), s"exact null leak: $out")
    assert(out((1L, "A")) == ((2L, 1L)), s"normalized null leak: $out")
    // null text has no shingles → no minhash candidates → not leaked there
    assert(out((2L, "A")) == ((2L, 0L)), s"minhash null: $out")
  }

  test("eval-only duplicates are NOT leakage; plan is window-free") {
    val ppm = 500000
    val eval = (1L to 100L).filterNot(isTrain(_, ppm))
    val df = Seq(
      (eval(0), "A", "same eval side duplicate text content"),
      (eval(1), "A", "same eval side duplicate text content")).toDF("doc_id", "source", "text")
    val out = Dedup.splitLeakage(df, trainPpm = ppm)
    assert(out.filter(col("leaked_docs") > 0).count() == 0)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }
}
