package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C62 incremental near-dup, C63 calibration bins, C64 corpus drift:
 * controlled-corpus identity checks and hand-computed arithmetic. */
class SnapshotOpsSpec extends SparkSpec {

  import spark.implicits._

  test("C62: a mutated copy matches exactly its origin; novels match nothing") {
    val old = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "red orange yellow green blue")).toDF("doc_id", "text")
    val nu = Seq(
      (10L, "alpha beta gamma delta epsilon alpha"), // near-dup of 1
      (11L, "totally disjoint vocabulary here now")).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(old, nu, "doc_id", "text", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(10L -> 1L, 11L -> -1L))
  }

  test("C62: ties resolve to the smallest old id, with its OWN jaccard") {
    // docs 5 and 7 have identical word sets; the new doc matches both
    val old = Seq(
      (7L, "alpha beta gamma delta"),
      (5L, "beta alpha delta gamma")).toDF("doc_id", "text")
    val nu = Seq((20L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r = Dedup.incrementalNearDup(old, nu, "doc_id", "text",
      threshold = 0.5, shingleSize = 1).collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 1.0)
  }

  test("C62: maxBucketSize drops boilerplate buckets on the old side") {
    val boiler = (1L to 30L).map(i => (i, "same boilerplate text repeated verbatim here"))
      .toDF("doc_id", "text")
    val nu = Seq((100L, "same boilerplate text repeated verbatim here"))
      .toDF("doc_id", "text")
    val capped = Dedup.incrementalNearDup(boiler, nu, "doc_id", "text",
      threshold = 0.9, maxBucketSize = 5).collect().head
    assert(capped.isNullAt(1), "oversized old buckets must be dropped under the cap")
    val uncapped = Dedup.incrementalNearDup(boiler, nu, "doc_id", "text",
      threshold = 0.9).collect().head
    assert(uncapped.getLong(1) == 1L)
  }

  test("C63: hand-computed bins, rates, and floor means (negative scores)") {
    // scores -5..2 (range 8, bins 4 → width 2), label = score >= 0
    val df = Seq(-5L, -4L, -3L, -2L, -1L, 0L, 1L, 2L)
      .map(s => (s, if (s >= 0) 1L else 0L)).toDF("s", "y")
    val m = Evaluation.calibrationBins(df, "s", "y", bins = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bin 0: {-5,-4} n=2 pos=0 mean=floor(-9/2)=-5 (floor, NOT trunc -4)
    assert(m(0L) == ((2L, 0L, 0L, -5L)))
    assert(m(1L) == ((2L, 0L, 0L, -3L)))
    assert(m(2L) == ((2L, 1L, 500000L, -1L)))
    assert(m(3L) == ((2L, 2L, 1000000L, 1L)))
  }

  test("C63: top bin absorbs the max score (least clamp)") {
    val df = Seq((0L, 0L), (9L, 1L), (10L, 1L)).toDF("s", "y")
    val m = Evaluation.calibrationBins(df, "s", "y", bins = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 1L, 1L -> 2L))
  }

  test("C65: PR curve matches a brute-force threshold sweep") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((rnd.nextInt(40).toLong - 10L, rnd.nextInt(2).toLong))
    val expected = rows.map(_._1).distinct.map { th =>
      val admitted = rows.filter(_._1 >= th)
      val tp = admitted.count(_._2 == 1L).toLong
      val fp = admitted.size - tp
      val tpos = rows.count(_._2 == 1L).toLong
      th -> (tp, fp, tp * 1000000L / (tp + fp), tp * 1000000L / tpos)
    }.toMap
    val got = Evaluation.prCurve(rows.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("C65: perfect separation reaches precision 1.0 at full recall") {
    val df = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y")
    val at9 = Evaluation.prCurve(df, "s", "y")
      .filter(col("threshold") === 9L).collect().head
    assert(at9.getLong(3) == 1000000L && at9.getLong(4) == 1000000L)
  }

  test("C64: hand-computed drift row") {
    val old = Seq((1L, "a a b")).toDF("doc_id", "text")
    val nu = Seq((1L, "a b c c")).toDF("doc_id", "text")
    val r = CorpusPipeline.corpusDrift(old, nu).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 4L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 3L, 2L)))
    // tv: a |666666-250000| + b |333333-250000| + c |0-500000| = 999999
    assert(r.getLong(5) == 999999L)
    assert(r.getLong(6) == 500000L) // new mass: c
    assert(r.getLong(7) == 0L)
  }

  test("C64: identical snapshots drift zero") {
    val docs = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val r = CorpusPipeline.corpusDrift(docs, docs).collect().head
    assert(r.getLong(5) == 0L && r.getLong(6) == 0L && r.getLong(7) == 0L)
    assert(r.getLong(2) == r.getLong(4)) // old_vocab == shared_vocab
  }
}
