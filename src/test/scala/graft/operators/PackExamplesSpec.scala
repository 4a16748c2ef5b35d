package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C119: packed-example assembly (CorpusPipeline.packExamples) —
 * layout checked against an independent driver-side replay of the
 * md5-ordered concat packing. */
class PackExamplesSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (seq_no -> (filled, nStarts, carry, offsets, digestString)) by
   * direct simulation of the packing contract. */
  private def replay(lens: Map[Long, Long], L: Long):
      Map[Long, (Long, Long, Long, Seq[Long], String)] = {
    // the operator orders by the 52-bit md5 prefix (8-byte shuffle
    // keys), id tiebreak — replay the same order
    val order = lens.keys.toSeq.sortBy(id =>
      (java.lang.Long.parseLong(md5hex("graft" + id).substring(0, 13), 16), id))
    var acc = 0L
    val perSeq = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Vector[(Long, Long)])]
    for (id <- order; t = lens(id); if t > 0) {
      val start = acc; val end = acc + t - 1; acc += t
      for (s <- (start / L) to (end / L)) {
        val c = math.min(end, (s + 1) * L - 1) - math.max(start, s * L) + 1
        val isStart = start / L == s
        val (f, ns, cr, offs) = perSeq.getOrElse(s, (0L, 0L, 0L, Vector.empty[(Long, Long)]))
        perSeq(s) = (f + c, ns + (if (isStart) 1 else 0),
          cr + (if (isStart) 0 else c),
          if (isStart) offs :+ ((start % L, id)) else offs)
      }
    }
    perSeq.map { case (s, (f, ns, cr, offs)) =>
      val sortedOffs = offs.sortBy(identity)
      s -> (f, ns, cr, sortedOffs.map(_._1),
        md5hex(sortedOffs.map(o => s"${o._1}:${o._2}").mkString(" ")))
    }.toMap
  }

  test("layout matches an independent replay, boundary digest included") {
    val lens = Map(1L -> 7L, 2L -> 3L, 3L -> 25L, 4L -> 1L, 5L -> 10L,
      6L -> 4L, 7L -> 9L, 8L -> 0L) // id 8: zero-length, dropped
    val df = lens.toSeq.toDF("doc_id", "ex_tokens")
    val out = CorpusPipeline.packExamples(df, seqLen = 10, seqsPerShard = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4),
        r.getLong(6), r.getSeq[Long](7), r.getString(8), r.getLong(1),
        r.getLong(3), r.getBoolean(5)))).toMap
    val exp = replay(lens, 10)
    assert(out.keySet == exp.keySet)
    for ((s, (f, ns, cr, offs, dig)) <- exp) {
      val (of, ons, ocr, ooffs, odig, shard, pad, mid) = out(s)
      assert(of == f && ons == ns && ocr == cr, s"seq $s counts")
      assert(ooffs == offs, s"seq $s offsets")
      assert(odig == dig, s"seq $s digest")
      assert(shard == s / 2 && pad == 10 - f, s"seq $s shard/pad")
      // the straddle MARK: a sequence whose head continues an earlier
      // example must say so, and only then
      assert(mid == (cr > 0), s"seq $s starts_mid")
    }
    // concat packing: every sequence except the last is exactly full,
    // total fill equals total example mass, every example starts once
    val total = lens.values.sum
    val lastSeq = exp.keys.max
    for ((s, (f, _, _, _, _)) <- exp if s != lastSeq) assert(f == 10)
    assert(exp.values.map(_._1).sum == total)
    assert(exp.values.map(_._2).sum == lens.count(_._2 > 0))
  }

  test("no example straddles unless marked: straddle set equals the mark set") {
    val lens = (1L to 40L).map(i => i -> (i % 13 + 1)).toMap
    val out = CorpusPipeline.packExamples(
        lens.toSeq.toDF("doc_id", "ex_tokens"), seqLen = 16, seqsPerShard = 4)
      .orderBy("seq_no").collect()
    // the concat stream is gapless, so every sequence fills from
    // position 0; its head either IS an example boundary (offset 0 in
    // the boundary list) or continues the previous sequence's example
    // — and starts_mid must say exactly which
    assert(out.nonEmpty)
    out.foreach { r =>
      val headIsBoundary = r.getSeq[Long](7).headOption.contains(0L)
      assert(r.getBoolean(5) == !headIsBoundary,
        s"seq ${r.getLong(0)} mark vs head boundary")
    }
    // sequence ids are contiguous (no gaps in the packed stream)
    assert(out.map(_.getLong(0)).toSeq == (0L until out.length).toSeq)
  }

  test("partition-count invariance: same layout from 1 and 7 input partitions") {
    val lens = (1L to 100L).map(i => i -> (i * 31 % 23 + 1)).toSeq
    val a = CorpusPipeline.packExamples(
        lens.toDF("doc_id", "ex_tokens").repartition(1),
        seqLen = 32, seqsPerShard = 4)
      .drop("boundary_offsets").collect().map(_.toString).sorted
    val b = CorpusPipeline.packExamples(
        lens.toDF("doc_id", "ex_tokens").repartition(7),
        seqLen = 32, seqsPerShard = 4)
      .drop("boundary_offsets").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
