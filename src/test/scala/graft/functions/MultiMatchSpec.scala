package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** C88: Aho–Corasick blocklist scan (functions/MultiMatch.scala). */
class MultiMatchSpec extends SparkSpec {

  import spark.implicits._

  /** All-positions occurrence count via indexOf — the reference
   * semantics the automaton must reproduce. */
  private def naiveCount(text: String, pat: String): Long = {
    var c = 0L
    var i = text.indexOf(pat)
    while (i >= 0) { c += 1; i = text.indexOf(pat, i + 1) }
    c
  }

  /** The oracle's greedy non-overlapping count (length(replace())). */
  private def replaceCount(text: String, pat: String): Long =
    (text.length - text.replace(pat, "").length).toLong / pat.length

  test("countAll matches naive all-positions counts, incl. nested patterns") {
    val pats = Seq("data stream", "stream", "table scan", "ab", "xyz")
    val ac = AcAutomaton.build(pats)
    val texts = Seq(
      "the data stream joins a stream of table scan rows",
      "ababcab xyzxyz stream",
      "", "no hits here at all",
      "data stream data stream stream")
    texts.foreach { t =>
      val got = ac.countAll(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naiveCount(t, p), s"pattern '$p' on '$t'")
      }
    }
  }

  test("border-free patterns: all-positions count == oracle replace count (random)") {
    val pats = Seq("ab", "bc", "abc", "cab")
    val ac = AcAutomaton.build(pats)
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val t = (1 to rnd.nextInt(40)).map(_ => "abc" (rnd.nextInt(3))).mkString
      val got = ac.countAll(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naiveCount(t, p), s"naive: '$p' on '$t'")
        assert(got(i) == replaceCount(t, p), s"replace: '$p' on '$t'")
      }
    }
  }

  test("self-overlapping (bordered) patterns are rejected at build") {
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("aba")))
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("batch batch")))
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("aa")))
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("ok", "")))
    intercept[IllegalArgumentException](AcAutomaton.build(Seq("dup", "dup")))
    intercept[IllegalArgumentException](AcAutomaton.build(Nil))
  }

  test("UTF-8 multibyte patterns count on byte boundaries") {
    val ac = AcAutomaton.build(Seq("héllo", "é"))
    val got = ac.countAll(
      org.apache.spark.unsafe.types.UTF8String.fromString("héllo é héllo"))
    assert(got(0) == 2 && got(1) == 3) // é appears inside both héllos too
  }

  test("BlocklistCounts: codegen DataFrame path + null text") {
    val pats = Seq("fox", "dog")
    val df = Seq(
      (1L, "the quick fox sees the dog and the fox"),
      (2L, null.asInstanceOf[String]),
      (3L, "no animals")).toDF("id", "t")
    val got = df.select($"id", BlocklistCounts($"t", pats).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got(1L) == Seq(2L, 1L))
    assert(got(2L) == null)
    assert(got(3L) == Seq(0L, 0L))
  }

  test("BlocklistFirstHit: earliest match end byte offset, -1 when clean") {
    val pats = Seq("evil", "bad")
    val df = Seq(
      (1L, "a bad start"),    // 'bad' ends at byte 4
      (2L, "evil"),           // ends at byte 3
      (3L, "all good")).toDF("id", "t")
    val got = df.select($"id", BlocklistFirstHit($"t", pats).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 4, 2L -> 3, 3L -> -1))
  }

  test("q_c88's own blocklist is border-free and builds") {
    // Guards the query's replay contract at spec time: if anyone adds
    // a self-overlapping phrase the build fails here, not at Verify.
    val df = Seq(("s1", "the data stream and a table scan meet a slow sort"))
      .toDF("source", "text")
    val out = graft.queries.PipeQueries.queries("q_c88_blocklist")
    assert(out != null) // registration exists
    val pats = graft.queries.PipeQueries.blocklistPats
    assert(pats.take(4) == Seq("data stream", "stream", "table scan", "slow sort"))
    val c = df.select(BlocklistCounts(lower($"text"), pats).as("c"))
      .head.getSeq[Long](0)
    assert(c == Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L))
  }

  test("10k-phrase blocklist builds SPARSE under the memory bound; counts match dense") {
    // 10k distinct border-free phrases (distinct first tokens keep
    // every pattern border-free: 'pXXXX ...' never has prefix==suffix)
    val pats = (0 until 10000).map(i => s"p$i q${i % 97} z${i % 31}")
    val ac = AcAutomaton.build(pats)
    assert(!ac.isDense, s"${ac.numStates} states must take the sparse path")
    assert(ac.numStates > AcAutomaton.DenseStateLimit)
    // r12 verdict: the dense form here would be ~states×1 KiB (>100 MB);
    // the CSR form must stay ~O(pattern bytes)
    val denseBytes = ac.numStates.toLong * 256L * 4L
    assert(denseBytes > 50L * 1024 * 1024, s"dense would be $denseBytes B")
    assert(ac.approxBytes < 4L * 1024 * 1024,
      s"sparse footprint ${ac.approxBytes} B exceeds the 4 MiB bound")
    // sparse matching ≡ dense matching on a text hitting several
    // patterns mid-string (fail-link descents exercised by the shared
    // 'q.. z..' suffix structure)
    val text = org.apache.spark.unsafe.types.UTF8String.fromString(
      "xx p17 q17 z17 yy p42 q42 z11 zz p17 q17 z17 p9999 q8 z17")
    val small = Seq("p17 q17 z17", "p42 q42 z11", "p9999 q8 z17", "absent x y")
    val sparse = AcAutomaton.build(small, 0)
    val dense = AcAutomaton.build(small, AcAutomaton.DenseStateLimit)
    assert(!sparse.isDense && dense.isDense)
    assert(sparse.countAll(text).toSeq == dense.countAll(text).toSeq)
    assert(sparse.countAll(text).toSeq == Seq(2L, 1L, 1L, 0L))
    assert(sparse.firstMatchEnd(text) == dense.firstMatchEnd(text))
    // the big automaton agrees with a naive scan on the same text
    val bigCounts = ac.countAll(text)
    assert(bigCounts(17) == 2L && bigCounts(42) == 1L && bigCounts(9999) == 1L)
    assert(bigCounts.sum == 4L)
  }
}
