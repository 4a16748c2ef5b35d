package graft.sql

import graft.SparkSpec
import graft.functions.RegexGroups
import graft.logs.HttpdLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Parse-side capture pruning (sql/PruneRegexGroups.scala): the regex
 * must still MATCH identically (validation semantics untouched) while
 * groups nobody reads stop capturing. Inputs are FILES, not local
 * Seqs — ConvertToLocalRelation would otherwise eval the whole parse
 * at optimize time and leave no RegexGroups in the plan to inspect.
 */
class PruneRegexGroupsSpec extends SparkSpec {

  import spark.implicits._

  private def patternsIn(plan: LogicalPlan): Seq[String] = {
    val b = Seq.newBuilder[String]
    plan.foreach(_.expressions.foreach(_.foreach {
      case rg: RegexGroups => b += rg.pattern
      case _ =>
    }))
    b.result()
  }

  /** Write lines once, return the text-source DataFrame (value column). */
  private def fileDf(name: String, lines: Seq[String]): DataFrame = {
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_prune_spec")
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    spark.read.text(f.toString)
  }

  private val okLine =
    """192.168.1.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /a HTTP/1.0" 200 23"""
  private val okLine2 =
    """192.168.1.2 - - [10/Oct/2000:13:56:00 -0700] "POST /b HTTP/1.1" 201 567"""

  test("pruneCaptures: classes, escapes, existing non-capturing groups, remap") {
    import PruneRegexGroups.{pruneCaptures, totalCaptures}
    val pat = """^(\S+) \[([^\]]+)\] "((?:[^"]*))" \((\d+)\)$"""
    assert(totalCaptures(pat) == 4)
    val (p1, m1) = pruneCaptures(pat, Set(2, 4))
    assert(p1 == """^(?:\S+) \[([^\]]+)\] "(?:(?:[^"]*))" \((\d+)\)$""")
    assert(m1 == Map(2 -> 1, 4 -> 2))
    // a '(' inside a character class is not a group
    val cls = """([(])(x)"""
    assert(totalCaptures(cls) == 2)
    assert(pruneCaptures(cls, Set(2))._1 == """(?:[(])(x)""")
    // keep-none: everything non-capturing, match shape preserved
    assert(pruneCaptures(pat, Set.empty[Int])._1 ==
      """^(?:\S+) \[(?:[^\]]+)\] "(?:(?:[^"]*))" \((?:\d+)\)$""")
  }

  test("narrow projection prunes unread captures; values and errors unchanged") {
    val narrow = HttpdLog.parseLines(
        fileDf("narrow.log", Seq(okLine, "not a log line", okLine2)),
        HttpdLog.CommonFormat)
      .select("status", "bytes")
    val rows = narrow.orderBy("status").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSeq == Seq((200, 23L), (201, 567L)))
    // common format = 7 captures; only the %>s and %b groups survive
    val pats = patternsIn(narrow.queryExecution.optimizedPlan)
    assert(pats.nonEmpty)
    assert(pats.forall(p => PruneRegexGroups.totalCaptures(p) <= 2), pats.mkString(";"))
    assert(pats.exists(_.contains("(?:")), pats.mkString(";"))
  }

  test("validation-only consumption (count of valid lines) prunes every capture") {
    val counted = HttpdLog.parseLines(
        fileDf("counted.log", Seq(okLine, "garbage")), HttpdLog.CommonFormat)
      .select(lit(1).as("one"))
    assert(counted.collect().length == 1)
    val pats = patternsIn(counted.queryExecution.optimizedPlan)
    assert(pats.nonEmpty && pats.forall(p => PruneRegexGroups.totalCaptures(p) == 0),
      pats.mkString(";"))
  }

  test("full projection is untouched; raw mode keeps parse_error parity under pruning") {
    val in = fileDf("full.log", Seq(okLine, "broken"))
    val full = HttpdLog.parseLines(in, HttpdLog.CommonFormat)
    assert(full.collect().length == 1)
    // PushDownPredicates inlines a SECOND RegexGroups into the pushed
    // isnotnull filter (two matches per line); the un-push phase hoists
    // that conjunct back above the producing Project, so exactly ONE
    // regex — with all 7 captures — remains in the plan.
    val fullPats = patternsIn(full.queryExecution.optimizedPlan)
      .map(PruneRegexGroups.totalCaptures).sorted
    assert(fullPats == Seq(7), fullPats.mkString(","))
    // raw + narrow: the err IsNull consumer plus one element_at survive
    val raw = HttpdLog.parseLines(in, HttpdLog.CommonFormat, raw = true)
      .select("parse_error", "status")
    val got = raw.collect()
      .map(r => (r.getBoolean(0), if (r.isNullAt(1)) -1 else r.getInt(1))).sortBy(_._2)
    assert(got.toSeq == Seq((true, -1), (false, 200)))
    val rawPats = patternsIn(raw.queryExecution.optimizedPlan)
    assert(rawPats.nonEmpty &&
      rawPats.forall(p => PruneRegexGroups.totalCaptures(p) <= 1), rawPats.mkString(";"))
  }

  test("whole-array pass-through blocks pruning (correctness first)") {
    PruneRegexGroups.install(spark) // not going through parseLines here
    val df = fileDf("passthru.log", Seq("a b"))
      .select(RegexGroups(col("value"), """^(\S+) (\S+)$""").as("g"))
    val out = df.collect()(0).getSeq[String](0)
    assert(out == Seq("a", "b"))
    val pats = patternsIn(df.queryExecution.optimizedPlan)
    assert(pats.nonEmpty &&
      pats.forall(p => PruneRegexGroups.totalCaptures(p) == 2), pats.mkString(";"))
  }

  test("collapsed single-consumer element_at(RegexGroups, i) prunes to one group") {
    PruneRegexGroups.install(spark)
    val df = fileDf("collapsed.log", Seq("x y z"))
      .select(element_at(RegexGroups(col("value"), """^(\S+) (\S+) (\S+)$"""), 2).as("mid"))
    assert(df.collect()(0).getString(0) == "y")
    val pats = patternsIn(df.queryExecution.optimizedPlan)
    assert(pats.nonEmpty && pats.forall(p => PruneRegexGroups.totalCaptures(p) == 1),
      pats.mkString(";"))
  }

  test("scanner: \\Q...\\E quote spans count nothing inside (Pattern.quote output)") {
    import PruneRegexGroups.{pruneCaptures, totalCaptures}
    // the ErrorLog shape: quoted literals carry '[' and '(' that must
    // not flip class state or count as groups — r12 review finding:
    // the old boolean inClass miscounted 3 of 7 groups here
    val quoted = java.util.regex.Pattern.quote("[") + """(\S+)""" +
      java.util.regex.Pattern.quote("] (x) [") + """(\d+)"""
    assert(totalCaptures(quoted) == 2)
    val (pat, remap) = pruneCaptures(quoted, _ == 2)
    assert(remap == Map(2 -> 1))
    val m = java.util.regex.Pattern.compile(pat).matcher("[abc] (x) [42")
    assert(m.find() && m.groupCount() == 1 && m.group(1) == "42")
    // unterminated \Q runs to end of pattern, still no counts inside
    assert(totalCaptures("""(\d)\Q([""") == 1)
  }

  test("scanner: nested character classes [a[b]] tracked as depth, not a boolean") {
    import PruneRegexGroups.{pruneCaptures, totalCaptures}
    val pat = """([a[b]]+) (\d+)"""
    assert(totalCaptures(pat) == 2)
    val (p2, remap) = pruneCaptures(pat, _ == 2)
    assert(remap == Map(2 -> 1))
    val m = java.util.regex.Pattern.compile(p2).matcher("ab 7")
    assert(m.find() && m.group(1) == "7")
  }

  test("error-log narrow projection returns the RIGHT column after pruning") {
    // end-to-end regression for the r12 review finding: the default
    // error format compiles via Pattern.quote; a loglevel-only
    // projection used to renumber element_at onto the timestamp group
    val line = "[Thu May 12 08:28:57.652118 2011] [error] [pid 35708] " +
      "file.c: AH00526: [client 72.15.99.187] File does not exist"
    val df = graft.logs.ErrorLog.read(spark,
      fileDir("errprune.log", Seq(line)), graft.logs.ErrorLog.DefaultFormat)
      .select("loglevel")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("error"))
    // and the plan really did prune: the default format compiles 7
    // capture groups (%t %l %P %F %E %a %M); survivors must be fewer
    val pats = patternsIn(df.queryExecution.optimizedPlan)
    assert(pats.nonEmpty && pats.forall(p =>
      PruneRegexGroups.totalCaptures(p) < 7), pats.mkString(";"))
  }

  /** Like fileDf but returns the directory path (ErrorLog.read takes a path). */
  private def fileDir(name: String, lines: Seq[String]): String = {
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_prune_spec")
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toString
  }
}
