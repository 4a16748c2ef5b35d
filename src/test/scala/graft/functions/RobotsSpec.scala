package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C112 RFC 9309 contract, clause by clause (examples track the RFC
 * and the Google REP reference cases). */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private def eval(robots: String, path: String, agent: String): (Boolean, String) = {
    val r = Seq(path).toDF("p")
      .select(RobotsEval(lit(robots), col("p"), agent).as("e"))
      .select("e.*").head()
    (r.getBoolean(0), r.getString(1))
  }

  test("longest match wins; ties go to Allow; no match allows") {
    val r = "User-agent: *\nAllow: /p\nDisallow: /p/x\n"
    assert(eval(r, "/p/x/y", "bot") == ((false, "/p/x")))
    assert(eval(r, "/p/ok", "bot") == ((true, "/p")))
    assert(eval(r, "/other", "bot") == ((true, "")))
    val tie = "User-agent: *\nAllow: /page\nDisallow: /page\n"
    assert(eval(tie, "/page1", "bot")._1) // equal length -> Allow
  }

  test("$ anchors to path end; * matches any run") {
    val r = "User-agent: *\nDisallow: /tmp$\nDisallow: /*.php\n"
    assert(eval(r, "/tmp", "bot") == ((false, "/tmp$")))
    assert(eval(r, "/tmp2", "bot") == ((true, "")))
    assert(eval(r, "/a.php", "bot") == ((false, "/*.php")))
    assert(eval(r, "/x/y.php?q=1", "bot") == ((false, "/*.php")))
    assert(eval(r, "/a.ph", "bot") == ((true, "")))
  }

  test("group selection: specific agent excludes *; shared UA lines; UA after rules opens a new group") {
    val r = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nUser-agent: friendbot\nAllow: /\n" +
      "User-agent: latebot\nDisallow: /x\n"
    // generic agent: * group blocks everything
    assert(!eval(r, "/anything", "randombot/1.0")._1)
    // graftbot and friendbot share the Allow group and IGNORE *
    assert(eval(r, "/anything", "graftbot/1.0")._1)
    assert(eval(r, "/anything", "FriendBot")._1) // case-insensitive
    // latebot's UA line came after rules -> its own group
    assert(eval(r, "/x/1", "latebot") == ((false, "/x")))
    assert(eval(r, "/y", "latebot")._1)
  }

  test("comments strip, empty Disallow is a no-op, agent with no group allows") {
    val r = "# top comment\nUser-agent: somebot # trailing\nDisallow:\n"
    assert(eval(r, "/x", "somebot") == ((true, "")))
    assert(eval(r, "/x", "unknownbot") == ((true, "")))
  }

  test("hostile many-star pattern completes instantly (linear globMatch, r14 advice)") {
    // The old backtracking recursion was exponential in the star count:
    // 20 stars against a 2000-char non-matching path would never finish.
    val pat = "/" + ("*a" * 20) + "b"
    val path = "/" + ("a" * 2000) // all the a's, no final b -> no match
    val t0 = System.nanoTime()
    assert(!RobotsEval.globMatch(pat, path, anchored = false))
    assert(RobotsEval.globMatch(pat, path + "b", anchored = false))
    assert(RobotsEval.globMatch(pat, path + "b", anchored = true))
    assert(!RobotsEval.globMatch(pat + "X", path + "b", anchored = true))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"globMatch took ${ms}ms - super-linear backtracking is back")
  }

  test("globMatch two-pointer edge cases match the prefix/anchor contract") {
    assert(RobotsEval.globMatch("", "/any", anchored = false))   // empty prefix
    assert(!RobotsEval.globMatch("", "/any", anchored = true))   // empty anchored
    assert(RobotsEval.globMatch("", "", anchored = true))
    assert(RobotsEval.globMatch("*", "", anchored = true))       // star eats nothing
    assert(RobotsEval.globMatch("*7", "x7", anchored = true))    // star re-extends
    assert(RobotsEval.globMatch("*7", "x7yz", anchored = false)) // prefix: *7 fires mid-path
    assert(!RobotsEval.globMatch("*7", "xyz", anchored = false))
    assert(RobotsEval.globMatch("a**b", "aXXb", anchored = true)) // adjacent stars
    assert(!RobotsEval.globMatch("ab", "a", anchored = false))    // pattern longer than path
  }

  test("multi-agent projection parses each robots text once per partition (r14 advice)") {
    val robots = "User-agent: graftbot\nDisallow: /x\nUser-agent: *\nAllow: /\n"
    val df = Seq.tabulate(500)(i => s"/p/$i").toDF("p").coalesce(1)
    val before = RobotsEval.parseCount.get()
    val out = df
      .withColumn("a", RobotsEval(lit(robots), col("p"), "graftbot/1.0"))
      .withColumn("b", RobotsEval(lit(robots), col("p"), "otherbot/1.0"))
      .collect()
    assert(out.length == 500)
    val parses = RobotsEval.parseCount.get() - before
    // one parse per (text, agent) per thread; single partition = one
    // thread, two agents -> exactly 2 (the old single-slot cache did
    // ~1000: alternate eviction re-parsed twice per row)
    assert(parses <= 4, s"robots text re-parsed $parses times for 2 agents / 1 partition")
  }

  test("most specific UA match wins over a shorter one") {
    val r = "User-agent: bot\nDisallow: /a\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    // agent 'graftbot/1.0' matches both values; 'graftbot' (8) beats
    // 'bot' (3), so only /b is disallowed
    assert(eval(r, "/a/1", "graftbot/1.0")._1)
    assert(!eval(r, "/b/1", "graftbot/1.0")._1)
  }
}
