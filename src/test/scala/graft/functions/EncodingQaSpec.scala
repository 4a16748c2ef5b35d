package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** C103: mojibake detection/repair semantics (EncodingQa.fixJava +
 * the codegen FixMojibake column). */
class EncodingQaSpec extends SparkSpec {

  import spark.implicits._

  private def fix(s: String): String =
    EncodingQa.fixJava(UTF8String.fromString(s)).toString

  test("UTF-8-as-cp1252 corruption reverses exactly, including cp1252 specials") {
    for (clean <- Seq("café", "’tis “fine – naïve — € 100", "日本語テキスト",
        EncodingQa.CleanSample)) {
      assert(fix(EncodingQa.mojibakeOf(clean)) == clean)
    }
    // ” is UTF-8 E2 80 9D, and byte 0x9D is a cp1252-UNDEFINED slot
    // the decoder tombstones to U+FFFD: that corruption is genuinely
    // unrecoverable, and the fixer must leave it alone, not guess
    val lossy = EncodingQa.mojibakeOf("a ”quote")
    assert(lossy.contains('�') && fix(lossy) == lossy)
  }

  test("genuine Latin-1 text and pure ASCII pass through untouched") {
    // a REAL é is not valid UTF-8 byte-wise after reversal
    assert(fix("café au lait") == "café au lait")
    assert(fix("plain ascii only") == "plain ascii only")
    // U+FFFD is not cp1252-mappable: mixed corruption stays untouched
    assert(fix("bad � and " + EncodingQa.mojibakeOf("é")) ==
      "bad � and " + EncodingQa.mojibakeOf("é"))
    // chars outside cp1252's image block the reversal
    assert(fix("日本 plus Ã©") == "日本 plus Ã©")
  }

  test("single pass peels exactly one corruption layer") {
    val once = EncodingQa.mojibakeOf("é")
    val twice = EncodingQa.mojibakeOf(once)
    assert(fix(twice) == once && fix(once) == "é")
  }

  test("codegen column repairs planted rows only; markers count exactly") {
    val rows = Seq(
      (0L, "clean row"),
      (1L, "has " + EncodingQa.MojiSample),
      (2L, "tombstone � row")).toDF("id", "t")
    val out = rows.select(col("id"),
        EncodingQa.fixMojibake(col("t")).as("f"),
        size(regexp_extract_all(col("t"), lit(EncodingQa.MarkerRe), lit(0))).as("hits"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "clean row" && out(0).getInt(2) == 0)
    assert(out(1).getString(1) == "has " + EncodingQa.CleanSample)
    assert(out(1).getInt(2) == 3) // Ã©, â€™, â€œ
    assert(out(2).getString(1) == "tombstone � row" && out(2).getInt(2) == 0)
  }
}
