package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C80: Luhn-validated card detection (functions/Luhn.scala). */
class LuhnSpec extends SparkSpec {

  import spark.implicits._

  test("Luhn.valid: known PANs pass, off-by-one fails") {
    assert(Luhn.valid("4539578763621486", 0, 16))
    assert(!Luhn.valid("4539578763621487", 0, 16))
    assert(Luhn.valid("4222222222222", 0, 13)) // classic 13-digit test PAN
    assert(Luhn.valid("x79927398713y", 1, 11)) // substring form, Wikipedia example
  }

  test("LuhnCardCount: maximal-run + length-range + checksum gates compose") {
    val rows = Seq(
      (1L, "pay 4539578763621486 now"),               // valid 16 → 1
      (2L, "ref 4539578763621487"),                   // checksum fail → 0
      (3L, "ord 12345678901234567890"),               // 20 digits, out of range → 0
      (4L, "a 4222222222222 b 4539578763621486"),     // two valid → 2
      (5L, "short 123456789012"),                     // 12 digits → 0
      (6L, "no digits at all")).toDF("id", "t")
    val got = rows.select($"id", LuhnCardCount($"t").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 2, 5L -> 0, 6L -> 0))
  }

  test("LuhnRedact: only checksum-valid runs are replaced") {
    val out = Seq(("x", "pay 4539578763621486 ref 4539578763621487 tel 5551234"))
      .toDF("k", "t").select(LuhnRedact($"t")).head.getString(0)
    assert(out == "pay [CARD] ref 4539578763621487 tel 5551234")
  }

  test("Unicode digits are NOT candidates (the RE2 '\\d+' ASCII contract)") {
    // fullwidth digits: Character.isDigit accepts them, RE2 \d does
    // not — the scan must use the ASCII rule so engines agree
    val fullwidth = "１２３４５６７８９０１２３"
    val got = Seq(("a", s"x $fullwidth y"), ("b", s"pre${fullwidth}4222222222222"))
      .toDF("k", "t").select($"k", LuhnCardCount($"t"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("a") == 0, "fullwidth run must not be a candidate")
    // the ASCII run bounded by fullwidth chars is still found whole
    assert(got("b") == 1, "ASCII run adjacent to Unicode digits must still count")
  }

  test("SQL surface: luhn_card_count / luhn_redact registered") {
    graft.sql.GraftSql.register(spark)
    val r = spark.sql(
      "SELECT luhn_card_count('a 4222222222222 b'), luhn_redact('a 4222222222222 b')")
      .head
    assert(r.getInt(0) == 1 && r.getString(1) == "a [CARD] b")
  }
}
