package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks: the codegen hash-map expression agrees with a
 * brute-force Scala reference on random corpora (the
 * CorpusPropertySpec pattern — seeded, deterministic). */
class RepetitionPropertySpec extends SparkSpec {

  import spark.implicits._

  private def brute(tokens: Seq[String], n: Int): Option[(String, Long, Long, Long, Long)] = {
    if (tokens.length < n) return None
    val grams = tokens.sliding(n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (topG, topC) = counts.toSeq.minBy { case (g, c) => (-c, g) }
    val dup = counts.collect { case (g, c) if c >= 2 => c * g.length }.sum
    Some((topG, topC, topC * topG.length, dup, grams.length.toLong))
  }

  test("RepetitionStats equals the brute-force reference on 200 random docs × n=2..5") {
    val rnd = new scala.util.Random(1234)
    val docs = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(40)
      // small vocab → plenty of genuine repeats
      (i.toLong, Seq.fill(len)("w" + rnd.nextInt(6)))
    }
    val df = docs.toDF("id", "toks")
    for (n <- 2 to 5) {
      val got = df.select($"id", RepetitionStats($"toks", n).as("s"))
        .collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None else {
            val s = r.getStruct(1)
            Some((s.getString(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4)))
          })
        }.toMap
      docs.foreach { case (id, toks) =>
        assert(got(id) == brute(toks, n), s"doc $id n=$n: ${got(id)} vs ${brute(toks, n)}")
      }
    }
  }

  test("RepetitionStats skips null-bearing windows instead of counting shortened grams") {
    val df = Seq(
      (1L, Seq[String]("a", "b", null, "a", "b")), // windows (b,null),(null,a) skipped
      (2L, Seq[String](null, null, null)),         // every window null-bearing → null row
      (3L, Seq[String]("a", null))                 // the only window is null-bearing
    ).toDF("id", "toks")
    val got = df.select($"id", RepetitionStats($"toks", 2).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else {
          val s = r.getStruct(1)
          Some((s.getString(0), s.getLong(1), s.getLong(4)))
        })).toMap
    // doc 1: valid windows are "a b" (twice) — NOT a spurious "b" or
    // "a" single-token gram from concatWs dropping the null
    assert(got(1L) == Some(("a b", 2L, 2L)))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("Luhn: constructed check digits always validate; a corrupted digit flips exactly per the checksum") {
    val rnd = new scala.util.Random(77)
    def withCheckDigit(body: String): String = {
      // check digit d makes the full number Luhn-valid
      val d = (0 to 9).find(d => Luhn.valid(body + d, 0, body.length + 1)).get
      body + d
    }
    (0 until 100).foreach { _ =>
      val len = 13 + rnd.nextInt(7) // full lengths 13..19
      val body = Seq.fill(len - 1)(rnd.nextInt(10)).mkString
      val card = withCheckDigit(body)
      assert(Luhn.count(org.apache.spark.unsafe.types.UTF8String.fromString(s"x $card y")) == 1)
      // corrupt one digit by a non-zero delta: Luhn ALWAYS catches a
      // single-digit substitution
      val pos = rnd.nextInt(card.length)
      val delta = 1 + rnd.nextInt(9)
      val corrupted = card.updated(pos, (('0' + (card(pos) - '0' + delta) % 10)).toChar)
      assert(!Luhn.valid(corrupted, 0, corrupted.length),
        s"single-digit substitution $card -> $corrupted must fail the checksum")
    }
  }
}
