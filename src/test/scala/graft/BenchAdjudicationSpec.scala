package graft

import org.scalatest.funsuite.AnyFunSuite

/** r14 bench storm-median hardening (verdict #5): the synthetic
 * loaded-host scenarios that motivated per-sample calib normalization.
 * Pure math — no Spark session. */
class BenchAdjudicationSpec extends AnyFunSuite {

  private val calibPin = 0.7

  test("a storm covering two of three samples still adjudicates within band") {
    // true cost 1.0 s; samples 1 and 2 land in a 3x host storm (wall
    // 3.0 s, calib probe 2.1 = 3x the 0.7 pin); the spaced third
    // sample is idle. Per-sample normalization reads every sample as
    // ~1.0 and the median lands at the true cost.
    val samples = Seq((3.0, 2.1), (3.0, 2.1), (1.0, 0.7))
    val med = Bench.adjudicateSamples(samples, calibPin)
    assert(math.abs(med - 1.0) < 1e-9)
    // the r13 behavior (plain raw median) would have recorded 3.0 —
    // over a 1.5x + 0.5s band for any pin below ~1.67
    val rawMedian = samples.map(_._1).sorted.apply(1)
    assert(rawMedian == 3.0 && rawMedian > 1.0 * 1.5 + 0.5)
  }

  test("a storm covering ALL samples normalizes each by its own probe") {
    // even with no idle sample, each sample's own calib rescales it:
    // drifting storm 2x/3x/4x, true cost 1.0 everywhere
    val samples = Seq((2.0, 1.4), (3.0, 2.1), (4.0, 2.8))
    assert(math.abs(Bench.adjudicateSamples(samples, calibPin) - 1.0) < 1e-9)
  }

  test("a genuine plan regression survives normalization (calib stays flat)") {
    // 4x regression on an idle host: calib sits at pin, nothing to
    // normalize away — the adjudicated median stays 4x
    val samples = Seq((4.0, 0.7), (4.1, 0.7), (3.9, 0.7))
    val med = Bench.adjudicateSamples(samples, calibPin)
    assert(med == 4.0 && med > 1.0 * 1.5 + 0.5)
  }

  test("2-of-3 stormy samples the probe missed adjudicate to the min (r14 q_c31 shape)") {
    // r14's actual artifact: 3.62/3.16/0.61 with calib probes that DID
    // NOT see the storm (sub-second probes slip between storm bursts).
    // Normalization leaves the stormy samples inflated; the >3x
    // disagreement trips the min rule and the idle sample wins.
    val samples = Seq((3.62, 0.7), (3.16, 0.7), (0.61, 0.7))
    assert(Bench.adjudicateSamples(samples, calibPin) == 0.61)
  }

  test("samples within 3x still adjudicate to the median (min rule stays dormant)") {
    // ordinary run-to-run jitter (<3x spread) must keep the median —
    // the min would systematically under-report honest variance
    val samples = Seq((1.4, 0.7), (1.0, 0.7), (2.0, 0.7))
    assert(Bench.adjudicateSamples(samples, calibPin) == 1.4)
  }

  test("a faster-than-pin host never inflates (scale floors at 1)") {
    // calib below pin (colder cache / faster host): max(1, .) keeps
    // the raw time — normalization can only shrink storms, never
    // reward a fast probe
    val samples = Seq((0.9, 0.35))
    assert(Bench.adjudicateSamples(samples, calibPin) == 0.9)
  }

  test("adjudicated total carries the r16 storm row's MEDIAN, not its first sample") {
    // the BENCH_r16 shape (verdict #1): q_c85's in-run samples read
    // 30.5/3.45/15.9 — the first two probes missed the storm (flat
    // calib), the >3x spread trips the min rule and the row
    // contributes 3.45; a wall total would have summed 30.5. Beside it
    // an honest idle single-sample row contributes its raw time.
    val rows = Seq(
      Seq((30.5, 0.7), (3.45, 0.7), (15.9, 0.7)), // q_c85 storm triple
      Seq((1.0, 0.7)))                            // idle single sample
    val t = Bench.adjudicatedTotal(rows, calibPin)
    assert(math.abs(t - (3.45 + 1.0)) < 1e-9)
  }

  test("adjudicated total deflates unflagged rows inside a probed storm window") {
    // a 1.4x storm stays UNDER the 1.5x flag band so the row never
    // re-runs, but the window probe beside it reads 1.4x the pin —
    // the total normalizes the row back to its true cost instead of
    // accumulating the inflation (the BENCH_r16 total-poisoning class)
    val rows = Seq(Seq((1.4, 0.98)), Seq((2.8, 0.98)))
    val t = Bench.adjudicatedTotal(rows, calibPin)
    assert(math.abs(t - (1.0 + 2.0)) < 1e-9)
  }

  test("adjudicated total keeps a genuine regression (probes stay flat)") {
    // plan regressions inflate queries but not the calib probe: the
    // adjudicated total must NOT absorb them
    val rows = Seq(Seq((4.0, 0.7)), Seq((1.0, 0.7)))
    assert(Bench.adjudicatedTotal(rows, calibPin) == 5.0)
  }

  test("adjudicated total skips empty rows (failed queries)") {
    assert(Bench.adjudicatedTotal(Seq(Nil, Seq((1.0, 0.7))), calibPin) == 1.0)
  }

  test("derived total ceiling: sum(pins) x 1.05 + 5s, end-to-end through the checker") {
    // r17 verdict #4: the total gate is derived from the pin table the
    // checker already loads, so new pinned queries grow the gate by
    // exactly their pin mass instead of a hand-bumped constant. The
    // checker is the Python harness-side tool — pin its arithmetic by
    // running it against a synthetic baseline + bench artifact.
    val py = new java.io.File("/usr/bin/python3")
    val tool = new java.io.File("tools/check_bench_regression.py")
    assume(py.exists && tool.exists, "python3 + checker required")
    val dir = java.nio.file.Files.createTempDirectory("graft_benchgate")
    val baseline = dir.resolve("BASELINE.md")
    java.nio.file.Files.write(baseline,
      ("## Calibration\ncalib-pin: 1.00\niocalib-pin: 1.00\n\n" +
        "## Per-query pin\n| q_a | 2.00 | x |\n| q_b | 4.00 | x |\n")
        .getBytes("UTF-8"))
    // derived ceiling = (2.00 + 4.00) x 1.05 + 5 = 11.3 s
    def run(adjTotal: Double, extra: Seq[String] = Nil): (Int, String) = {
      val bench = dir.resolve(s"bench_$adjTotal.json")
      java.nio.file.Files.write(bench,
        (s"""{"metric":"total_full","value":$adjTotal,""" +
          s""""adjudicated_total":$adjTotal,"calib":1.0,"failed":0,""" +
          """"queries":{"q_a":2.1,"q_b":3.9}}""").getBytes("UTF-8"))
      val out = new StringBuilder
      val cmd = Seq(py.getPath, tool.getAbsolutePath, bench.toString,
        "--baseline", baseline.toString) ++ extra
      val code = scala.sys.process.Process(cmd)
        .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n')))
      (code, out.toString)
    }
    val (okCode, okOut) = run(11.2)
    assert(okCode == 0 && okOut.contains("11.3"), okOut)
    val (badCode, badOut) = run(11.7)
    assert(badCode == 1 && badOut.contains("> gate 11.3"), badOut)
    // --total-max still overrides the derivation
    val (ovrCode, _) = run(11.7, Seq("--total-max", "20"))
    assert(ovrCode == 0)
  }
}
