#!/usr/bin/env python3
"""Check a graft.Bench run against the BASELINE.md pins.

Modes
  sf0.1 suite (default):
    python3 tools/check_bench_regression.py <bench_out_file>
        [--baseline BASELINE.md] [--total-max N] [--per-query-factor 1.5]
    The total ceiling is derived from the pin table by default
    (sum of pins x 1.05 + 5s — new pinned queries grow the gate by
    their own pin mass); --total-max overrides it.
    Gates: adjudicated_total <= total ceiling (falls back to the
    calib-normalized wall total for pre-r17 bench files — the wall
    total keeps first-pass times so a mid-suite storm poisons it; the
    adjudicated total normalizes each query by the calib probe
    measured next to it), failed == 0, every query <=
    factor x pin + 0.5s (its '## Per-query pin' median pin; the 0.5 s
    absolute slack models ADDITIVE scheduling noise, which flips
    sub-second queries past a pure ratio band ~2 times per clean run —
    r10 measured q_b5 0.58s pin flapping to 0.91s on an idle host).
    Pins are MEDIAN-OF-3 idle numbers; a single-run failure above the
    slack band is still noise-possible — confirm on a median of 3
    before chasing plan regressions (CLAUDE.md).

    Host-load normalization (round 9): graft.Bench emits "calib" — the
    wall time of a fixed CPU-only probe (range + chained xxhash64 over
    all cores). BASELINE.md '## Calibration' pins its idle median. When
    both are present, every observed time (and the suite total) is
    divided by scale = max(1, calib/calib_pin) before gating: host-wide
    load inflates the probe and all queries by the same factor, while a
    single-query plan regression leaves calib untouched and still
    fails. Old bench files without "calib" gate unnormalized.

  x10 crossover tier (--x10):
    /opt/spark/bin/spark-shell --master 'local[32]' \
        --driver-class-path target/scala-2.13/classes \
        -I tools/make_scale_tiers.scala         # builds /tmp/sf1 if absent
    SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_QUERIES=q_c16_contamination,q_c22_dupgrams,q_c26b_components_star,q_c32_semdedup_2level,q_c40_inverted_index,q_log_parse_common,q_c7b_ann_ivf,q_c53_cdc_dedup,q_c2_minhash_lsh,q_c79_repetition \
        sbt "runMain graft.Bench" > /tmp/bench_x10.txt
    python3 tools/check_bench_regression.py /tmp/bench_x10.txt --x10
    Gates the ten crossover queries against the '## Scale crossover'
    x10 Spark column at 1.5x. At x10 the per-query fixed-cost floor
    stops dominating, so a real plan regression (e.g. reverting the
    q_c22 one-pass aggregate) fires THIS gate as signal while the sf0.1
    gate only sees noise-scale deltas.

Input file holds the bench's `total_full` JSON line (graft.Bench's
first printed line). Exit 1 on violation.
"""
import json
import re
import sys


def section(md, heading):
    """Return the text of the markdown section starting at `heading`."""
    m = re.search(rf"^## {re.escape(heading)}.*?$(.*?)(?=^## |\Z)", md,
                  re.M | re.S)
    return m.group(1) if m else ""


def load_bench(path):
    full = None
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("metric") == "total_full":
                full = d
    return full


def main(argv):
    bench_path = argv[1]
    baseline = "BASELINE.md"
    # Total ceiling is DERIVED from the pin table unless --total-max
    # overrides (round 18, r17 verdict #4): sum(pins) x TOTAL_BAND +
    # TOTAL_SLACK. Per-query noise mostly averages out across ~220
    # queries, so the total band is MUCH tighter than the 1.5x
    # per-query band — 1.05x keeps the gate's sensitivity to uniform
    # suite-wide creep (clean adjudicated totals run ~270 s vs a ~307 s
    # pin sum, so a looser band would let a ~25% across-the-board
    # regression pass every check); the fixed slack absorbs suite-level
    # overhead no single pin carries. Deriving it means new pinned
    # queries grow the gate by exactly their pin mass instead of
    # someone hand-bumping a constant (215 -> ... -> 300 across
    # r1-r16) and forgetting.
    total_max, factor, x10 = None, 1.5, False
    TOTAL_BAND, TOTAL_SLACK = 1.05, 5.0
    for i, a in enumerate(argv):
        if a == "--baseline":
            baseline = argv[i + 1]
        elif a == "--total-max":
            total_max = float(argv[i + 1])
        elif a == "--per-query-factor":
            factor = float(argv[i + 1])
        elif a == "--x10":
            x10 = True

    full = load_bench(bench_path)
    if full is None:
        print("FAIL: no total_full JSON line found")
        return 1
    md = open(baseline).read()

    # host-load scale from the calibration probe (1.0 when either side
    # is missing; never < 1 so a fast host can't mask a regression)
    scale = 1.0
    calib = full.get("calib")
    m = re.search(r"^calib-pin:\s*([0-9.]+)", section(md, "Calibration"), re.M)
    if calib is not None and m:
        scale = max(1.0, calib / float(m.group(1)))
        if scale > 1.05:
            print(f"NOTE: loaded host detected (calib {calib:.2f}s vs pin "
                  f"{float(m.group(1)):.2f}s) — normalizing by {scale:.2f}x")

    # round-13 self-adjudication signals: an iocalib far above its pin
    # means storage contention the CPU calib cannot normalize (the
    # r10-r12 driver-flag cohort); reruns lists rows the bench already
    # re-ran in-process (their reported time is a median of 3)
    iocalib = full.get("iocalib")
    mio = re.search(r"^iocalib-pin:\s*([0-9.]+)", section(md, "Calibration"),
                    re.M)
    if iocalib is not None and iocalib > 0 and mio:
        io_pin = float(mio.group(1))
        if iocalib > 3.0 * io_pin:
            print(f"NOTE: storage-loaded host (iocalib {iocalib:.2f}s vs pin "
                  f"{io_pin:.2f}s) — per-query flags below are likely host "
                  f"I/O, confirm on an idle median before chasing plans")
    rr = full.get("reruns")
    if isinstance(rr, dict) and rr:
        rows = " ".join(f"{k}={v}" for k, v in sorted(rr.items()))
        print(f"NOTE: {len(rr)} rows self-adjudicated in-process "
              f"(median of 3): {rows}")

    bad = []
    if x10:
        # '| query | x10 spark | x10 duck | x100 spark | x100 duck |'
        pins = {}
        for m in re.finditer(r"^\| (q_\w+) \| ([0-9.]+) \| [0-9.]+ \| [0-9.]+ \| [*0-9.]+ \|",
                             section(md, "Scale crossover"), re.M):
            pins[m.group(1)] = float(m.group(2))
        if len(pins) != 12:
            print(f"FAIL: expected 12 crossover pins, parsed {len(pins)}")
            return 1
        if full.get("failed", 0) != 0:
            bad.append(f"failed queries: {full['failed']}")
        missing = sorted(set(pins) - set(full.get("queries", {})))
        if missing:
            bad.append(f"crossover queries not in bench run: {' '.join(missing)}")
        for name, sec in sorted(full.get("queries", {}).items()):
            pin = pins.get(name)
            if pin is not None and sec / scale > pin * factor:
                bad.append(f"{name}: {sec / scale:.2f}s (raw {sec:.2f}s) > "
                           f"{factor}x x10-pin {pin:.2f}s")
    else:
        # anchored to the per-query pin section: the crossover table also
        # matches a bare '| q_... | <num> |' prefix regex and would
        # otherwise shadow pins if sections were reordered
        pins = {}
        for m in re.finditer(r"^\| (q_\w+) \| ([0-9.]+) \|",
                             section(md, "Per-query pin"), re.M):
            pins[m.group(1)] = float(m.group(2))
        if total_max is None:
            if not pins:
                print("FAIL: no per-query pins parsed — cannot derive "
                      "the total ceiling (pass --total-max to override)")
                return 1
            total_max = sum(pins.values()) * TOTAL_BAND + TOTAL_SLACK
            print(f"NOTE: total ceiling derived from pins: "
                  f"sum {sum(pins.values()):.1f}s x {TOTAL_BAND} + "
                  f"{TOTAL_SLACK:.0f}s = {total_max:.1f}s")
        # Total gate (round 17): prefer the storm-proof adjudicated
        # total — each query normalized by the calib probe measured
        # NEXT TO it (per-sample medians for re-run rows, bracketing
        # window probes for the rest). The wall total keeps first-pass
        # times, so one mid-suite storm poisons it even after every
        # flagged row self-adjudicates clean (BENCH_r16: 315.8s
        # normalized > 300 while all 17 reruns resolved in-band). A
        # plan regression inflates queries but NOT the probes, so it
        # still fails this gate.
        adj = full.get("adjudicated_total")
        if adj is not None:
            if adj > total_max:
                bad.append(f"adjudicated total {adj:.1f}s (wall raw "
                           f"{full['value']:.1f}s) > gate {total_max:.1f}s")
            elif full["value"] / scale > total_max:
                print(f"NOTE: wall total {full['value'] / scale:.1f}s over "
                      f"gate but adjudicated total {adj:.1f}s passes — "
                      f"mid-suite storm absorbed by window probes")
        elif full["value"] / scale > total_max:
            bad.append(f"total {full['value'] / scale:.1f}s "
                       f"(raw {full['value']:.1f}s) > gate {total_max:.1f}s")
        if full.get("failed", 0) != 0:
            bad.append(f"failed queries: {full['failed']}")
        for name, sec in sorted(full["queries"].items()):
            pin = pins.get(name)
            # median pins restore the uniform 1.5x band (round 7 ran the
            # streaming rows at 2x against single-shot pins)
            if pin is not None and sec / scale > pin * factor + 0.5:
                bad.append(f"{name}: {sec / scale:.2f}s (raw {sec:.2f}s) > "
                           f"{factor}x pin {pin:.2f}s + 0.5s slack")
        new = sorted(set(full["queries"]) - set(pins))
        if new:
            print(f"NOTE: unpinned queries (re-pin BASELINE.md): {' '.join(new)}")

    if bad:
        print("FAIL (idle re-run before believing this):")
        for b in bad:
            print("  " + b)
        return 1
    adj = full.get("adjudicated_total")
    print(f"PASS: total {full['value']:.1f}s"
          + (f" (normalized {full['value'] / scale:.1f}s @ {scale:.2f}x)"
             if scale > 1.0 else "")
          + (f" (adjudicated {adj:.1f}s)" if adj is not None and not x10
             else "")
          + f", {len(full['queries'])} queries, "
          f"{len(pins)} pins checked" + (" [x10 tier]" if x10 else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
