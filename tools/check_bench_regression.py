#!/usr/bin/env python3
"""Check a graft.Bench run against the BASELINE.md pins (gate 1 + 2).

Usage: python3 tools/check_bench_regression.py <bench_full_json_line_file>
       [--baseline BASELINE.md] [--total-max 120] [--per-query-factor 1.5]

Input is a file holding the bench's `total_full` JSON line (the first
line graft.Bench prints). Parses the per-query pin table out of
BASELINE.md and reports every query slower than factor x pin, plus the
total gate. Exit 1 on violation — remember the pins are IDLE numbers;
re-run on an idle host before treating a failure as real.
"""
import json
import re
import sys


def main(argv):
    bench_path = argv[1]
    baseline = "BASELINE.md"
    total_max, factor = 120.0, 1.5
    for i, a in enumerate(argv):
        if a == "--baseline":
            baseline = argv[i + 1]
        elif a == "--total-max":
            total_max = float(argv[i + 1])
        elif a == "--per-query-factor":
            factor = float(argv[i + 1])

    full = None
    for line in open(bench_path):
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if d.get("metric") == "total_full":
                full = d
    if full is None:
        print("FAIL: no total_full JSON line found")
        return 1

    pins = {}
    for m in re.finditer(r"^\| (q_\w+) \| ([0-9.]+) \|", open(baseline).read(), re.M):
        pins[m.group(1)] = float(m.group(2))

    bad = []
    if full["value"] > total_max:
        bad.append(f"total {full['value']:.1f}s > gate {total_max:.0f}s")
    if full.get("failed", 0) != 0:
        bad.append(f"failed queries: {full['failed']}")
    for name, sec in sorted(full["queries"].items()):
        pin = pins.get(name)
        # streaming queries pay a micro-batch + state-store floor that
        # swings ~2x with host load (r6/r7 evidence) — wider band
        f = 2.0 if (name.startswith("q_d") or name.startswith("q_sink")) else factor
        if pin is not None and sec > pin * f:
            bad.append(f"{name}: {sec:.2f}s > {f}x pin {pin:.2f}s")
    new = sorted(set(full["queries"]) - set(pins))
    if new:
        print(f"NOTE: unpinned queries (re-pin BASELINE.md): {' '.join(new)}")

    if bad:
        print("FAIL (idle re-run before believing this):")
        for b in bad:
            print("  " + b)
        return 1
    print(f"PASS: total {full['value']:.1f}s, {len(full['queries'])} queries, "
          f"{len(pins)} pins checked")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
