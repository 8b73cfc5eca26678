#!/usr/bin/env python3
"""Per-query scaling ratio table between two BENCH json artifacts
(dev tool — same standing as check_oracle.py).

Usage: python3 tools/scaling_report.py BENCH_sf1.json BENCH_sf10.json 10
Prints a markdown table sorted by ratio descending plus a summary line:
how many queries are <= the data growth factor, <= 3x it, and the
outliers above that with their absolute times (a tiny absolute time
growing 20x is noise; a dominant query growing 20x is a finding).
"""
import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    shared = sorted(set(a) & set(b))
    rows = []
    for q in shared:
        ta, tb = a[q], b[q]
        if ta is None or tb is None:
            rows.append((float("inf"), q, ta, tb))
            continue
        rows.append((tb / max(ta, 1e-9), q, ta, tb))
    rows.sort(reverse=True)
    print(f"| query | {a_path.split('/')[-1]} s | {b_path.split('/')[-1]} s | ratio |")
    print("|---|---|---|---|")
    for r, q, ta, tb in rows:
        print(f"| {q} | {ta if ta is None else round(ta, 2)} |"
              f" {tb if tb is None else round(tb, 2)} |"
              f" {'FAIL' if r == float('inf') else round(r, 1)} |")
    ok = sum(1 for r, *_ in rows if r <= factor)
    ok3 = sum(1 for r, *_ in rows if r <= 3 * factor)
    ta_tot = sum(ta for _, _, ta, _ in rows if ta is not None)
    tb_tot = sum(tb for _, _, _, tb in rows if tb is not None)
    print(f"\n{len(shared)} shared queries; {ok} <= {factor:g}x, "
          f"{ok3} <= {3 * factor:g}x; suite wall {ta_tot:.1f}s -> {tb_tot:.1f}s "
          f"({tb_tot / ta_tot:.2f}x for {factor:g}x data)")
    # Host-speed normalization: each artifact carries canary_sec (a
    # constant sf-independent workload timed in the same JVM/session).
    # The shared host drifts 2-3x between measurement windows, so the raw
    # total ratio confounds host speed with plan changes; dividing by the
    # canary ratio separates them mechanically (round-7 adjudication spent
    # a session proving by hand what this line now prints).
    ca = json.load(open(a_path)).get("canary_sec")
    cb = json.load(open(b_path)).get("canary_sec")
    if ca and cb:
        host = cb / ca
        print(f"host canary {ca:.2f}s -> {cb:.2f}s ({host:.2f}x); "
              f"host-normalized suite ratio "
              f"{tb_tot / ta_tot / host:.2f}x for {factor:g}x data")
    else:
        missing = [p for p, c in [(a_path, ca), (b_path, cb)] if not c]
        print(f"(no canary_sec in {', '.join(missing)} — raw ratio only; "
              f"pre-round-8 artifacts lack the canary)")


if __name__ == "__main__":
    main()
