#!/usr/bin/env python3
"""Scaling-slope analysis for the SCALING.md certification run.

Reads the three Bench sidecars produced against the Amplify scratch dirs
(k1 / k3 / k9 of sf0.1) and fits, per query, the log-log scaling slope

    t(K) ~ t(1) * K^slope      (slope = least-squares fit of ln t on ln K)

Min-of-reps times are used (the contention-robust statistic Bench emits
as its headline since round 11). Queries whose largest-scale time sits
under NOISE_FLOOR_SEC are classified "floor": at this absolute cost the
time is dominated by fixed per-query overhead (planning, JIT, task
launch), and a fitted exponent over a flat 0.3 s -> 0.4 s curve is
numerically meaningless -- they are reported but not flagged.

Usage: scaling_slopes.py <dir-with-bench_k{1,3,9}.json> [out.json]
"""
import json
import math
import sys

KS = [1, 3, 9]
NOISE_FLOOR_SEC = 2.0
SUPERLINEAR = 1.15  # flag threshold on the fitted exponent


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-scale"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"{d}/SCALING.json"
    runs = {}
    for k in KS:
        with open(f"{d}/bench_k{k}.json") as f:
            runs[k] = json.load(f)["queries"]
    names = sorted(set(runs[KS[0]]) & set(runs[KS[1]]) & set(runs[KS[2]]))
    rows = []
    for name in names:
        ts = [runs[k].get(name, -1.0) for k in KS]
        if any(t is None or t <= 0 for t in ts):
            rows.append({"query": name, "t": ts, "slope": None,
                         "class": "errored"})
            continue
        xs = [math.log(k) for k in KS]
        ys = [math.log(t) for t in ts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        slope = sxy / sxx
        if ts[-1] < NOISE_FLOOR_SEC:
            cls = "floor"
        elif slope > SUPERLINEAR:
            cls = "superlinear"
        elif slope > 0.25:
            cls = "linearish"
        else:
            cls = "flat"
        rows.append({"query": name,
                     "t": [round(t, 3) for t in ts],
                     "slope": round(slope, 3), "class": cls})
    # worst slope first; errored rows (slope None) sort LAST, not first
    rows.sort(key=lambda r: -(r["slope"] if r["slope"] is not None
                              else float("-inf")))
    summary = {
        "ks": KS, "noise_floor_sec": NOISE_FLOOR_SEC,
        "superlinear_threshold": SUPERLINEAR,
        "n_queries": len(rows),
        "n_superlinear": sum(r["class"] == "superlinear" for r in rows),
        "n_floor": sum(r["class"] == "floor" for r in rows),
        "n_errored": sum(r["class"] == "errored" for r in rows),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    # markdown table of everything above the floor, worst slope first
    print("| query | t(k1) s | t(k3) s | t(k9) s | slope | class |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if r["class"] in ("floor",):
            continue
        t = r["t"]
        print(f"| {r['query']} | {t[0]} | {t[1]} | {t[2]} | "
              f"{r['slope']} | {r['class']} |")
    print(f"\n{summary['n_queries']} queries: "
          f"{summary['n_superlinear']} superlinear, "
          f"{summary['n_floor']} under the {NOISE_FLOOR_SEC}s floor, "
          f"{summary['n_errored']} errored -> {out_path}")


if __name__ == "__main__":
    main()
