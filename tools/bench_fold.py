#!/usr/bin/env python3
"""Fold N Bench JSON lines into one record: per-arm MIN over runs
(None/null timings and arms missing from a run are skipped; an arm
failed in every run stays null and is unioned into "failed").

Usage: bench_fold.py RUN_A.json RUN_B.json [...] > FOLDED.json
The folded "value" is the sum of folded arm timings; "calibration" is
recomputed from the folded enrich arms when every input carries one.
"""
import json
import sys


def main():
    runs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            runs.append(json.load(f))
    if not runs:
        sys.exit("no inputs")
    arms = []
    for r in runs:
        for k in r["queries"]:
            if k not in arms:
                arms.append(k)
    queries, failed = {}, []
    for k in arms:
        vals = [r["queries"][k] for r in runs
                if r["queries"].get(k) is not None]
        if vals:
            queries[k] = round(min(vals), 3)
        else:
            queries[k] = None
            failed.append(k)
    total = round(sum(v for v in queries.values() if v is not None), 3)
    out = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": queries, "failed": failed,
    }
    # recompute the calibration probe from the FOLDED enrich arms against
    # the same pinned r4 reference values Bench.scala hardcodes
    probe_ref = {"enrich_100k_batch50": 0.623, "enrich_100k_durable": 1.602,
                 "enrich_100k_resume": 1.156,
                 "enrich_100k_durable_10chunks": 2.736}
    ratios = sorted(round(queries[k] / v, 3) for k, v in probe_ref.items()
                    if queries.get(k) is not None)
    if ratios:
        out["calibration"] = {"probe": "enrich_arms_vs_r4",
                              "median_speed_ratio": ratios[len(ratios) // 2],
                              "ratios": ratios}
    else:
        out["calibration"] = None
    out["sf"] = runs[0].get("sf")
    out["note"] = (f"min-per-arm fold of {len(runs)} full runs x "
                   "SPARK_GRAFT_REPS-min within each run")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
