#!/usr/bin/env python3
"""Assemble the standing BENCH_10X.json scale-ratio artifact.

Inputs:
  - the committed sf0.1 BENCH_FULL.json (the round's official record),
  - a 10x-fixture BENCH_FULL.json produced by the SAME hardened
    harness (seeded order, temporally-separated outlier reruns) with
    SPARK_GRAFT_SF_DIR=/tmp/sf1 (built by `runMain graft.Fixture10x`),
  - the SkewBench record (salted-vs-plain on the Zipfian fixture).

Output: BENCH_10X.json with per-query base/x10/ratio rows, summary
percentiles, and the skew record — committed each round so a scale
regression (a query whose 10x ratio jumps) gates like an sf0.1 one.

Usage: make_bench_10x.py <base_full.json> <x10_full.json> \
         <skew.json> <out.json>
"""
import json
import sys


def main(base_p, x10_p, skew_p, out_p):
    base = json.load(open(base_p))
    x10 = json.load(open(x10_p))
    skew = json.load(open(skew_p))
    bq, xq = base["queries"], x10["queries"]
    brows, xrows = base.get("rows", {}), x10.get("rows", {})
    rows = {}
    for q in sorted(xq):
        b, x = bq.get(q, -1.0), xq[q]
        entry = {"base": b, "x10": x}
        if b and b > 0 and x >= 0:
            entry["ratio"] = round(x / b, 2)
        # Output-row counts adjudicate a ratio jump: a time ratio that
        # tracks rows_ratio is fan-out (the query legitimately emits
        # more), while sec_per_row_ratio >> 1 is a genuine per-row
        # compute/shuffle regression.
        br, xr = brows.get(q, -1), xrows.get(q, -1)
        if br >= 0 and xr >= 0:
            entry["base_rows"], entry["x10_rows"] = br, xr
            if br > 0 and xr > 0 and "ratio" in entry:
                entry["rows_ratio"] = round(xr / br, 2)
                entry["sec_per_row_ratio"] = round(
                    (x / xr) / (b / br), 2)
        rows[q] = entry
    ratios = sorted(e["ratio"] for e in rows.values() if "ratio" in e)
    n = len(ratios)
    spr = sorted(e["sec_per_row_ratio"] for e in rows.values()
                 if "sec_per_row_ratio" in e)
    summary = {
        "n_queries": len(rows),
        "n_ratioed": n,
        "total_base_sec": base["value"],
        "total_x10_sec": x10["value"],
        "total_ratio": round(x10["value"] / base["value"], 2),
        "ratio_p50": ratios[n // 2] if n else None,
        "ratio_p90": ratios[(n * 9) // 10] if n else None,
        "ratio_max": ratios[-1] if n else None,
        "sec_per_row_ratio_p50": spr[len(spr) // 2] if spr else None,
        "sec_per_row_ratio_max": spr[-1] if spr else None,
        # fixture semantics live with the numbers, not in prose
        # someone has to find
        "note": "x10 fixture = sf0.1 tables concatenated 10x with "
                "join keys renumbered per copy (graft.Fixture10x; "
                "dims region/nation as-is), so equi-joins stay "
                "1-to-N; bounded-contract slices (doc_id<300, "
                "vec_id<200) keep base content and are designed to "
                "stay flat; a ratio near 10 = linear per-row CPU, "
                "near 1-2 = shuffle/overhead-dominated or bounded",
    }
    out = {"metric": "x10_ratio", "sf_base": base["sf"],
           "sf_x10": x10["sf"], "summary": summary,
           "skew_join": skew, "queries": rows}
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out_p}: {n} ratioed, total {summary['total_ratio']}x, "
          f"p50 {summary['ratio_p50']}x, max {summary['ratio_max']}x")


if __name__ == "__main__":
    main(*sys.argv[1:5])
