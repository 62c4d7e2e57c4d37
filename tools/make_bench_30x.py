#!/usr/bin/env python3
"""Assemble the BENCH_30X.json heavy-tail scale artifact.

The 10x artifact (make_bench_10x.py) covers the whole registry but
its fixture concat-duplicates CONTENT: every copy's documents are
textually identical to the base, so near-dup pair outputs grow
quadratically and iterative round counts are never exercised on a
larger frontier. This artifact targets the ~10 HEAVIEST keys on a
30x DISTINCT-KEY, DISTINCT-CONTENT fixture (graft.Fixture30x:
join keys renumbered per copy AND documents token-namespaced per
copy, so cross-copy similarity is zero and every derived structure
-- pairs, clusters, n-gram models, BPE vocab -- grows linearly),
plus the RoundsProbe record proving the convergence-driven iterative
operators consume IDENTICAL round counts at 30x.

Both bench inputs must come from the SAME host/session window (run
back-to-back with SPARK_GRAFT_ONLY=<heavy keys>) -- the documented
~15% week-to-week host variance would otherwise masquerade as a
scale regression.

Usage: make_bench_30x.py <base_full.json> <x30_full.json> \
         <rounds.json> <out.json>
"""
import json
import sys


def main(base_p, x30_p, rounds_p, out_p, copies="30"):
    copies = float(copies)
    base = json.load(open(base_p))
    x30 = json.load(open(x30_p))
    rounds = json.load(open(rounds_p))
    bq, xq = base["queries"], x30["queries"]
    # the base record may be the full committed registry; every
    # summary number below must be scoped to the keys the x30 run
    # actually timed, or the headline comparison is nonsense
    bq = {q: v for q, v in bq.items() if q in xq}
    missing = sorted(set(xq) - set(bq))
    if missing:
        print(f"WARNING: base record lacks {missing}; their rows "
              "carry no ratio")
    brows, xrows = base.get("rows", {}), x30.get("rows", {})
    rows = {}
    for q in sorted(xq):
        b, x = bq.get(q, -1.0), xq[q]
        entry = {"base": b, "x30": x}
        if b and b > 0 and x >= 0:
            entry["ratio"] = round(x / b, 2)
        br, xr = brows.get(q, -1), xrows.get(q, -1)
        if br >= 0 and xr >= 0:
            entry["base_rows"], entry["x30_rows"] = br, xr
            if br > 0 and xr > 0 and "ratio" in entry:
                entry["rows_ratio"] = round(xr / br, 2)
                entry["sec_per_row_ratio"] = round((x / xr) / (b / br), 2)
        rows[q] = entry
    # bounded-contract keys in the heavy set stay flat BY DESIGN: the
    # 30x copies renumber far above the bound, so the slice is base
    # content -- their ratio proves the bound holds, not scaling.
    bounded = {
        "q_dedup_clusters": "doc_id < 300 contract (copy 0 only)",
        "q_dedup_clusters_star": "doc_id < 300 contract (copy 0 only)",
    }
    for q, why in bounded.items():
        if q in rows:
            rows[q]["bounded_contract"] = why
            rows[q]["adjudication"] = (
                "flat output by contract; residual wall delta is the "
                "pair-builder's corpus scan (doc_id < 300 pruned via "
                "row-group min/max, but the 30x file listing/footers "
                "still cost)")
    # FIXED-OUTPUT keys (BPE merge table, k-means centroids, CMS
    # cells): output rows are constant by contract while INPUT grew
    # x30, so sec_per_row_ratio degenerates to the raw wall ratio.
    # The honest per-unit number is wall ratio / input ratio.
    for q, e in rows.items():
        if (e.get("rows_ratio") == 1.0 and "bounded_contract" not in e
                and "ratio" in e):
            e["fixed_output"] = True
            e["input_ratio"] = copies
            e["sec_per_input_ratio"] = round(e["ratio"] / copies, 3)
    ratios = sorted(e["ratio"] for e in rows.values() if "ratio" in e)
    # per-unit percentiles: output-normalized for fan-out keys,
    # input-normalized for fixed-output keys; bounded-contract keys
    # excluded (their flat wall is a bound check, not a scale signal)
    spr = sorted(
        e["sec_per_input_ratio"] if e.get("fixed_output")
        else e["sec_per_row_ratio"]
        for e in rows.values()
        if "sec_per_row_ratio" in e and "bounded_contract" not in e)
    n = len(ratios)
    # zero round-count surprises: convergence-driven iteratives must
    # consume identical rounds at 30x
    surprises = [a for a in ("propagation", "star")
                 if rounds.get(f"{a}_base", {}).get("rounds")
                 != rounds.get(f"{a}_x30", {}).get("rounds")]
    summary = {
        "n_queries": len(rows),
        "total_base_sec": round(sum(v for v in bq.values() if v > 0), 3),
        "total_x30_sec": round(sum(v for v in xq.values() if v > 0), 3),
        "ratio_p50": ratios[n // 2] if n else None,
        "ratio_max": ratios[-1] if n else None,
        "sec_per_unit_ratio_p50": spr[len(spr) // 2] if spr else None,
        "sec_per_unit_ratio_max": spr[-1] if spr else None,
        "round_count_surprises": surprises,
        "fixed_round_contracts": {
            "q_graph_pagerank": 3, "q_graph_hops": 3, "q_bpe_train": 32},
        "note": "x30 fixture = sf0.1 tables concatenated 30x, join "
                "keys renumbered per copy AND documents token-"
                "namespaced per copy (graft.Fixture30x) -- cross-copy "
                "similarity is 0, so pairs/clusters/models grow "
                "linearly; a wall ratio near 30/n_cores*active is "
                "linear per-row cost, near 1-3 = fixed-cost-dominated "
                "at sf0.1 (the iterative family's expected shape)",
    }
    out = {"metric": "x30_ratio", "sf_base": base["sf"],
           "sf_x30": x30["sf"], "summary": summary,
           "rounds_probe": rounds, "queries": rows}
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out_p}: {n} ratioed, wall p50 {summary['ratio_p50']}x, "
          f"per-unit max {summary['sec_per_unit_ratio_max']}, "
          f"round surprises: {surprises or 'none'}")


if __name__ == "__main__":
    main(*sys.argv[1:6])
