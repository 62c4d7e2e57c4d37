#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reproduces the DRIVER's comparison path, not a normalized one:
  - oracle rows come from DuckDB via ``.df()`` (DECIMAL -> float64,
    nullable INT -> float64, DATE -> object of datetime.date),
  - Spark rows come from ``pandas.read_parquet`` on the Verify output
    directory (parquet DECIMAL -> decimal.Decimal objects, arrays ->
    numpy.ndarray),
  - columns are sorted by name, rows are sorted by all columns with
    ``DataFrame.sort_values`` (which raises TypeError on ndarray
    columns — exactly like the driver's lexsort did in round 2),
  - cells are compared by exact value AND type-class: a
    decimal.Decimal on the Spark side never matches a float64 on the
    oracle side even when numerically identical, mirroring the
    driver's hash mismatch on DECIMAL-typed output columns.

Round-2 lesson: the previous version read BOTH sides through DuckDB,
normalizing decimal/array types identically, and reported 48/48 while
the driver reported 41/48. A local gate must fail wherever the driver
fails.

Usage: verify_local.py <sfDir> <verifyOutDir>
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(v):
    """Coarse type class: values in different classes never match,
    mirroring how the driver's value hash separates dtypes."""
    if v is None:
        return "null"
    # NaT (and any scalar NA) is null, BEFORE the datetime check:
    # pd.NaT isinstance datetime, and Timestamp(NaT) != Timestamp(NaT)
    # would turn legitimate null==null timestamp cells into mismatches.
    if not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v):
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    # DATE and TIMESTAMP share a class: DuckDB .df() widens DATE to
    # datetime64 while Spark parquet date32 stays datetime.date, and
    # the driver hash-matched DATE-output queries in round 2 — so the
    # two must compare by instant, not by Python type.
    if isinstance(v, (pd.Timestamp, datetime.datetime, np.datetime64,
                      datetime.date)):
        return "ts"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    return type(v).__name__


def cells_equal(a, b):
    ca, cb = type_class(a), type_class(b)
    if ca != cb:
        return False
    if ca == "null":
        return True
    if ca == "ts":
        return pd.Timestamp(a) == pd.Timestamp(b)
    if ca == "array":
        return list(a) == list(b)
    return a == b


def sorted_frame(df):
    """Driver behavior: columns sorted by name, rows lexsorted by all
    columns. Raises on unsortable (ndarray) columns like the driver."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        return f"columns spark={s_cols} oracle={o_cols}"
    if len(spark_df) != len(oracle_df):
        return f"rows spark={len(spark_df)} oracle={len(oracle_df)}"
    s = sorted_frame(spark_df)
    o = sorted_frame(oracle_df)
    n_diff, first = 0, None
    for i in range(len(s)):
        for c in s_cols:
            a, b = s.at[i, c], o.at[i, c]
            if not cells_equal(a, b):
                n_diff += 1
                if first is None:
                    first = (i, c, a, type_class(a), b, type_class(b))
                break
    if n_diff:
        i, c, a, ta, b, tb = first
        return (f"{n_diff}/{len(s)} rows differ; first at row {i} "
                f"col {c}:\n  spark : {a!r} ({ta})\n  oracle: {b!r} ({tb})")
    return None


# Scale-antipattern allow-list: every entry needs a boundedness
# justification (the PlanSpec discipline). A NEW query appearing here
# without one is a gate failure by construction.
PLAN_FLAG_ALLOW = {
    # counts-of-counts histogram: the window's input is one row per
    # DISTINCT per-key multiplicity — tens of rows at any fact size
    "q_skew_report": {"unpartitioned_window"},
    # globalRank's prefix-offset theta self-join: both sides are the
    # per-partition counts frame — #partitions rows, bounded by
    # cluster config, never by data (AnalyticsQueries.globalRank)
    "q_events_rfm": {"nested_loop_join"},
    # same prefix-min theta self-join shape over the per-partition
    # min-y frame — #partitions rows, bounded by cluster config
    # (operators/Skyline.frontier2d)
    "q_skyline_2d": {"nested_loop_join"},
    # cross of two fixed-cardinality dims (region 5 × nation≤5 rows
    # at every SF) — the operator's contract is a dim×dim cross
    "q_join_cross": {"nested_loop_join"},
    # non-equi theta join: broadcast side is nation, fixed 25 rows at
    # every SF; BNLJ is the only physical plan for `<` predicates
    "q_join_theta": {"nested_loop_join"},
    # r11: q_sim_topk / q_dedup_embed_cosine entries REMOVED — both
    # now ride the exact cell equi-join kernels (exactCosineTopK /
    # exactCosineThresholdPairs, triangle-inequality bounds,
    # bit-identical to the brute scans by AnnSearchSpec), no NLJ in
    # either plan.
    # label-pair matrix over the same bounded vec_id<200 baseline
    # convention as q_sim_topk (AnalyticsQueries scaladoc)
    "q_sim_matrix": {"nested_loop_join"},
    # bounded-N bigram-Jaccard exact tier (maxId=300); scale path
    # is the minhash/LSH banded join (LlmQueries scaladoc)
    "q_dedup_ngram": {"nested_loop_join"},
    # same bounded-N baseline contract; scale path screens with the
    # band join then verifies containment (ApproxDedup scaladoc)
    "q_dedup_containment": {"nested_loop_join"},
    # The PQ whole-corpus ADC scan IS the documented contrast tier
    # (q_ann_ivfpq's cell-local ADC is the scale path); its exact
    # re-rank stays bounded by the candidate set, maxId=200 contract
    "q_ann_pq": {"nested_loop_join"},
    # r11: q_ann_recall entry REMOVED — its exact ground truth now
    # rides exactCosineTopKNonSelf (cell equi-join, bit-identical to
    # the brute scan), sharing q_sim_topk's memoized assignment frame.
    # r10: q_retrieval_fusion / q_retrieval_ndcg entries REMOVED —
    # the dense leg is now AnnSearch.exactCosineTopK (cell equi-join
    # with a triangle-inequality bound), no NLJ in either plan.
    # the TAIL of the head/tail bigram-model join: the broadcast
    # heavy-hitter head (> N/4096 occurrences, ≤ 4096 rows by
    # pigeonhole) is screened out by a broadcast anti-join first, so
    # every key reaching this shuffle join is ≤ N/4096 occurrences —
    # skew bounded by construction (CorpusQueries.lmHeadFanout;
    # PlanFlagsSpec pins the broadcast head + anti-screen shape)
    "q_text_lm_score": {"hotkey_shuffle_join"},
    # same head/tail discipline through the generalized operator
    # (ScaleJoins.frequencySplitJoin): the broadcast df head
    # (> N/4096 of the tf stream, ≤ 4096 terms by pigeonhole) is
    # anti-screened out first, so every term reaching the tail
    # shuffle join carries ≤ N/4096 of the stream (PlanSpec pins the
    # broadcast head + anti-screen shape)
    "q_text_keywords": {"hotkey_shuffle_join"},
}


def check_plan_flags(out_dir):
    """Fail on scale antipatterns (emitted by graft.Verify as
    plan_flags.json: unpartitioned windows, nested-loop joins,
    cartesian products) outside the justified allow-list."""
    import os
    path = f"{out_dir}/plan_flags.json"
    if not os.path.exists(path):  # older Verify output
        print("WARN plan_flags.json missing — plan checklist skipped")
        return 0
    flags = json.load(open(path))
    n_bad = 0
    for name, fs in sorted(flags.items()):
        bad = set(fs) - PLAN_FLAG_ALLOW.get(name, set())
        if bad:
            print(f"FAIL {name}: scale antipattern(s) {sorted(bad)} "
                  f"(unpartitioned window / loop join / unsalted "
                  f"hot-key join — would not survive 100x)")
            n_bad += 1
    return n_bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not parts:
                raise FileNotFoundError(f"no parquet under {out_dir}/{name}")
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            problem = compare(name, spark_df, oracle_df)
        except Exception as e:
            problem = f"compare error (driver would error too): {e!r}"
        if problem:
            print(f"FAIL {name}: {problem}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    n_bad += check_plan_flags(out_dir)
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
