#!/usr/bin/env python3
"""Independent Firehose-decode oracle (stdlib only).

Re-derives the expected output of the three Firehose query keys
(`q_firehose_pipeline`, `q_firehose_payloads`, `q_firehose_throughput`)
WITHOUT touching the Scala decoder: plain stdlib `gzip` in a
decompress-until-plain loop, a byte scan for the DATA_MESSAGE
delimiter, `json` for block parsing — mirroring the reference
pipeline's own steps (kinesis-to-humio.py:91-112,131-148) — and writes
the rows as golden CSVs under tools/golden/ that the DuckDB oracle SQL
SELECTs from. This upgrades the three keys from the weaker rows-only
check to the same hash gate every other query key has: Spark output
vs an independently produced expected-row set.

Input preference order, per fixture set:
  1. the Scala-generated fixture files in $TMPDIR (graft_firehose_fixture /
     graft_firehose_large) — the exact bytes the Spark pipeline reads;
  2. if absent, self-generated equivalents (same deterministic content
     per FIXTURES.md §A; the decoded rows are identical by construction,
     and when both exist the tool asserts payload identity).

Regeneration is deterministic, so the committed CSVs are stable; the
ScalaTest spec `GoldenFirehoseSpec` pins the Spark pipeline against the
same committed files, catching drift before the driver does.

Usage: python3 tools/firehose_oracle.py [--check]
  --check: do not rewrite; fail if the committed CSVs differ.
"""
import csv
import gzip
import io
import json
import os
import sys
import tempfile

DELIM = b'{"messageType":"DATA_MESSAGE"'
BASE_TS = 1700000000000
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


# ---------------------------------------------------------------- fixture gen
# Deterministic content per FIXTURES.md §A — used only when the
# Scala-generated files are absent; decoded rows are identical.

def block(block_idx, n_events, log_stream, log_group="/aws/lambda/app"):
    events = ",".join(
        '{"id":"ev-%d-%d","timestamp":%d,"message":"line %d of block %d"}'
        % (block_idx, e, BASE_TS + block_idx * 100000 + e, e, block_idx)
        for e in range(n_events))
    return ('{"messageType":"DATA_MESSAGE","owner":"123456789012",'
            '"logGroup":"%s","logStream":"%s",'
            '"subscriptionFilters":["all"],"logEvents":[%s]}'
            % (log_group, log_stream, events))


def standard_fixture():
    """name -> raw file bytes for the standard set."""
    multi = (block(0, 3, "2023/11/01/app/instance-1")
             + block(1, 5, "2023/11/02/app/instance-2")).encode()
    return {
        "plain.log": multi,
        "single.gz": gzip.compress(block(2, 4, "shortstream").encode()),
        "double.gz.gz": gzip.compress(
            gzip.compress(block(3, 2, "a/b/c/d").encode())),
        "nodelim.log": b'{"messageType":"CONTROL_MESSAGE","logEvents":[]}',
    }


def large_fixture(n_files=32, blocks=25, events=250):
    out = {}
    for f in range(n_files):
        body = "".join(
            block(f * blocks + b, events,
                  "2024/01/%02d/app/i-%d" % (f % 28 + 1, f))
            for b in range(blocks))
        out["part-%05d.gz" % f] = gzip.compress(body.encode())
    return out


def load_fixture(dirname, fallback):
    """Prefer the Scala-generated files (decode the exact bytes Spark
    reads); fall back to self-generated content. When both exist,
    assert decompressed-payload identity — a cross-check that the two
    independent generators agree."""
    d = os.path.join(tempfile.gettempdir(), dirname)
    gen = fallback()
    if os.path.isdir(d) and sorted(os.listdir(d)) == sorted(gen):
        files = {}
        for name in sorted(gen):
            with open(os.path.join(d, name), "rb") as fh:
                files[name] = fh.read()
            if gunzip_all(files[name]) != gunzip_all(gen[name]):
                raise SystemExit(
                    f"FIXTURE MISMATCH: {dirname}/{name} decodes "
                    "differently from the FIXTURES.md §A spec")
        print(f"  using Scala-generated fixture at {d} (payloads verified)")
        return files
    print(f"  {d} absent/partial — using self-generated fixture")
    return gen


# ------------------------------------------------------------------- decode

def gunzip_all(data):
    """Decompress until the payload no longer starts with gzip magic
    (the reference's gunzip-in-a-loop, kinesis-to-humio.py:91-96).
    stdlib gzip.decompress consumes all members per layer, like the
    streaming reader."""
    while len(data) >= 2 and data[0] == 0x1F and data[1] == 0x8B:
        data = gzip.decompress(data)
    return data


def split_blocks(data):
    """Delimiter-offset scan: blocks run from each DATA_MESSAGE marker
    to the next (last to EOF); zero delimiters -> zero blocks."""
    offs, i = [], data.find(DELIM)
    while i != -1:
        offs.append(i)
        i = data.find(DELIM, i + len(DELIM))
    return [data[a:b].decode("utf-8")
            for a, b in zip(offs, offs[1:] + [len(data)])]


def prefix(log_stream):
    return "/".join(log_stream.split("/")[:2])


def decode(files):
    """file bytes -> event rows (file basename, block_idx, event_idx,
    plus the A.3 enrichment columns)."""
    rows = []
    for name in sorted(files):
        payload = gunzip_all(files[name])
        for bi, blk in enumerate(split_blocks(payload)):
            b = json.loads(blk)
            for ei, ev in enumerate(b.get("logEvents") or []):
                rows.append({
                    "timestamp": ev["timestamp"],
                    "logGroup": b.get("logGroup"),
                    "logStream": b.get("logStream"),
                    "logStreamPrefix": prefix(b.get("logStream")),
                    "file": name,
                    "id": ev["id"],
                    "message": ev["message"],
                    "block_idx": bi,
                    "event_idx": ei,
                })
    return rows


# ------------------------------------------------------------- query twins

def q_pipeline(rows, batch_size=5000):
    out = []
    for r in rows:
        r = dict(r)
        r["batch_id"] = r["event_idx"] // batch_size
        out.append(r)
    return sorted(out, key=lambda r: (r["file"], r["block_idx"],
                                      r["event_idx"]))


def q_payloads(rows, batch_size=3):
    """One row per (file, block, batch): the Humio envelope exactly as
    Spark's to_json renders it (struct field order, no spaces)."""
    groups = {}
    for r in rows:
        key = (r["file"], r["block_idx"], r["event_idx"] // batch_size,
               r["logStreamPrefix"], r["logGroup"])
        groups.setdefault(key, []).append(r)
    out = []
    for (f, bi, batch, pfx, grp), evs in sorted(groups.items()):
        evs.sort(key=lambda e: (e["event_idx"], e["timestamp"], e["id"],
                                e["message"], e["logStream"]))
        payload = json.dumps(
            {"tags": {"logStreamPrefix": pfx, "logGroup": grp},
             "events": [{"timestamp": e["timestamp"],
                         "attributes": {"id": e["id"],
                                        "message": e["message"],
                                        "file": f,
                                        "logStream": e["logStream"]}}
                        for e in evs]},
            separators=(",", ":"))
        out.append({"file": f, "block_idx": bi, "batch_id": batch,
                    "payload": payload, "n_events": len(evs)})
    return out


def q_throughput(rows):
    agg = {}
    for r in rows:
        a = agg.setdefault(r["file"], [0, None, None])
        a[0] += 1
        a[1] = r["timestamp"] if a[1] is None else min(a[1], r["timestamp"])
        a[2] = r["timestamp"] if a[2] is None else max(a[2], r["timestamp"])
    return [{"file": f, "n_events": n, "min_ts": lo, "max_ts": hi}
            for f, (n, lo, hi) in sorted(agg.items())]


# -------------------------------------------------------------------- main

def write_csv(path, rows, cols, check):
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols, lineterminator="\n")
    w.writeheader()
    w.writerows(rows)
    data = buf.getvalue()
    if check:
        with open(path) as fh:
            if fh.read() != data:
                raise SystemExit(f"GOLDEN DRIFT: {path} differs — "
                                 "rerun tools/firehose_oracle.py")
        print(f"  ok {path} ({len(rows)} rows)")
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(data)
        print(f"  wrote {path} ({len(rows)} rows)")


def main(check=False):
    print("standard fixture:")
    std = decode(load_fixture("graft_firehose_fixture", standard_fixture))
    print("large fixture:")
    big = decode(load_fixture("graft_firehose_large", large_fixture))
    write_csv(os.path.join(GOLDEN, "firehose_pipeline.csv"),
              q_pipeline(std),
              ["timestamp", "logGroup", "logStream", "logStreamPrefix",
               "file", "id", "message", "block_idx", "event_idx",
               "batch_id"], check)
    write_csv(os.path.join(GOLDEN, "firehose_payloads.csv"),
              q_payloads(std),
              ["file", "block_idx", "batch_id", "payload", "n_events"],
              check)
    write_csv(os.path.join(GOLDEN, "firehose_throughput.csv"),
              q_throughput(big),
              ["file", "n_events", "min_ts", "max_ts"], check)


if __name__ == "__main__":
    main(check="--check" in sys.argv[1:])
