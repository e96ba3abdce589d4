#!/usr/bin/env python3
"""Dev-only baseline recorder: times every oracle SQL in DuckDB against
an sf dir and writes BASELINE.md, so the "within 2x of a native engine"
gate has numbers to check against. DuckDB is the stand-in single-node
native engine (the reference publishes no query-level wall-times).

Usage: python3 tools/bench_baseline.py /tmp/verify_out/oracle_sql.json \
           /root/testdata/sf0.1 BASELINE.md
"""
import json
import os
import sys
import time

import duckdb

oracle_path, sf_dir, out_md = sys.argv[1], sys.argv[2], sys.argv[3]

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))

rows = []
for name in sorted(oracle):
    best = None
    for _ in range(2):  # best-of-two, like graft.Bench
        t0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            best = None
            print(f"{name}: ERROR {e}")
            break
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        rows.append((name, best))
        print(f"{name:26s} {best:8.3f}s")

total = sum(t for _, t in rows)
with open(out_md, "w") as f:
    f.write("# BASELINE — DuckDB wall-times for the oracle-expressible queries\n\n")
    f.write(f"Engine: DuckDB {duckdb.__version__} (single node, {os.cpu_count()} threads), "
            f"best-of-two, data `{sf_dir}`.\n")
    f.write("DuckDB stands in for \"a native single-node engine\" because the\n"
            "reference publishes no query-level numbers (its README only cites\n"
            "import throughput). The comparable Spark numbers are the same-named\n"
            "entries in `BENCH_r{N}.json` (graft.Bench, also best-of-two, local[32]).\n"
            "Queries without oracle SQL (LSH/ANN/multimodal) have no DuckDB\n"
            "equivalent and are excluded.\n\n")
    f.write("| query | duckdb sec |\n|---|---|\n")
    for name, t in rows:
        f.write(f"| {name} | {t:.3f} |\n")
    f.write(f"| **total ({len(rows)} queries)** | **{total:.3f}** |\n")
print(f"\ntotal {total:.3f}s over {len(rows)} queries -> {out_md}")
