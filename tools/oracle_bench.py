#!/usr/bin/env python3
"""Cross-engine bench anchor: time every oracle SQL in DuckDB itself.

Usage: python3 tools/oracle_bench.py /tmp/verify_out /root/testdata/sf0.1

Runs each oracle_sql.json entry against the sf-dir parquet tables in
DuckDB (same SQL the correctness gate executes) and prints per-query
plus total seconds as one JSON line. DuckDB's single-node columnar
executor on identical queries over identical parquet is a FIXED
external reference: Spark-local[32]-vs-DuckDB ratios are comparable
across rounds even when the machine drifts, unlike round-over-round
Spark totals (measured +/-25% drift on untouched queries).

Not a horse race: DuckDB runs the analytic SQL replication, Spark runs
the production operator (which may do strictly more work — snapshot
sinks, streaming drives). Queries whose replication exists only for
gating (1-row invariant checks) still count; the TOTAL is the anchor.
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(out_dir, sf_dir):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    times = {}
    total = 0.0
    for name in sorted(oracles):
        t0 = time.monotonic()
        try:
            con.execute(oracles[name]).fetchall()
            dt = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"[warn] {name}: {e}", file=sys.stderr)
            dt = -1.0
        times[name] = round(dt, 3)
        if dt >= 0:
            total += dt
    line = {
        "metric": "duckdb_oracle_total",
        "value": round(total, 2),
        "unit": "sec",
        "timed": sum(1 for v in times.values() if v >= 0),
        "failed": sum(1 for v in times.values() if v < 0),
        "sf": sf_dir,
        "queries": times,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
