#!/usr/bin/env python3
"""Sweep every query's oracle result AND Spark output for IEEE -0.0.

Usage: python3 tools/zero_sweep.py /tmp/verify_out /root/testdata/sf0.01

The driver's hash gate is sign-bit sensitive; Python/DuckDB `==` is not
(-0.0 == 0.0). Round 14's q_durbin_watson shipped red on exactly one
signed-zero cell. This tool runs each oracle_sql.json entry in DuckDB and
reads each <name>/ Spark parquet, reporting every float cell whose value
is zero with a NEGATIVE sign bit on either side. Exit 1 if any found.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def neg_zero_cells(rows, cols):
    hits = []
    for r in rows:
        for c, v in zip(cols, r):
            stack = [v]
            while stack:
                x = stack.pop()
                if isinstance(x, list):
                    stack.extend(x)
                elif isinstance(x, float) and x == 0.0 \
                        and math.copysign(1.0, x) < 0:
                    hits.append(c)
    return sorted(set(hits))


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if files:
            rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            hits = neg_zero_cells(rel.fetchall(), rel.columns)
            if hits:
                print(f"[-0.0 SPARK ] {name}: columns {hits}")
                bad += 1
        if name in oracles:
            try:
                rel = con.sql(oracles[name])
                hits = neg_zero_cells(rel.fetchall(), rel.columns)
                if hits:
                    print(f"[-0.0 ORACLE] {name}: columns {hits}")
                    bad += 1
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"[oracle error] {name}: {e}")
                bad += 1
    print(f"zero_sweep: {bad} finding(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
