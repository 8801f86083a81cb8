#!/usr/bin/env python3
"""Strict differential check: dtype-sensitive and bit-exact, mimicking the
driver's typed hasher (which scripts/check.py is looser than: the driver
distinguishes 1.0 from 1, and +0.0 from -0.0 — both bit r1/r2 rounds).

Usage: python3 scripts/check_typed.py <sfDir> <verifyOutDir> [names...]

For float64 columns, values are compared on their IEEE bit patterns; for
everything else, on exact typed equality. Dtype mismatches (e.g. DuckDB
TINYINT vs Spark DOUBLE) fail even when values compare equal.

Dev-only tooling (driver-side python), not part of the Spark library.
"""
import json
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if names:
        oracles = {k: v for k, v in oracles.items() if k in names}

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        cols = sorted(got.columns)
        if sorted(oracle.columns) != cols:
            print(f"FAIL {name}: schema spark={cols} oracle={sorted(oracle.columns)}")
            n_fail += 1
            continue
        o, g = oracle[cols], got[cols]
        if len(o) != len(g):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = [c for c in cols if o[c].dtype != g[c].dtype]
        if bad:
            print(f"FAIL {name}: dtype mismatch "
                  f"{[(c, str(g[c].dtype), str(o[c].dtype)) for c in bad]}")
            n_fail += 1
            continue
        # sort rows identically on both sides (repr-stable like check.py)
        def keyed(df):
            return sorted(
                [tuple(r) for r in df.itertuples(index=False)], key=repr)
        orows, grows = keyed(o), keyed(g)
        diffs = []
        for i, (a, b) in enumerate(zip(grows, orows)):
            for c, (x, y) in zip(cols, zip(a, b)):
                if isinstance(x, float) and isinstance(y, float):
                    eq = np.float64(x).tobytes() == np.float64(y).tobytes() or (
                        x != x and y != y)
                else:
                    eq = x == y or (x != x and y != y)
                if not eq:
                    diffs.append((i, c, x, y))
                    break
            if len(diffs) >= 3:
                break
        if diffs:
            print(f"FAIL {name}: typed/bit diffs (row, col, spark, oracle): {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail (typed) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
