#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--json OUT] [only...]

--json OUT additionally writes a driver-style per-query JSON record to
OUT. Field semantics (matching the driver's CORRECTNESS_*.json):
rows_match = row VALUES equal (not merely counts — a value mismatch
sets it False), schema_match = sorted column names equal, hash_match =
rows_match AND schema_match; counts_match (local extra) = row counts
equal, so a value-only mismatch is distinguishable from a cardinality
mismatch when diffing artifacts.

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB over the same sfDir tables,
then compares: schema (column names sorted), row count, and values
(rows sorted by all columns; exact match required — design queries so
floats are rounded on both sides).

Dev-only tooling (driver-side python), not part of the Spark library.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # exact compare, but unify -0.0/0.0 and NaN repr
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def main(sf_dir, out_dir, only=(), json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    results = {}

    def record(name, rows_match, schema_match, hash_match, s_rows, o_rows, err):
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match,
                         "counts_match": s_rows is not None and s_rows == o_rows,
                         "spark_rows": s_rows,
                         "oracle_rows": o_rows, "err": err}

    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, False, False, None, None, f"oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            record(name, False, False, False, None, len(oracle),
                   f"spark result missing/unreadable: {e}")
            n_fail += 1
            continue
        ocols, gcols = sorted(oracle.columns), sorted(got.columns)
        if ocols != gcols:
            # rows_match stays a boolean (the docstring contract): values
            # were not verified equal, so it is False, not null
            print(f"FAIL {name}: schema mismatch spark={gcols} oracle={ocols}")
            record(name, False, False, False, len(got), len(oracle),
                   "schema mismatch: values not compared")
            n_fail += 1
            continue
        o = oracle[ocols]
        g = got[gcols]
        if len(o) != len(g):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(o)}")
            record(name, False, True, False, len(g), len(o), None)
            n_fail += 1
            continue
        orows = sorted([tuple(norm(v) for v in r) for r in o.itertuples(index=False)],
                       key=repr)
        grows = sorted([tuple(norm(v) for v in r) for r in g.itertuples(index=False)],
                       key=repr)
        if orows == grows:
            print(f"PASS {name} ({len(g)} rows)")
            record(name, True, True, True, len(g), len(o), None)
            n_pass += 1
        else:
            bad = [(a, b) for a, b in zip(grows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs (spark vs oracle):")
            for a, b in bad:
                print(f"  spark : {a}")
                print(f"  oracle: {b}")
            record(name, False, True, False, len(g), len(o), None)
            n_fail += 1
    if only and n_pass + n_fail == 0:
        print(f"ERROR: no oracle entry matched the requested names: {sorted(only)}")
        n_fail = 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[3:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check.py <sfDir> <outDir> [--json OUT] [only...]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(sys.argv[1], sys.argv[2], set(argv), json_out))
