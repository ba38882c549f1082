#!/usr/bin/env python3
"""Oracle type-stability gate.

Usage: python3 tools/check_oracle_types.py <oracle_sql.json> <sf_dir>

Binds (does not execute) every oracle SQL statement in DuckDB with the
sf_dir parquet tables registered as views and fails if any output column
has a type the driver's exact-hash compare cannot round-trip:

  * HUGEINT / UHUGEINT — DuckDB promotes SUM(BIGINT) to int128; pandas has
    no int128 and renders it float64, so the driver's hash sees `42.0` vs
    Spark's `42` and diverges even when every cell is equal (the entire
    round-5 red set: q126/q145/q228/q237/q239/q253).

Exit code 0 = all statements stable; 1 = offenders listed on stdout.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT"}


def main():
    oracle_json, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    bad, err = [], []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])  # binds + plans, no execution
        except Exception as e:
            err.append((name, str(e)[:160]))
            continue
        offenders = [
            f"{col}:{typ}" for col, typ in zip(rel.columns, rel.types)
            if str(typ).upper() in BANNED
        ]
        if offenders:
            bad.append((name, offenders))
    for name, offenders in bad:
        print(f"X {name}: {', '.join(offenders)}")
    for name, msg in err:
        print(f"E {name}: BIND_ERR {msg}")
    n = len(oracle)
    print(f"\n{n - len(bad) - len(err)} stable, {len(bad)} HUGEINT, "
          f"{len(err)} bind-errors of {n}")
    sys.exit(1 if (bad or err) else 0)


if __name__ == "__main__":
    main()
