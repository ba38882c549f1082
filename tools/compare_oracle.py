#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ spark parquet result plus <out>/oracle_sql.json,
runs each oracle SQL in DuckDB with the sf_dir parquet tables registered
as views, sorts columns by name and rows by all columns, and compares
cell-by-cell (exact for ints/strings, 1e-9 relative for floats).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"SPARK_READ_ERR {e}"
            continue
        if name not in oracle:
            results[name] = f"no_oracle rows={len(spark_df)}"
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERR {str(e)[:200]}"
            continue
        sc = sorted(spark_df.columns)
        oc = sorted(ora_df.columns)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
            continue
        if len(spark_df) != len(ora_df):
            results[name] = (
                f"ROWS_MISMATCH spark={len(spark_df)} oracle={len(ora_df)}")
            continue
        # dtype gate: the driver's exact hash does NOT have our float
        # tolerance, so an int64-vs-float64 column (DuckDB HUGEINT via
        # pandas) passes here but fails there. Flag it as a failure.
        dbad = None
        for col in sc:
            ka = spark_df[col].dtype.kind
            kb = ora_df[col].dtype.kind
            if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
                dbad = (f"DTYPE_MISMATCH col={col} spark={spark_df[col].dtype}"
                        f" oracle={ora_df[col].dtype}"
                        " (HUGEINT/int-vs-float: driver hash will diverge)")
                break
        if dbad:
            results[name] = dbad
            continue
        a = spark_df[sc].copy()
        b = ora_df[oc].copy()
        key = [str(tuple(str(norm(v)) for v in row)) for row in a.itertuples(index=False)]
        a = a.iloc[sorted(range(len(key)), key=lambda i: key[i])].reset_index(drop=True)
        key = [str(tuple(str(norm(v)) for v in row)) for row in b.itertuples(index=False)]
        b = b.iloc[sorted(range(len(key)), key=lambda i: key[i])].reset_index(drop=True)
        bad = None
        for col in sc:
            av, bv = list(a[col]), list(b[col])
            for i, (x, y) in enumerate(zip(av, bv)):
                xl = x.tolist() if hasattr(x, "tolist") else x
                yl = y.tolist() if hasattr(y, "tolist") else y
                if isinstance(xl, list) or isinstance(yl, list):
                    ok = len(xl) == len(yl) and all(
                        cmp_cell(p, q) for p, q in zip(xl, yl))
                else:
                    ok = cmp_cell(xl, yl)
                if not ok:
                    bad = f"CELL_MISMATCH col={col} row={i} spark={x!r} oracle={y!r}"
                    break
            if bad:
                break
        results[name] = bad or "ok"
    n_ok = sum(1 for v in results.values() if v == "ok")
    n_no = sum(1 for v in results.values() if v.startswith("no_oracle"))
    for k, v in results.items():
        flag = "  " if v == "ok" else ("~ " if v.startswith("no_oracle") else "X ")
        print(f"{flag}{k}: {v}")
    print(f"\n{n_ok} ok, {n_no} no_oracle, "
          f"{len(results) - n_ok - n_no} FAILED of {len(results)}")


if __name__ == "__main__":
    main()
