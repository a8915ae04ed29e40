#!/usr/bin/env python3
"""Dev-loop oracle checker (mimics the driver's DuckDB compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query...]

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet, and
compares: schema (column names), row count, and values (columns sorted by
name, rows sorted, exact equality; floats compared exactly first, then with
tolerance for diagnostics).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd


def pandas_dtype_check(name, res_dir, con, duck_df):
    """Mimic the driver's pandas-level compare: Spark parquet via
    pd.read_parquet, oracle via duckdb .df(). Flags only the mismatch
    CLASSES the round-2 driver hash actually rejected: int-vs-float kind
    (DuckDB count_if->float64 vs Spark int64: q53), Decimal cells vs float
    (q58), and array/ndarray cells which crash the driver's sort (q42).
    Width (int32 vs int64) and datetime resolution (ns vs us) differences
    passed the driver hash in round 2, so they are NOT flagged."""
    try:
        spark_df = pd.read_parquet(res_dir)
    except Exception as e:
        return f"pandas load failed: {type(e).__name__}: {e}"
    if set(spark_df.columns) != set(duck_df.columns):
        return None  # column mismatch reported by the value-level compare

    def cell_type(df, c):
        s = df[c].dropna()
        return type(s.iloc[0]).__name__ if len(s) else None

    probs = []
    for c in sorted(spark_df.columns):
        gk, ek = spark_df[c].dtype.kind, duck_df[c].dtype.kind
        gt, et = cell_type(spark_df, c), cell_type(duck_df, c)
        if gt == "ndarray" or et == "ndarray":
            probs.append(f"{c}: array-typed cells (unhashable in driver sort)")
        elif {gk, ek} <= {"i", "u", "f"} and ("f" in (gk, ek)) and gk != ek:
            probs.append(f"{c}: spark dtype kind {gk} vs oracle {ek} "
                         f"(int-vs-float stringifies differently)")
        elif "O" in (gk, ek) and gk != ek and "Decimal" in (gt, et):
            probs.append(f"{c}: spark cell {gt} vs oracle {et}")
        elif gk == ek == "O" and gt and et and gt != et and "Decimal" in (gt, et):
            probs.append(f"{c}: spark cell {gt} vs oracle {et}")
    return "; ".join(probs) if probs else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [colnames[i] for i in order], out


def vals_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
    except Exception:
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            # Materialize the oracle ONCE (the all-pairs ngram oracle is
            # ~1000 s at sf0.1): both the value fetch and the dtype-check
            # .df() read the temp table, preserving DuckDB's result types.
            con.execute(f"CREATE OR REPLACE TEMP TABLE __oracle AS {sql}")
            exp = con.execute("SELECT * FROM __oracle")
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs oracle {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(gr, er)):
            if not all(vals_eq(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: first diff at row {i}:")
            for c, x, y in zip(gc, g, e):
                marker = "  <-- DIFF" if not vals_eq(x, y) else ""
                print(f"    {c}: spark={x!r} oracle={y!r}{marker}")
            n_fail += 1
        else:
            dtype_prob = pandas_dtype_check(
                name, res_dir, con, con.execute("SELECT * FROM __oracle").df())
            if dtype_prob:
                print(f"FAIL {name}: values match but pandas dtypes differ "
                      f"(driver hash would mismatch): {dtype_prob}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
