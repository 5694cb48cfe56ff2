#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over views of the sfDir parquet tables, loads the
matching Spark result parquet, sorts columns by name and rows by all
columns, and compares cell-by-cell. Reports row-count, schema-ish and
value mismatches, plus max float deviation so near-misses are visible
before the real (hash-exact) gate runs.

Driver-side tooling only (duckdb/pandas are not available to the Scala
engine; this script never ships logic into the library).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array cells (e.g. dedup member_ids) are unhashable — compare
    # them through a canonical string form
    for col in df.columns:
        if df[col].map(lambda v: isinstance(v, (list, tuple))
                       or type(v).__name__ == "ndarray").any():
            df[col] = df[col].map(
                lambda v: "[" + ",".join(str(x) for x in v) + "]"
                if v is not None and not (isinstance(v, float) and math.isnan(v))
                else None)
        elif df[col].map(lambda v: isinstance(v, (bytes, bytearray))).any():
            # binary cells (blob frames): canonical hex form
            df[col] = df[col].map(
                lambda v: bytes(v).hex() if isinstance(v, (bytes, bytearray)) else v)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        return a == b, abs(a - b)
    try:
        if pd.isna(a) and pd.isna(b):
            return True, 0.0
    except (TypeError, ValueError):
        pass
    return a == b, None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp_rel = con.sql(sql)
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # Type-strict pre-check: the driver hashes TYPED values, so a
            # DuckDB HUGEINT/DECIMAL oracle vs a Spark BIGINT/DOUBLE result
            # fails the real gate even when every value matches (q79 r7,
            # q135 r14). pandas coerces those away — compare relation types
            # BEFORE materializing through pandas. Compare by CLASS, not
            # name: integer-width drift (BIGINT vs INTEGER) has been
            # hash-green at the driver since r1 (24 registry queries carry
            # it), so only drift ACROSS classes — machine-int vs
            # HUGEINT/DECIMAL vs float vs everything else — is a real
            # failure signal.
            def tclass(t):
                t = str(t)
                if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                         "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                    return "int"
                if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
                    return "bigexact"
                if t in ("FLOAT", "DOUBLE"):
                    return "float"
                return t
            exp_types = dict(zip(exp_rel.columns, [tclass(t) for t in exp_rel.types]))
            got_types = dict(zip(got_rel.columns, [tclass(t) for t in got_rel.types]))
            exp = exp_rel.df()
            got = got_rel.df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if exp_types != got_types and set(exp_types) == set(got_types):
            drift = {c: (exp_types[c], got_types[c])
                     for c in exp_types if exp_types[c] != got_types[c]}
            print(f"FAIL {name}: dtype drift oracle-vs-spark {drift}")
            n_fail += 1
            continue
        exp, got = canon(exp), canon(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = 0
        max_dev = 0.0
        first = None
        for col in exp.columns:
            ev, gv = exp[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                eq, dev = cells_equal(a, b)
                if dev:
                    max_dev = max(max_dev, dev)
                if not eq:
                    bad += 1
                    if first is None:
                        first = (col, i, a, b)
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells, first={first}, max_float_dev={max_dev}")
            n_fail += 1
        else:
            dev = f" (max_float_dev={max_dev})" if max_dev else ""
            print(f"PASS {name}: {len(exp)} rows{dev}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
