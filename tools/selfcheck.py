#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from oracle_sql.json, loads the Spark-written result parquet, sorts
columns by name + rows by all columns, and compares values exactly.
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC so Spark (UTC-adjusted) and DuckDB (naive) align
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_t = con.sql(f"SELECT * FROM read_parquet({files!r})").arrow()
            exp_t = con.sql(oracle[name]).arrow()
            # Strict type gate BEFORE pandas coercion: the driver hashes
            # DECIMAL differently than DOUBLE, and .df() masks that by
            # coercing both to float64. Any decimal in either side, or any
            # spark-vs-oracle type mismatch, is a failure here even when the
            # float values agree.
            type_errs = []
            got_types = {f.name: f.type for f in got_t.schema}
            exp_types = {f.name: f.type for f in exp_t.schema}
            for cn, ct in got_types.items():
                if pa.types.is_decimal(ct):
                    type_errs.append(f"spark col {cn} is {ct} (decimal must not reach output)")
            for cn, ct in exp_types.items():
                if pa.types.is_decimal(ct):
                    type_errs.append(f"oracle col {cn} is {ct} (decimal must not reach output)")
            for cn in sorted(set(got_types) & set(exp_types)):
                g, e = got_types[cn], exp_types[cn]
                # allow width-only differences within the same family
                fam = lambda t: ("int" if pa.types.is_integer(t) else
                                 "float" if pa.types.is_floating(t) else
                                 "ts" if pa.types.is_timestamp(t) else str(t))
                if fam(g) != fam(e):
                    type_errs.append(f"col {cn}: spark {g} vs oracle {e}")
            if type_errs:
                print(f"FAIL {name}: type mismatch: " + "; ".join(type_errs))
                n_fail += 1
                continue
            got = canon(got_t.to_pandas())
            exp = canon(exp_t.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # sentinel for nulls: pandas treats None/NaN as NA in comparisons,
        # so None != None would read as a mismatch
        NULL = "<@null@>"
        neq = (got.astype(object).where(pd.notna(got), NULL)
               != exp.astype(object).where(pd.notna(exp), NULL))
        if neq.any().any():
            bad_cols = [c for c in got.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} first row {i}:")
            print("  got:", got.iloc[i].to_dict())
            print("  exp:", exp.iloc[i].to_dict())
            # dtype hint
            print("  dtypes got:", dict(got.dtypes.astype(str)),
                  "exp:", dict(exp.dtypes.astype(str)))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
