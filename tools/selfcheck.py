#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir> [--staged-components]
                    [--only a,b] [--skip a,b]

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from oracle_sql.json, loads the Spark-written result parquet, sorts
columns by name + rows by all columns, and compares values exactly.

--staged-components (second-scale sweeps only; the default stays
byte-faithful to the driver's oracle text): the three component oracles
(q68/q140/q141) share an all-pairs shingle-Jaccard join + recursive-CTE
closure that costs 30-50 DuckDB-MINUTES each at sf0.1. The flag swaps
exactly that scaffold for a mathematically identical staged derivation
(inverted-index pair join on shared shingles with |A∩B| as a group
count and |A∪B| = |A|+|B|-|A∩B|, then bounded min-label propagation to
the same fixpoint = per-component min id), materialized once into a
temp table; each oracle's TAIL (split gate / keep-best / projection)
still runs from its own SQL text. ~1s for all three at sf0.1.
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The shared scaffold of the three component oracles, verbatim as it
# appears in oracle_sql.json (post-stripMargin). Substitution asserts on
# exact presence so a reworded oracle can never silently run unpatched.
COMPONENT_QUERIES = ("q68_neardup_clusters", "q140_leakage_safe_split",
                     "q141_neardup_keep_best")
COMP_CTE = ("comp AS (SELECT node AS doc_id, MIN(t) AS component "
            "FROM reach GROUP BY node),")
Q68_TAIL = ("SELECT node AS doc_id, MIN(t) AS component FROM reach "
            "GROUP BY node ORDER BY doc_id")


def materialize_components(con) -> None:
    """Build _graft_comp(doc_id, component) = the recursive scaffold's
    fixpoint, via inverted-index candidates + bounded label propagation.
    """
    con.sql("""CREATE TEMP TABLE _g_sh AS
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
        list_distinct([array_to_string(ws[i:i+2], ' ')
                       for i in range(1, len(ws) - 1)]) AS sg
      FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
              '\\s+', ' ', 'g'), ' ') AS ws FROM documents)
      WHERE len(ws) >= 3""")
    # |A∩B| as a count over the shingle inverted index; only pairs that
    # share >= 1 shingle can pass Jaccard >= 0.5, so the all-pairs scan
    # is equivalent to this candidate join + the exact predicate
    con.sql("""CREATE TEMP TABLE _g_edges AS
      WITH ex AS (SELECT doc_id, unnest(sg) AS g FROM _g_sh),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ints
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      p AS (SELECT doc_a, doc_b FROM inter
        JOIN (SELECT doc_id, len(sg) AS n FROM _g_sh) sa ON sa.doc_id = doc_a
        JOIN (SELECT doc_id, len(sg) AS n FROM _g_sh) sb ON sb.doc_id = doc_b
        WHERE ints * 2.0 >= (sa.n + sb.n - ints))
      SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p""")
    con.sql("""CREATE TEMP TABLE _g_lbl AS
      SELECT DISTINCT a AS node, a AS lbl FROM _g_edges""")
    while True:  # min-label propagation: fixpoint = component min id
        con.sql("""CREATE OR REPLACE TEMP TABLE _g_lbl2 AS
          SELECT node, MIN(lbl) AS lbl FROM (
            SELECT node, lbl FROM _g_lbl
            UNION ALL
            SELECT e.b AS node, l.lbl FROM _g_edges e JOIN _g_lbl l ON l.node = e.a
          ) GROUP BY node""")
        changed = con.sql("""SELECT count(*) FROM _g_lbl JOIN _g_lbl2
          USING (node) WHERE _g_lbl.lbl <> _g_lbl2.lbl""").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE _g_lbl AS SELECT * FROM _g_lbl2")
        if changed == 0:
            break
    con.sql("""CREATE TEMP TABLE _graft_comp AS
      SELECT node AS doc_id, lbl AS component FROM _g_lbl""")


def staged_sql(name: str, sql: str) -> str:
    """Rewrite a component oracle to read _graft_comp instead of running
    its recursive scaffold; the oracle-specific tail is untouched.
    """
    if name == "q68_neardup_clusters":
        assert Q68_TAIL in sql and "WITH RECURSIVE" in sql, \
            f"{name} oracle no longer matches the staged scaffold"
        return "SELECT doc_id, component FROM _graft_comp ORDER BY doc_id"
    assert sql.count(COMP_CTE) == 1, \
        f"{name} oracle no longer matches the staged scaffold"
    tail = sql.split(COMP_CTE, 1)[1]
    return "WITH comp AS (SELECT doc_id, component FROM _graft_comp)," + tail


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware → naive UTC so Spark (UTC-adjusted) and DuckDB (naive) align
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, argv=()) -> int:
    staged = "--staged-components" in argv
    def listed(flag):
        if flag not in argv:
            return None
        i = list(argv).index(flag) + 1
        if i >= len(argv):
            sys.exit(f"usage: {flag} takes a comma-separated query list")
        return set(argv[i].split(","))
    only, skip = listed("--only"), (listed("--skip") or set())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # a misspelled --only/--skip name must not silently skip everything
    # and exit 0 — that would turn the gate into a false PASS
    unknown = ((only or set()) | skip) - set(oracle)
    if unknown:
        sys.exit(f"unknown query name(s) in --only/--skip: {sorted(unknown)}")
    if staged and any(q in oracle for q in COMPONENT_QUERIES):
        materialize_components(con)
        print("[staged] component scaffold materialized "
              "(inverted-index pairs + bounded label propagation)")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if (only is not None and name not in only) or name in skip:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sql = oracle[name]
            if staged and name in COMPONENT_QUERIES:
                sql = staged_sql(name, sql)
            got_t = con.sql(f"SELECT * FROM read_parquet({files!r})").arrow()
            exp_t = con.sql(sql).arrow()
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
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
