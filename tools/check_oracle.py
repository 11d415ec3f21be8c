#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(outDir/<name>/ parquet + oracle_sql.json), runs each oracle SQL in DuckDB
over the sf-dir parquet tables, and compares values sorted by column name.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float-ish columns for hashing comparisons
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

# Types Spark can emit through the driver's type-sensitive hash. Anything
# else in an oracle's output schema (HUGEINT from sum(BIGINT)/windowed sums,
# UHUGEINT, DECIMAL, INTERVAL, ...) hash-mismatches even when every value is
# bit-identical — cast in the oracle SQL instead (e.g. sum(x)::BIGINT).
# ARRAY RULE (round-12, from the r11 llm_pack_examples red row): the driver's
# pandas harness sorts rows BY VALUE before hashing, and numpy arrays are
# unhashable in sort_values — so NO array/list/map/struct column may appear
# in a gate's output, even of an ok base type. Serialize in the query
# (array_join in Spark, array_to_string in the oracle) or posexplode to rows.
SPARK_TYPES = {"BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
               "TIMESTAMP WITH TIME ZONE", "BLOB"}

def bad_types(con, sql):
    """Columns of the oracle whose DuckDB type the driver gate cannot hash:
    non-Spark scalars, and ANY nested type (array/map/struct)."""
    desc = con.sql(f"DESCRIBE {sql}").df()
    bad = []
    for _, r in desc.iterrows():
        t = r["column_type"].strip().upper()
        if t not in SPARK_TYPES:
            bad.append(f"{r['column_name']}:{t}")
    return bad

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            bad = bad_types(con, oracle[name])
            if bad:
                print(f"FAIL {name}: oracle emits non-Spark types {bad} "
                      f"(driver hash is type-sensitive; cast in oracle SQL)")
                n_fail += 1; continue
            bad_spark = bad_types(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            if bad_spark:
                print(f"FAIL {name}: SPARK output emits non-hashable types "
                      f"{bad_spark} (driver sort_values dies on array cells; "
                      f"array_join in the query)")
                n_fail += 1; continue
            got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # exact compare with float tolerance reporting
        mismatch = None
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                import numpy as np
                ga, ea = g.to_numpy(dtype=float), e.to_numpy(dtype=float)
                both_nan = pd.isna(ga) & pd.isna(ea)
                eq = (ga == ea) | both_nan
                if not eq.all():
                    bad = (~eq).nonzero()[0][:3]
                    mismatch = f"col {c}: {[(ga[i], ea[i]) for i in bad]} (n={(~eq).sum()})"
                    maxdiff = float(pd.Series(abs(ga - ea)).max())
                    mismatch += f" maxdiff={maxdiff:.3e}"
                    break
            elif g.dtype.kind in "iu" and e.dtype.kind in "iu":
                import numpy as np
                if not (g.to_numpy(dtype="int64") == e.to_numpy(dtype="int64")).all():
                    mismatch = f"col {c}: int values differ"
                    break
            else:
                if not g.equals(e):
                    bad = g[g != e].index[:3].tolist()
                    mismatch = f"col {c}: rows {bad} got={g[bad].tolist()} exp={e[bad].tolist()}"
                    break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    missing = [n for n in sorted(set(os.listdir(out_dir)) - set(oracle)
               - {"oracle_sql.json"}) if os.path.isdir(f"{out_dir}/{n}")]
    if missing:
        print(f"rows-only (no oracle): {missing}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
