#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every <name>.parquet under verifyOutDir (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-naive everything for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        got = canon(pd.read_parquet(d))
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"cols spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"rows spark={len(got)} duck={len(exp)}")
        else:
            g = got.sort_values(list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            for c in got.columns:
                gc, ec = g[c], e[c]
                try:
                    eq = (gc.fillna("__N__") == ec.fillna("__N__")).all() if gc.dtype == object \
                        else ((gc.isna() & ec.isna()) | (gc == ec)).all()
                except Exception:
                    eq = gc.astype(str).equals(ec.astype(str))
                if not eq:
                    bad = (~((gc.isna() & ec.isna()) | (gc.astype(str) == ec.astype(str)))).idxmax()
                    status.append(f"col {c} differs, e.g. row {bad}: spark={gc[bad]!r} duck={ec[bad]!r}")
            # dtype note (not a failure, informational)
            dt = [f"{c}: {got[c].dtype}!={exp[c].dtype}" for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
            if dt and not status:
                status.append("DTYPE-ONLY " + "; ".join(dt))
        if not status:
            print(f"✓ {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"✗ {name}: " + " | ".join(status[:3]))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
