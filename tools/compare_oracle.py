#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare (rows, schema, value hash)
against the Spark result parquet written by graft.Verify.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            if getattr(df[c].dtype, 'tz', None) is not None:
                df[c] = df[c].dt.tz_convert('UTC').dt.tz_localize(None)
            df[c] = df[c].astype('datetime64[us]')
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None and not (isinstance(v, float) and np.isnan(v)) else None)
    df = df.sort_values(by=list(df.columns), kind='mergesort', na_position='last').reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failed.append(name); continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failed.append(name); continue
        got = canon(duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failed.append(name); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failed.append(name); continue
        eq = True
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = np.allclose(a.astype(float).fillna(-9e99),
                                 b.astype(float).fillna(-9e99), rtol=0, atol=0)
                exact = ok
            else:
                exact = a.astype(str).fillna('\0').equals(b.astype(str).fillna('\0'))
            if not exact:
                bad = (a.astype(str) != b.astype(str))
                idx = bad[bad].index[:3].tolist()
                print(f"FAIL {name}: col {c} differs at rows {idx}: got={a.iloc[idx[0]] if idx else '?'} want={b.iloc[idx[0]] if idx else '?'}")
                eq = False
        if eq:
            print(f"OK   {name}: {len(got)} rows")
        else:
            failed.append(name)
    print(f"\n{len(oracle)-len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
