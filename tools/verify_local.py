#!/usr/bin/env python3
"""Local twin of the driver's DuckDB-oracle compare.

Usage: python tools/verify_local.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query output parquet under <outDir>/<name>/ and its oracle SQL in
<outDir>/oracle_sql.json: runs the SQL in DuckDB over the same tables,
sorts columns by name + rows by all columns, and compares EXACTLY
(strictest possible gate — if this passes, any reasonable driver hash
passes).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, rest -> string
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); fails += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            raw = con.sql(oracle[name]).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL error: {ex}"); fails += 1; continue
        # dtype audit BEFORE canon widens everything: a Spark integral
        # column whose oracle comes back float is the DuckDB
        # sum(INTEGER)->HUGEINT->float64 trap — the driver's hash is
        # type-sensitive, so this is a real red even when values match
        # (r11's sm9_ppl_tiers). Fix is CAST(... AS BIGINT) in the SQL.
        raw_got = pd.concat([pd.read_parquet(f) for f in files])
        tfails = []
        for c in raw_got.columns:
            if c in raw.columns:
                gi = pd.api.types.is_integer_dtype(raw_got[c])
                wf = pd.api.types.is_float_dtype(raw[c])
                if gi and wf:
                    tfails.append(f"{c}: spark {raw_got[c].dtype} vs oracle {raw[c].dtype}")
        if tfails:
            print(f"[TYPE] {name}: " + "; ".join(tfails)); fails += 1; continue
        want = canon(raw)
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}"); fails += 1; continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
        mismatch = []
        for c in got.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(g):
                eq = (g.isna() & w.isna()) | (g == w)
                if not eq.all():
                    bad = (~eq).sum()
                    md = float(np.nanmax(np.abs(g.astype(float) - w.astype(float))))
                    mismatch.append(f"{c}: {bad} diffs, maxabs={md:g}")
            else:
                eq = (g.isna() & w.isna()) | (g == w)
                if not eq.all():
                    i = int(np.argmax(~eq.to_numpy()))
                    mismatch.append(f"{c}: {(~eq).sum()} diffs, first@{i}: {g.iloc[i]!r} != {w.iloc[i]!r}")
        if mismatch:
            print(f"[FAIL] {name}: " + "; ".join(mismatch)); fails += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    print(("ALL GREEN" if fails == 0 else f"{fails} FAILURES"))
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
