#!/usr/bin/env python3
"""Compare a graft.Verify dump against the DuckDB oracle.

Usage: python3 tools/compare_oracle.py <sf_dir> <verify_dir> [q1,q2,...]

Replays the driver's check: each oracle_sql.json entry runs in DuckDB
over views of the sf parquet tables; the engine's parquet output is
canonicalized (sorted columns, sorted rows) and compared value- and
dtype-exact.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, verify_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        qdir = os.path.join(verify_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"MISS {name}: no engine output")
            n_fail += 1; fails.append(name)
            continue
        try:
            eng = canon(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            ora = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1; fails.append(name)
            continue
        ok = eng.equals(ora)
        if not ok:
            # pinpoint: shape, dtypes, first differing cell
            msg = []
            if eng.shape != ora.shape:
                msg.append(f"shape eng={eng.shape} ora={ora.shape}")
            elif list(eng.dtypes) != list(ora.dtypes):
                msg.append(f"dtypes eng={list(eng.dtypes)} ora={list(ora.dtypes)}")
            else:
                neq = (eng != ora) & ~(eng.isna() & ora.isna())
                cells = list(zip(*neq.values.nonzero()))[:3]
                for r, c in cells:
                    msg.append(f"[{r},{eng.columns[c]}] eng={eng.iat[r, c]!r} "
                               f"ora={ora.iat[r, c]!r}")
            print(f"FAIL {name}: " + "; ".join(msg))
            n_fail += 1; fails.append(name)
        else:
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
