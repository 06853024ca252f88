#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: run the oracle SQL in DuckDB over the
same parquet tables, then compare against the Spark parquet result —
columns sorted by name, rows sorted by all columns, exact value equality
(floats compared bit-for-bit after round-tripping through float64).
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (list,)) else json.dumps(
                    [str(x) for x in v]))
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only=None, skip=None,
         threads=None) -> int:
    con = duckdb.connect()
    if threads:
        con.execute(f"PRAGMA threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    try:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        # dev-loop dump under SPARK_GRAFT_ONLY (Verify writes the filtered
        # contract under a distinct name so it can't impersonate the full one)
        oracle = json.load(open(f"{out_dir}/oracle_sql.partial.json"))
        print(f"NOTE: using PARTIAL contract ({len(oracle)} queries)")
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    if skip:
        oracle = {k: v for k, v in oracle.items() if k not in skip}
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            got = canon(duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (w, g) in enumerate(zip(wv, gv)):
                weq = (w == g) or (
                    isinstance(w, float) and isinstance(g, float)
                    and math.isnan(w) and math.isnan(g))
                if not weq:
                    bad = (c, i, w, g)
                    break
            if bad:
                break
        if bad:
            c, i, w, g = bad
            d = abs(w - g) if isinstance(w, float) and isinstance(g, float) else ""
            print(f"FAIL {name}: col={c} row={i} oracle={w!r} spark={g!r} diff={d}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(want)} rows)")
    print(f"== {n_ok}/{len(oracle)} match")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    # optional: --only a,b,c | --skip a,b,c | --threads N (for parallel
    # sharding of the extended sf0.1 sweep — the CC-family twins cost
    # the ORACLE ~35 min each and shard one-per-process)
    only = skip = threads = None
    args = sys.argv[3:]
    while args:
        if len(args) < 2:
            raise SystemExit(f"flag {args[0]} needs a value "
                             "(usage: --only a,b | --skip a,b | --threads N)")
        flag, val, args = args[0], args[1], args[2:]
        if flag == "--only":
            only = set(val.split(","))
        elif flag == "--skip":
            skip = set(val.split(","))
        elif flag == "--threads":
            threads = val
        else:
            raise SystemExit(f"unknown flag {flag}")
    sys.exit(main(sys.argv[1], sys.argv[2], only, skip, threads))
