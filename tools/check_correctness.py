"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at the given sf dir, runs the matching
oracle_sql() through DuckDB over the same parquet tables, and compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified with float
rounding). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            try:
                if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                    df[c] = df[c].map(
                        lambda v: json.dumps(np.round(np.asarray(v, dtype=float), 4).tolist())
                    )
            except Exception:
                pass
    df = df.astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        canon(df).to_csv(index=False).encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    # a typo'd query name must FAIL, not silently run zero checks
    unknown = only - set(qs)
    for name in sorted(unknown):
        print(f"FAIL {name}: no such query")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value hash mismatch")
            a, b = canon(mine), canon(ref)
            if len(a) == len(b):
                neq = (a != b).any(axis=1)
                print(a[neq].head(3).to_string(), "\n--vs--\n", b[neq].head(3).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{dt:.1f}s]")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(mine)} hash match [{dt:.1f}s]")
    ray.shutdown()
    ran = len(qs if not only else (only & set(qs))) + len(unknown)
    print(f"== {ran - failures}/{ran} ok, {failures} failed ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
