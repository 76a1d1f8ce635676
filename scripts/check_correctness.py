"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 and compares with the oracle SQL via
DuckDB: row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by all columns, values stringified).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            # exact float repr — the gate is bit-exactness by design
            h.update("\x00".join(repr(v) for v in col.to_numpy()).encode())
        else:
            h.update("\x00".join(str(v) for v in col).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(res)} rows, cols={list(res.columns)} ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            n_fail += 1
            continue
        a, b = canon(res), canon(exp)
        problems = []
        if len(a) != len(b):
            problems.append(f"rows {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        if not problems and value_hash(a) != value_hash(b):
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            problems.append(f"value hash mismatch in {diff_cols}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if len(a) == len(b) and list(a.columns) == list(b.columns):
                for c in a.columns:
                    if not a[c].equals(b[c]):
                        neq = (a[c] != b[c])
                        print(f"    col {c}: first diffs:\n{pd.concat([a[c][neq], b[c][neq]], axis=1).head(3)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
