"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry against ``oracle_sql()`` via DuckDB on
the same parquet tables: row count, schema (column names), and an
order-insensitive value hash (sort columns by name, sort rows, hash).

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) \
                if getattr(df[c].dt, "tz", None) is not None else df[c]
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()


def main() -> int:
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the KG oracles read a materialized store at a deterministic path
    # keyed by fixture size; pin them to the sf being checked (the
    # driver, which never sets this, gets the sf0.01 default it runs at)
    os.environ["GUACRAY_ORACLE_SF"] = os.path.basename(
        os.path.normpath(sf_dir))

    import __ray_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = norm(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only, {len(got)} rows")
            continue
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: sql error: {e}")
            failures += 1
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"schema ray={list(got.columns)} sql={list(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows ray={len(got)} sql={len(exp)}")
        if not problems and value_hash(got) != value_hash(exp):
            diff_cols = [c for c in got.columns
                         if not got[c].equals(exp[c])]
            problems.append(f"value-hash mismatch in cols {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c] != exp[c]
                print(f"  {name}.{c}: {neq.sum()} differing rows, e.g.\n",
                      pd.concat([got[c][neq].head(3), exp[c][neq].head(3)],
                                axis=1, keys=["ray", "sql"]))
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
