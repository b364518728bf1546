"""Local mimic of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB — row count,
column names, and order-insensitive value comparison.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} "
                        f"duck={sorted(duck_df.columns)}")
        return problems
    if len(ray_df) != len(duck_df):
        problems.append(f"row count: ray={len(ray_df)} duck={len(duck_df)}")
    a, b = normalize(ray_df), normalize(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if str(a[c].dtype).startswith("float"):
                bad = [(x, y) for x, y in zip(av, bv)
                       if not (x == y or (isinstance(x, float)
                               and isinstance(y, float)
                               and (math.isnan(x) and math.isnan(y)
                                    or math.isclose(x, y, rel_tol=1e-9,
                                                    abs_tol=1e-9))))]
            else:
                bad = [(x, y) for x, y in zip(av, bv) if x != y]
            if bad:
                problems.append(f"col {c}: {len(bad)} mismatches, "
                                f"first: {bad[0]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(ray_df)} (no oracle — rows-only)")
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        problems = compare(name, ray_df, duck_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(ray_df)}")
    ran = len([n for n in qs if not only or n in only])
    print(f"\n{ran - len(failed)}/{ran} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
