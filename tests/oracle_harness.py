"""Local emulation of the driver's DuckDB differential harness (SURVEY §5
layer 1): run each registry query in Spark AND its SQL twin in DuckDB over
the same parquet, compare row count, column names, and the order-insensitive
multiset of values — exactly the failure surface of CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    errs = []
    sp = spark_df.toPandas()
    dk = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(dk.columns):
        errs.append(f"{name}: columns spark={sorted(sp.columns)} duck={sorted(dk.columns)}")
        return errs
    if len(sp) != len(dk):
        errs.append(f"{name}: rowcount spark={len(sp)} duck={len(dk)}")
        return errs
    a, b = _canon(sp), _canon(dk)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        errs.append(f"{name}: value mismatch, first diffs {diff}")
    return errs
