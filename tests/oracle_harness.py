"""Local emulation of the driver's DuckDB differential harness (SURVEY §5
layer 1): run each registry query in Spark AND its SQL twin in DuckDB over
the same parquet, compare row count, column names, and the order-insensitive
multiset of values — exactly the failure surface of CORRECTNESS_r{N}.json.

STRICT since round 3: the driver's value-hash is exact and type-sensitive
(DuckDB SUM(BIGINT) → HUGEINT → pandas float64 `19525.0` hashes differently
from Spark's bigint `19525` even though the numbers are equal).  Rounds 1-2
masked that class by canonicalizing floats with round() and comparing via
Python `==` (int == float).  `_canon` now tags every value with a type class
(int vs float vs bool vs str ...) and compares float bits exactly, so local
green ⇒ driver green.  SQL twins must CAST integer sums back to BIGINT.
"""

from __future__ import annotations

import math
import struct
from decimal import Decimal

import duckdb
import numpy as np
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


def _canon_value(v):
    """(type-tag, canonical value).  int and float NEVER compare equal."""
    if v is None:
        return ("-", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("-", None)
        # exact BIT pattern (ADVICE r3): the driver hashes exact values,
        # so -0.0 must not compare equal to 0.0 here; bytes also give the
        # canonical tuples a total order (see _canon's sort)
        return ("f", struct.pack(">d", f))
    if isinstance(v, Decimal):
        # as_tuple(): scale-sensitive like the driver's exact hash AND
        # totally ordered, so equal-value/different-scale decimals can't
        # misalign the multiset sort (ADVICE r3)
        return ("d", v.as_tuple())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon_value(x) for x in v))
    return ("s", v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            # pandas NaN/NaT sentinels for missing values in object columns
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                canon_row.append(("-", None))
            else:
                canon_row.append(_canon_value(v))
        rows.append(tuple(canon_row))
    # the canonical tuples are totally ordered (type tag first; floats as
    # big-endian bit bytes, decimals as as_tuple()) — sort on them
    # directly, not on repr, so equal multisets always align (ADVICE r3)
    return sorted(rows)


_INTY = frozenset("iu")


def _dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return "i" if k in _INTY else k


def driver_canon_probe(df: pd.DataFrame) -> str | None:
    """Emulate the step of the DRIVER's canonicalizer that diverges from
    this module's `_canon`: the driver sorts the pandas frame with
    `sort_values` over the RAW cells (its traceback in CORRECTNESS_r10
    shows `_canon` → `sort_values` → `Categorical` → `factorize`), which
    requires every cell to be hashable and orderable — list/ndarray cells
    crash it with `TypeError: unhashable type: 'list'` even when the
    values are correct (VERDICT r10 "What's wrong" #1: q_label_centroids,
    q_inverted_index).  `_canon` below tuple-izes cells first and never
    trips on this, so local green did NOT imply driver green for array
    outputs.  Returns an error string if the driver's path would crash,
    else None.  Run on BOTH frames by `compare`, and on every rotation
    candidate before it enters the 50-slot driver window."""
    try:
        cols = sorted(df.columns)
        df.reindex(cols, axis=1).sort_values(by=cols)
    except Exception as e:  # noqa: BLE001 — any crash here is the finding
        return f"driver _canon would fail: {type(e).__name__}: {e}"
    return None


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    errs = []
    sp = spark_df.toPandas()
    dk = con.execute(sql).fetchdf()
    for side, frame in (("spark", sp), ("duck", dk)):
        probe = driver_canon_probe(frame)
        if probe:
            errs.append(f"{name}: [{side}] {probe}")
    if errs:
        return errs
    if sorted(sp.columns) != sorted(dk.columns):
        errs.append(f"{name}: columns spark={sorted(sp.columns)} duck={sorted(dk.columns)}")
        return errs
    if len(sp) != len(dk):
        errs.append(f"{name}: rowcount spark={len(sp)} duck={len(dk)}")
        return errs
    # driver-style type sensitivity surfaced at the column level first so the
    # failure message names the offending column, not just a value diff
    for c in sorted(sp.columns):
        ks, kd = _dtype_kind(sp[c]), _dtype_kind(dk[c])
        if ks != kd and "O" not in (ks, kd):  # object columns checked by value
            errs.append(f"{name}: dtype mismatch col={c} spark={sp[c].dtype} duck={dk[c].dtype}")
    if errs:
        return errs
    a, b = _canon(sp), _canon(dk)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        errs.append(f"{name}: value mismatch, first diffs {diff}")
    return errs
