"""Skew-handling primitives (SURVEY mandate: "skewed keys → salting or AQE
skew-join").

AQE's skew-join splitting is on by default in our session configs; these
helpers cover the cases AQE can't fix: a single hot GROUP BY key (AQE
can't split a hash aggregate) and a hot broadcast-ineligible join key.

Both are pure expression rewrites — deterministic (salt derives from a
hash of stable columns, never rand()) and algebraically exact for the
decomposable aggregates they accept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation for count/sum (decomposable aggs):
    stage 1 groups by (keys, salt) — the hot key fans out over `n_salts`
    reducers — stage 2 re-aggregates the per-salt partials. The salt is a
    hash of `salt_cols` (stable row attributes), so results are
    deterministic and partition-invariant."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        )
    )
    return stage1.groupBy(*group_cols).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int,
    salt_cols: list[str],
) -> DataFrame:
    """Skew-safe equi-join: fact side gets a deterministic salt in
    [0, n_salts); the (small-ish but not broadcastable) dim side is
    replicated n_salts× via an explode, so a hot key's rows spread over
    n_salts reducers instead of one.

    salt_cols MUST distinguish rows WITHIN a key (e.g. the fact table's
    own primary key) — salting by the join key itself would give every
    row of a hot key the same salt and mitigate nothing."""
    if not salt_cols or salt_cols == [key]:
        raise ValueError(
            "salt_cols must be row-distinguishing columns, not the join key"
        )
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")
