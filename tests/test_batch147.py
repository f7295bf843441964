"""Batch-147 tests: Fleiss kappa / Kendall W / Cochran Q python oracles,
plus agreement extremes on crafted raters."""

import numpy as np


def test_fleiss_kappa_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import tokenize
    from arrow_supercluster_spark.plans.registry_ext152 import (
        q_fleiss_kappa,
    )
    from pyspark.sql import functions as F

    r = q_fleiss_kappa(spark, sf_dir).collect()[0]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "n_chars",
            F.size(tokenize(F.col("text"))).alias("nt"),
            F.size(F.array_distinct(tokenize(F.col("text")))).alias("nd"),
        )
        .collect()
    )

    def tier(v, lo, hi):
        return 1 if v < lo else (2 if v < hi else 3)

    mat = []
    for d in docs:
        mat.append(
            [
                tier(d.n_chars, 250, 400),
                tier(d.nt, 45, 75),
                tier(d.nd, 20, 28),
            ]
        )
    mat = np.array(mat)
    n, m = len(mat), 3
    nij = np.zeros((n, 3), int)
    for i, row in enumerate(mat):
        for c in row:
            nij[i, c - 1] += 1
    p_i = ((nij**2).sum(axis=1) - m) / (m * (m - 1))
    p_bar = p_i.mean()
    p_j = nij.sum(axis=0) / (n * m)
    p_e = (p_j**2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert r.n_items == n and r.n_raters == m
    assert abs(r.p_bar - p_bar) < 1e-5
    assert abs(r.p_expected - p_e) < 1e-5
    assert abs(r.fleiss_kappa - kappa) < 1e-5
    assert 0 < r.fleiss_kappa < 1  # correlated-but-not-identical raters


def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """Identical ratings from all three raters => kappa == 1 exactly
    (docs crafted so all three tier functions agree; two categories
    present so P_e < 1)."""
    from arrow_supercluster_spark.plans.registry_ext152 import (
        q_fleiss_kappa,
    )

    rows = []
    for i in range(20):
        if i % 2 == 0:  # tier 1 everywhere: few chars, few tokens
            text = " ".join(f"w{j}" for j in range(12))
            rows.append((i, text, "en", "s", 100))
        else:  # tier 3 everywhere: many chars, many tokens
            text = " ".join(f"w{j}" for j in range(80))
            rows.append((i, text, "en", "s", 500))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = q_fleiss_kappa(spark, str(tmp_path)).collect()[0]
    assert r.fleiss_kappa == 1.0


def test_kendall_w_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext152 import q_kendall_w
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_kendall_w(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("ne"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("rev"),
            F.countDistinct("user_id").alias("nu"),
        )
        .collect()
    )
    n, m = len(daily), 3

    def ranks(key):
        order = sorted(daily, key=lambda x: (-getattr(x, key), x.d))
        return {row.d: i + 1 for i, row in enumerate(order)}

    r1, r2, r3 = ranks("ne"), ranks("rev"), ranks("nu")
    rsums = np.array([r1[x.d] + r2[x.d] + r3[x.d] for x in daily], float)
    ss = ((rsums - m * (n + 1) / 2) ** 2).sum()
    w = 12 * ss / (m**2 * (n**3 - n))
    assert r.n_items == n
    assert abs(r.rank_dispersion - ss) < 1e-6
    assert abs(r.kendall_w - w) < 1e-6
    assert 0 <= r.kendall_w <= 1


def test_cochran_q_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext152 import q_cochran_q
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_cochran_q(spark, sf_dir).collect()[0]
    pu = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("nerr"),
            F.countDistinct(F.dayofmonth("ts")).alias("nd"),
        )
        .collect()
    )
    t = np.array(
        [[u.np >= 14, u.nerr >= 13, u.nd >= 28] for u in pu], int
    )
    k = 3
    cj = t.sum(axis=0)
    ri = t.sum(axis=1)
    big_n = t.sum()
    q = (k - 1) * (k * (cj**2).sum() - big_n**2) / (
        k * big_n - (ri**2).sum()
    )
    assert r.n_users == len(pu)
    assert (r.n_heavy_buyers, r.n_error_prone, r.n_near_daily) == tuple(cj)
    assert abs(r.cochran_q - q) < 1e-6
    assert r.prevalences_differ == (q > 5.991)
