"""Batch-90 tests: feature-hash reconstruction, independent PAV parity,
MASE on a perfectly-seasonal crafted series."""

import tempfile

from pyspark.sql import functions as F


def test_feature_hashing_reconstructs_signed_counts(spark, sf_dir):
    """Recompute every doc's sparse vector in pure Python with the same
    polynomial hash and compare exactly (including collision
    cancellation and zero-drop)."""
    from arrow_supercluster_spark.plans.registry_ext95 import (
        _FH_D,
        _P,
        q_feature_hashing,
    )
    from arrow_supercluster_spark.operators.dedup import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", normalize_text(F.col("text")).alias("t")
    ).collect()

    def polyhash(w):
        h = ord(w[0])
        for ch in w[1:]:
            h = (h * 31 + ord(ch)) % _P
        return h

    want = {}
    for r in docs:
        vec = {}
        for w in r.t.split(" "):
            h = polyhash(w)
            idx = h % _FH_D
            sign = 1 if (h // _FH_D) % 2 == 0 else -1
            vec[idx] = vec.get(idx, 0) + sign
        for idx, v in vec.items():
            if v != 0:
                want[(r.doc_id, idx)] = v
    got = {
        (r.doc_id, r.idx): r.val
        for r in q_feature_hashing(spark, sf_dir).collect()
    }
    assert got == want


def test_isotonic_matches_independent_pav(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext95 import (
        _H_MOD,
        _H_MULT,
        _ISO_BINS,
        q_isotonic_calibration,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = q_isotonic_calibration(spark, sf_dir).collect()
    # monotone non-decreasing rates — the isotonic contract
    rates = [r.rate for r in sorted(rows, key=lambda r: r.score_lo)]
    assert rates == sorted(rates)
    # independent PAV from raw per-user labels
    ev = read_events(spark, sf_dir).groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("label")
    ).collect()
    cells = {}
    for r in ev:
        s = ((r.user_id * _H_MULT) % _H_MOD) / float(_H_MOD)
        c = int(s * _ISO_BINS)
        lo, hi, n, pos = cells.get(c, (1.0, 0.0, 0, 0))
        cells[c] = (min(lo, s), max(hi, s), n + 1, pos + r.label)
    pools = [
        {"lo": lo, "hi": hi, "n": n, "pos": p}
        for _, (lo, hi, n, p) in sorted(cells.items())
    ]
    i = 0
    while i < len(pools) - 1:
        a, b = pools[i], pools[i + 1]
        if a["pos"] * b["n"] > b["pos"] * a["n"]:
            a["hi"], a["n"], a["pos"] = b["hi"], a["n"] + b["n"], a["pos"] + b["pos"]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    want = [
        (round(p["lo"], 6), round(p["hi"], 6), p["n"], round(p["pos"] / p["n"], 6))
        for p in pools
    ]
    got = [
        (r.score_lo, r.score_hi, r.n, r.rate)
        for r in sorted(rows, key=lambda r: r.score_lo)
    ]
    assert got == want
    # conservation: pooled users = all users
    assert sum(r.n for r in rows) == len(ev)


def test_mase_perfect_weekly_seasonality_scores_zero(spark):
    from arrow_supercluster_spark.plans.registry_ext95 import q_mase

    rows = []
    eid = 0
    # event type 'a': perfectly periodic with period 7 (volume = weekday
    # index + 1) over 28 days → lag-7 naive error 0
    for day in range(28):
        for _ in range((day % 7) + 1):
            eid += 1
            rows.append((eid, 1, "a", f"2024-01-{day + 1:02d} 00:00:00"))
    # event type 'b': linearly growing → nonzero naive error
    for day in range(28):
        for _ in range(day + 1):
            eid += 1
            rows.append((eid, 2, "b", f"2024-01-{day + 1:02d} 00:00:00"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, t string"
        ).select(
            "event_id", F.to_timestamp("t").alias("ts"), "user_id",
            "event_type", F.lit(1.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        ).write.parquet(f"{d}/events.parquet")
        got = {r.event_type: r for r in q_mase(spark, d).collect()}
        assert got["a"].mae_naive7 == 0.0
        assert got["a"].mase_self is None          # 0/0 → NULL
        assert got["a"].mase_vs_pool == 0.0
        assert got["b"].mae_naive7 == 7.0          # growth of 7/week
        assert got["b"].mase_self == 1.0


def test_pav_boundary_characterization_equals_sequential_pav():
    """The r7 SQL twin's theorem: strict-violation PAV's final pools are
    exactly the segments whose internal boundaries admit a straddling
    interval pair with avg(j..i) > avg(i+1..k), and whose surviving
    boundaries admit none.  Replayed here in pure Python against the
    sequential merge loop on random cell tables (tie-heavy: pos may be
    0, so adjacent equal-rate pools must stay unmerged)."""
    import random

    def pav(cells):
        pools = [
            {"n": n, "pos": p, "lo": i, "hi": i}
            for i, (n, p) in enumerate(cells)
        ]
        i = 0
        while i < len(pools) - 1:
            a, b = pools[i], pools[i + 1]
            if a["pos"] * b["n"] > b["pos"] * a["n"]:
                a["hi"] = b["hi"]
                a["n"] += b["n"]
                a["pos"] += b["pos"]
                del pools[i + 1]
                if i > 0:
                    i -= 1
            else:
                i += 1
        return [(p["lo"], p["hi"], p["n"], p["pos"]) for p in pools]

    def boundary_pools(cells):
        B = len(cells)
        cn = [0] * (B + 1)
        cp = [0] * (B + 1)
        for i, (n, p) in enumerate(cells):
            cn[i + 1] = cn[i] + n
            cp[i + 1] = cp[i] + p
        surv = [
            all(
                (cp[i + 1] - cp[j]) * (cn[k + 1] - cn[i + 1])
                <= (cp[k + 1] - cp[i + 1]) * (cn[i + 1] - cn[j])
                for j in range(i + 1)
                for k in range(i + 1, B)
            )
            for i in range(B - 1)
        ]
        pools, lo = [], 0
        for i in range(B - 1):
            if surv[i]:
                pools.append((lo, i, cn[i + 1] - cn[lo], cp[i + 1] - cp[lo]))
                lo = i + 1
        pools.append((lo, B - 1, cn[B] - cn[lo], cp[B] - cp[lo]))
        return pools

    rng = random.Random(7)
    for _ in range(3000):
        cells = [
            (n, rng.randint(0, n))
            for n in (rng.randint(1, 5) for _ in range(rng.randint(1, 12)))
        ]
        assert pav(cells) == boundary_pools(cells), cells
