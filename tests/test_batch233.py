"""Batch 233 replay — the Theta(0, 2) forecaster (R682)."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_theta_matches_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    ys = [
        r.y
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("d")
        .collect()
    ]
    n = len(ys)
    st = sum(range(1, n + 1))
    sy = sum(ys)
    sty = sum((t + 1) * y for t, y in enumerate(ys))
    stt = sum(t * t for t in range(1, n + 1))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    z = [2 * y - (a + b * (t + 1)) for t, y in enumerate(ys)]
    al = 0.5
    l = z[0]
    for t in range(1, n):  # SES recursion — must equal the closed form
        l = al * z[t] + (1 - al) * l
    got = {
        r.h: r.forecast
        for r in REGISTRY["q_theta_method"].spark(spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 8))
    for h in range(1, 8):
        want = 0.5 * (a + b * (n + h)) + 0.5 * l
        assert abs(got[h] - want) < 1e-3, (h, got[h], want)
