"""Batch-180 tests: gap-fill spine/interpolation replay, 2-D histogram
replay + marginal conservation."""

import numpy as np
from pyspark.sql import functions as F


def test_gap_fill_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext185 import (
        _GF_HOLDOUT_MOD,
        q_gap_fill,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    daily = {}
    for r in rows:
        if r.day.day % _GF_HOLDOUT_MOD != 0:
            daily.setdefault(r.event_type, {}).setdefault(r.day, 0)
            daily[r.event_type][r.day] += 1
    got = {}
    for r in q_gap_fill(spark, sf_dir).collect():
        got[(r.event_type, r.day)] = r
    import datetime

    for t, dd in daily.items():
        days = sorted(dd)
        lo, hi = days[0], days[-1]
        d = lo
        while d <= hi:
            r = got[(t, d.isoformat())]
            if d in dd:
                assert not r.is_gap
                assert r.filled_zero == dd[d]
                assert abs(r.filled_linear - dd[d]) < 1e-6
            else:
                assert r.is_gap and r.filled_zero == 0
                prev = max(x for x in days if x < d)
                nxt = min(x for x in days if x > d)
                frac = (d - prev).days / (nxt - prev).days
                want = dd[prev] + (dd[nxt] - dd[prev]) * frac
                assert abs(r.filled_linear - round(want, 4)) < 1e-6
            d += datetime.timedelta(days=1)
    # every spine row accounted for
    assert len(got) == sum(
        (max(dd) - min(dd)).days + 1 for dd in daily.values()
    )


def test_histogram_2d_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext185 import (
        _H2_VW,
        q_histogram_2d,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select(F.hour("ts").alias("h"), "value")
        .collect()
    )
    cells = {}
    for r in rows:
        vb = min(int(r.value // _H2_VW), 9)
        cells[(r.h, vb)] = cells.get((r.h, vb), 0) + 1
    nh, nv = {}, {}
    for (h, vb), n in cells.items():
        nh[h] = nh.get(h, 0) + n
        nv[vb] = nv.get(vb, 0) + n
    nn = sum(cells.values())
    got = {
        (r.hour, r.value_bucket): r
        for r in q_histogram_2d(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for k, r in got.items():
        h, vb = k
        e = nh[h] * nv[vb] / nn
        assert r.n == cells[k]
        assert abs(r.expected - e) < 1e-3
        assert abs(r.std_resid - (cells[k] - e) / np.sqrt(e)) < 1e-3
    # count conservation; expected mass sums to N MINUS the mass of
    # empty (unemitted) cells, so it can only fall short
    assert sum(r.n for r in got.values()) == nn
    s = sum(r.expected for r in got.values())
    assert s <= nn + 1e-6
    missing = sum(
        nh[h] * nv[vb] / nn
        for h in nh for vb in nv if (h, vb) not in cells
    )
    assert abs(s + missing - nn) < 1e-3
