"""Batch-134 tests: growth accounting, local Moran's I, MRR bridge —
python oracles + accounting identities."""

from collections import Counter, defaultdict


def test_growth_accounting_identities(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext139 import (
        q_growth_accounting,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.week: r for r in q_growth_accounting(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    uw = {(e.user_id, (e.ts.day - 1) // 7) for e in ev}
    firsts = {}
    for u, w in uw:
        firsts[u] = min(firsts.get(u, 99), w)
    weekly = defaultdict(lambda: Counter())
    for u, w in uw:
        if w == firsts[u]:
            weekly[w]["new"] += 1
        elif (u, w - 1) in uw:
            weekly[w]["retained"] += 1
        else:
            weekly[w]["resurrected"] += 1
    active = Counter(w for _, w in uw)
    assert set(got) == set(active)
    for w, r in got.items():
        c = weekly[w]
        assert r.active == active[w]
        assert r.new_users == c["new"]
        assert r.retained == c["retained"]
        assert r.resurrected == c["resurrected"]
        # identity 1: active = new + retained + resurrected
        assert r.active == r.new_users + r.retained + r.resurrected
        # identity 2: churned = prev active - retained
        prev = active.get(w - 1, 0)
        assert r.churned_from_prev == prev - c["retained"]


def test_local_morans_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
    from arrow_supercluster_spark.operators import grid_cluster as gc
    from arrow_supercluster_spark.plans.registry_ext139 import (
        _LM_SCALE,
        _LM_TOP,
        _LM_ZOOM,
        q_local_morans,
    )
    from arrow_supercluster_spark.plans.registry_core import _points_xy

    got = [
        (r.cell_x, r.cell_y, r.n_nbrs, r.local_i, r.quadrant)
        for r in q_local_morans(spark, sf_dir).collect()
    ]
    cells = Counter(
        (r.cell_x, r.cell_y)
        for r in gc.with_cells(
            _points_xy(spark, sf_dir), _LM_ZOOM, OPTS
        ).collect()
    )
    mu = sum(cells.values()) / len(cells)
    dev = {k: round((v - mu) * _LM_SCALE) for k, v in cells.items()}
    m2 = sum(d / _LM_SCALE * d for d in dev.values()) / len(dev)
    rows = []
    for (x, y), d in dev.items():
        nbrs = [
            dev[(x + dx, y + dy)]
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
            if (x + dx, y + dy) in dev
        ]
        if not nbrs:
            continue
        lag = sum(nbrs)
        li = round(d / _LM_SCALE * (lag / _LM_SCALE) / m2, 6)
        quad = (
            "HH" if d >= 0 and lag >= 0
            else "LL" if d < 0 and lag < 0
            else "HL" if d >= 0 else "LH"
        )
        rows.append((x, y, len(nbrs), li, quad))
    rows.sort(key=lambda r: (-abs(r[3]), r[0], r[1]))
    assert got == rows[:_LM_TOP]
    # hotspots exist SOMEWHERE on a clustered field (the top-|I| list
    # may legitimately be all outlier quadrants at small SF)
    assert any(q == "HH" for _, _, _, _, q in rows)
    assert {q for _, _, _, _, q in got} <= {"HH", "LL", "HL", "LH"}


def test_mrr_bridge_identity(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext139 import q_mrr_bridge
    from arrow_supercluster_spark.sources.tables import read_events

    got = q_mrr_bridge(spark, sf_dir).collect()
    assert got
    for r in got:
        # the bridge is a PARTITION of the week-over-week delta
        assert (
            r.rev_cents
            == r.prev_rev_cents
            + r.new_rev
            + r.resurrected_rev
            + r.expansion_rev
            - r.contraction_rev
            - r.churned_rev
        ), r
    # python oracle for one representative week (the second one)
    ev = read_events(spark, sf_dir).collect()
    uw = defaultdict(int)
    for e in ev:
        if e.event_type == "purchase":
            uw[(e.user_id, (e.ts.day - 1) // 7)] += round(e.value * 100)
    users = {u for u, _ in uw} | {e.user_id for e in ev}
    weeks = sorted({(e.ts.day - 1) // 7 for e in ev})
    w = weeks[1]
    firsts = {}
    for (u, ww), c in uw.items():
        if c > 0:
            firsts[u] = min(firsts.get(u, 99), ww)
    rev = sum(uw.get((u, w), 0) for u in users)
    prev = sum(uw.get((u, w - 1), 0) for u in users)
    new = sum(
        uw.get((u, w), 0)
        for u in users
        if uw.get((u, w), 0) > 0 and firsts.get(u) == w
    )
    r = next(x for x in got if x.week == w)
    assert r.rev_cents == rev
    assert r.prev_rev_cents == prev
    assert r.new_rev == new
