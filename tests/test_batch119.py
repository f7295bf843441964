"""Batch-119 tests: zone-map skipping, ER clusters, TextTiling —
python oracles + layout/transitivity properties."""

import math
from collections import Counter, defaultdict


def test_zone_map_python_oracle_and_layout_gap(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext124 import (
        _ZM_FILES,
        _ZM_HI,
        _ZM_LO,
        q_zone_map_skipping,
    )

    got = {r.layout: r for r in q_zone_map_skipping(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    n = len(orders)
    files = defaultdict(list)
    for o in orders:
        files[("hash", o.o_orderkey % _ZM_FILES)].append(o.o_totalprice)
    ranked = sorted(orders, key=lambda o: (o.o_totalprice, o.o_orderkey))
    for rk, o in enumerate(ranked):
        files[("sorted", rk * _ZM_FILES // n)].append(o.o_totalprice)
    agg = defaultdict(lambda: [0, 0, 0])
    for (layout, _), vals in files.items():
        e = agg[layout]
        e[0] += 1
        if max(vals) < _ZM_LO or min(vals) > _ZM_HI:
            e[1] += 1
            e[2] += len(vals)
    for layout, (nf, sk, rows) in agg.items():
        r = got[layout]
        assert r.n_files == nf
        assert r.files_skipped == sk
        assert abs(r.skip_fraction - round(sk / nf, 4)) < 1e-9
        assert r.rows_skipped == rows
    # the point of the query: sorted layout skips, hash layout can't
    assert got["sorted"].skip_fraction > got["hash"].skip_fraction
    assert got["sorted"].files_skipped >= _ZM_FILES // 2


def test_er_clusters_union_find_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext115 import (
        _FS_LINK,
        _WB_A,
        _WB_D,
        _WN_A,
        _WN_D,
        _WS_A,
        _WS_D,
    )
    from arrow_supercluster_spark.plans.registry_ext124 import q_er_clusters

    got = {r.size: r.n_entities for r in q_er_clusters(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[c.c_nationkey].append(c)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for c in cust:
        b_digits = c.c_custkey + 1000000 if c.c_custkey % 10 == 0 else c.c_custkey
        b_bal = c.c_acctbal + ((c.c_custkey * 7) % 21 - 10)
        b_seg = "BUILDING" if c.c_custkey % 17 == 0 else c.c_mktsegment
        for a in by_nation[c.c_nationkey]:
            s = (
                (_WN_A if a.c_custkey == b_digits else _WN_D)
                + (_WB_A if abs(a.c_acctbal - b_bal) <= 5.5 else _WB_D)
            ) + (_WS_A if a.c_mktsegment == b_seg else _WS_D)
            if s >= _FS_LINK:
                union(a.c_custkey, c.c_custkey + 10_000_000)
    sizes = Counter()
    comp = Counter(find(x) for x in parent)
    for n in comp.values():
        sizes[n] += 1
    assert got == dict(sizes)
    # most true matches give 2-node entities (A record + its B copy)
    assert got.get(2, 0) > 0


def test_texttiling_python_oracle(spark, sf_dir):
    import re

    from arrow_supercluster_spark.plans.registry_ext124 import (
        _TT_BLOCK,
        _TT_SCALE,
        q_texttiling,
    )

    got = {r.doc_id: r for r in q_texttiling(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs[:80]:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        toks = [x for x in t.split(" ") if x]
        blocks = defaultdict(Counter)
        for i, tok in enumerate(toks):
            blocks[i // _TT_BLOCK][tok] += 1
        cos_s = {}
        bids = sorted(blocks)
        for a, b in zip(bids, bids[1:]):
            num = sum(v * blocks[b][k] for k, v in blocks[a].items())
            if num == 0:
                continue
            na = math.sqrt(sum(v * v for v in blocks[a].values()))
            nb = math.sqrt(sum(v * v for v in blocks[b].values()))
            cos_s[a] = round(num / (na * nb) * _TT_SCALE)
        if not cos_s:
            assert d.doc_id not in got
            continue
        mean_s = sum(cos_s.values()) / len(cos_s)
        n_bounds = sum(1 for v in cos_s.values() if v < mean_s)
        r = got[d.doc_id]
        assert r.n_gaps == len(cos_s)
        assert r.n_segments == n_bounds + 1
        # engines round HALF_UP; python's round() is banker's — the
        # integer-scaled mean lands on exact .5 grid points routinely
        from decimal import ROUND_HALF_UP, Decimal

        # Decimal(repr(x)) mirrors Spark's BigDecimal.valueOf(double)
        # (shortest decimal string), not the exact binary expansion
        want = float(
            Decimal(repr(mean_s / _TT_SCALE)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(r.mean_cohesion - want) < 1e-9
