"""Batch-169 tests: python replays of the storage-encoding analytics
(dictionary advisor, RLE structure, zone-map skips)."""

import math


def test_dict_encoding_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext174 import (
        _DICT_BAR,
        _DICT_COLS,
        q_dict_encoding,
    )

    got = {(r.tbl, r.col): r for r in q_dict_encoding(spark, sf_dir).collect()}
    assert set(got) == set(_DICT_COLS)
    for t, c in _DICT_COLS:
        vals = [
            getattr(r, c)
            for r in spark.read.parquet(f"{sf_dir}/{t}.parquet").collect()
        ]
        r = got[(t, c)]
        d = len(set(vals))
        plain = sum(len(v) for v in vals) / len(vals) * 8.0
        bits = math.ceil(math.log2(d))
        assert r.n_values == len(vals)
        assert r.n_distinct == d
        assert abs(r.plain_bits_per_value - round(plain, 4)) < 1e-9
        assert r.dict_bits_per_value == bits
        assert abs(r.compression_ratio - round(plain / bits, 4)) < 1e-9
        assert r.use_dictionary == (plain / bits >= _DICT_BAR)
    # low-cardinality catalog strings: the advisor keeps dictionaries
    assert all(r.use_dictionary for r in got.values())


def test_rle_stats_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext174 import q_rle_stats
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_rle_stats(spark, sf_dir).collect()[0]
    ev = sorted(
        (
            (x.ts, x.event_id, x.event_type)
            for x in read_events(spark, sf_dir).collect()
        )
    )
    runs = []
    for _, _, t in ev:
        if not runs or runs[-1][0] != t:
            runs.append([t, 0])
        runs[-1][1] += 1
    lens = [n for _, n in runs]
    assert r.n_runs == len(runs)
    assert r.n_rows == len(ev)
    assert abs(r.avg_run_len - round(sum(lens) / len(lens), 6)) < 1e-9
    assert r.max_run_len == max(lens)
    # near-random types: runs are short but not all singletons
    assert 1.0 < r.avg_run_len < 3.0


def test_zone_map_sorted_beats_natural(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext174 import (
        _ZM_PAGE,
        _ZM_THRESH,
        q_zone_map_skips,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = {r.ordering: r for r in q_zone_map_skips(spark, sf_dir).collect()}
    vals = [
        (x.event_id, x.value)
        for x in read_events(spark, sf_dir).collect()
        if x.value is not None
    ]
    # natural replay
    pages = {}
    for eid, v in vals:
        pages.setdefault(eid // _ZM_PAGE, []).append(v)
    nat_skip = sum(1 for vs in pages.values() if max(vs) < _ZM_THRESH)
    assert rows["natural"].n_pages == len(pages)
    assert rows["natural"].n_skippable == nat_skip
    # sorted replay
    by_val = sorted(vals, key=lambda t: (t[1], t[0]))
    spages = {}
    for i, (_, v) in enumerate(by_val):
        spages.setdefault(i // _ZM_PAGE, []).append(v)
    srt_skip = sum(1 for vs in spages.values() if max(vs) < _ZM_THRESH)
    assert rows["value_sorted"].n_pages == len(spages)
    assert rows["value_sorted"].n_skippable == srt_skip
    # the thesis: sorting turns the zone maps on
    assert (
        rows["value_sorted"].skip_rate > rows["natural"].skip_rate
    )
    assert rows["value_sorted"].skip_rate > 0.2
