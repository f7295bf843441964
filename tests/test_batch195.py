"""Batch-195 tests: SCD2 reconstruction replay + structural invariants
(half-open non-overlapping intervals, one current row per user),
snapshot consistency with the history, change-feed replay."""

import datetime

from pyspark.sql import functions as F


def _sequences(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ts.replace(tzinfo=None), r.event_id, r.event_type)
        )
    for seq in by_user.values():
        seq.sort()
    return by_user


def _scd2(by_user):
    hist = {}
    for uid, seq in by_user.items():
        versions = []
        prev = None
        for ts, _, status in seq:
            if prev is None or status != prev:
                versions.append([status, ts, None])
                prev = status
        for v, nxt in zip(versions, versions[1:]):
            v[2] = nxt[1]
        hist[uid] = versions
    return hist


def test_scd2_history_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext200 import (
        q_scd2_history,
    )

    hist = _scd2(_sequences(spark, sf_dir))
    got = q_scd2_history(spark, sf_dir).collect()
    want = []
    for uid in sorted(hist):
        for i, (status, vfrom, vto) in enumerate(hist[uid], start=1):
            want.append(
                (
                    uid,
                    i,
                    status,
                    vfrom.strftime("%Y-%m-%d %H:%M:%S"),
                    vto.strftime("%Y-%m-%d %H:%M:%S") if vto else None,
                    vto is None,
                )
            )
    assert [
        (r.user_id, r.version, r.status, r.valid_from, r.valid_to,
         r.is_current)
        for r in got
    ] == want
    # structural invariants: exactly one current row per user,
    # consecutive versions share a boundary (half-open, gap-free)
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        assert sum(1 for r in rows if r.is_current) == 1
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.status != b.status


def test_snapshot_at_consistent_with_history(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext200 import (
        _SNAP_AT,
        q_scd2_history,
        q_snapshot_at,
    )

    at = datetime.datetime.fromisoformat(_SNAP_AT)
    hist = q_scd2_history(spark, sf_dir).collect()
    want = {}
    for r in hist:
        vfrom = datetime.datetime.fromisoformat(r.valid_from)
        if vfrom <= at and (
            r.user_id not in want or r.version > want[r.user_id][1]
        ):
            want[r.user_id] = (r.status, r.version, r.valid_from)
    got = q_snapshot_at(spark, sf_dir).collect()
    assert {r.user_id: (r.status, r.version, r.since) for r in got} == want
    assert len(got) > 0


def test_change_feed_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext200 import (
        q_change_feed,
    )

    by_user = _sequences(spark, sf_dir)
    days = {}
    for uid, seq in by_user.items():
        prev = None
        for idx, (ts, _, status) in enumerate(seq):
            d = ts.date()
            rec = days.setdefault(d, [0, 0, 0])  # changes, idem, new
            change = prev is None or status != prev
            if change:
                rec[0] += 1
                if idx == 0:
                    rec[2] += 1
            else:
                rec[1] += 1
            prev = status
    got = q_change_feed(spark, sf_dir).collect()
    assert [r.day for r in got] == [d.isoformat() for d in sorted(days)]
    for r in got:
        ch, idem, new = days[datetime.date.fromisoformat(r.day)]
        assert (r.n_changes, r.n_idempotent, r.n_new_users) == (
            ch,
            idem,
            new,
        )
        assert abs(r.change_rate - round(ch / (ch + idem), 6)) < 1e-9
