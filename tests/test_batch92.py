"""Batch-92 tests: RANGE frame peer semantics, kappa hand case,
streaming ≡ batch session windows."""

import tempfile

from pyspark.sql import functions as F


def test_range_frame_peers_by_value(spark):
    from arrow_supercluster_spark.plans.registry_ext97 import q_range_frame

    with tempfile.TemporaryDirectory() as d:
        # prices 0, 400, 900, 5000 in one priority: ±500 peers are
        # {0,400}, {0,400,900}, {400,900}, {5000}
        spark.createDataFrame(
            [(1, "P", 0.0), (2, "P", 400.0), (3, "P", 900.0), (4, "P", 5000.0)],
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        ).write.parquet(f"{d}/orders.parquet")
        got = {
            r.o_orderkey: (r.n_within, r.sum_cents_within)
            for r in q_range_frame(spark, d).collect()
        }
        assert got == {
            1: (2, 40000),
            2: (3, 130000),
            3: (2, 130000),
            4: (1, 500000),
        }


def test_cohens_kappa_hand_case(spark):
    """Perfect agreement → κ = 1; the registered query is exercised on
    crafted docs whose stopword votes are unambiguous."""
    from arrow_supercluster_spark.plans.registry_ext97 import q_cohens_kappa
    from arrow_supercluster_spark.operators.textops import STOPWORDS

    # craft docs whose text is pure stopwords of the declared language
    langs = sorted(STOPWORDS)[:3]
    rows = []
    for i, lang in enumerate(langs):
        text = " ".join(list(STOPWORDS[lang])[:5]) or lang
        rows.append((i, text, lang, "src", len(text)))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        [r] = q_cohens_kappa(spark, d).collect()
        assert r.n == len(langs)
        assert r.po == 1.0
        assert r.kappa == 1.0


def test_session_stream_equals_batch(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext91 import (
        q_session_window,
    )
    from arrow_supercluster_spark.plans.registry_ext97 import (
        q_session_stream,
    )

    import datetime

    from arrow_supercluster_spark.sources.tables import read_events

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q_session_window(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q_session_stream(spark, sf_dir).collect()
    }
    # append-mode streaming emits exactly the sessions the FINAL
    # watermark (max event time − 1 h) has closed; the last sessions
    # stay in state awaiting more data — correct streaming semantics,
    # verified as exact set equality on the closed subset
    mx = read_events(spark, sf_dir).agg(F.max("ts")).first()[0]
    wm = mx - datetime.timedelta(hours=1)
    closed = {s for s in batch if s[2] <= wm}
    assert stream == closed
    assert len(stream) > 0
    assert stream.issubset(batch)
