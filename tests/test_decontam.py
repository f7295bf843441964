"""Corpus-hygiene + centroid operators: handcrafted-fixture checks and
partition invariance (SURVEY §5 layers 2-4)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from arrow_supercluster_spark.operators import centroids, decontam


def _docs(spark, rows, parts=1):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    ).repartition(parts)


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


class TestDecontaminate:
    def test_duplicate_of_eval_doc_is_flagged(self, spark):
        rows = [
            (0, WORDS),           # eval (doc_id % 29 == 0)
            (1, WORDS),           # exact dup of eval -> contaminated
            (2, "totally different words " * 3),
        ]
        out = decontam.decontaminate(
            _docs(spark, rows), F.col("doc_id") % 29 == 0, n=8
        ).collect()
        assert {r["doc_id"] for r in out} == {1}
        # 10 tokens -> 3 distinct 8-grams, all shared
        assert out[0]["n_overlap"] == 3

    def test_eval_docs_never_reported(self, spark):
        rows = [(0, WORDS), (29, WORDS), (1, WORDS)]
        out = decontam.decontaminate(
            _docs(spark, rows), F.col("doc_id") % 29 == 0, n=8
        ).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_short_docs_produce_no_grams(self, spark):
        rows = [(0, "one two three"), (1, "one two three")]
        out = decontam.decontaminate(
            _docs(spark, rows), F.col("doc_id") % 29 == 0, n=8
        ).collect()
        assert out == []

    def test_partition_invariance(self, spark):
        rows = [(i, f"{WORDS} extra{i % 3} tail tokens here now") for i in range(40)]
        a = decontam.decontaminate(
            _docs(spark, rows, 1), F.col("doc_id") % 29 == 0, n=8
        )
        b = decontam.decontaminate(
            _docs(spark, rows, 7), F.col("doc_id") % 29 == 0, n=8
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestPiiScrub:
    def test_email_and_phone_redacted(self, spark):
        rows = [(0, "reach me at jane.doe+x@corp.example.org or 415-555-1234 ok")]
        r = decontam.pii_scrub(_docs(spark, rows)).collect()[0]
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert "<EMAIL>" in r["scrubbed_text"]
        assert "<PHONE>" in r["scrubbed_text"]
        assert "@" not in r["scrubbed_text"]
        assert "415" not in r["scrubbed_text"]

    def test_clean_text_untouched(self, spark):
        rows = [(0, "no personal data here")]
        r = decontam.pii_scrub(_docs(spark, rows)).collect()[0]
        assert r["n_emails"] == 0 and r["n_phones"] == 0
        assert r["scrubbed_text"] == "no personal data here"

    def test_phone_requires_word_boundary(self, spark):
        rows = [(0, "serial 9123-456-78901 is not a phone")]
        r = decontam.pii_scrub(_docs(spark, rows)).collect()[0]
        assert r["n_phones"] == 0


class TestRepetitionStats:
    def test_repetitive_doc_flagged(self, spark):
        rows = [
            (0, "same sentence. same sentence. same sentence. same sentence"),
            (1, "one fine day. a different thing. nothing repeats here at all "
                "really truly distinctly"),
        ]
        out = {r["doc_id"]: r for r in
               decontam.repetition_stats(_docs(spark, rows)).collect()}
        assert out[0]["repetitive"] is True
        assert out[0]["dup_sent_frac"] == pytest.approx(0.75)
        assert out[1]["repetitive"] is False

    def test_top_token_fraction(self, spark):
        rows = [(0, "spam spam spam spam ham")]
        r = decontam.repetition_stats(_docs(spark, rows)).collect()[0]
        assert r["n_tokens"] == 5
        assert r["top_tok_frac"] == pytest.approx(0.8)
        assert r["repetitive"] is True


def _emb(spark, rows, parts=2):
    return spark.createDataFrame(
        [Row(vec_id=i, label=l, embedding=v) for i, l, v in rows],
        "vec_id long, label string, embedding array<float>",
    ).repartition(parts)


class TestCentroids:
    FIX = [
        (0, "a", [1.0, 0.0]),
        (1, "a", [3.0, 0.0]),
        (2, "b", [0.0, 2.0]),
        (3, "b", [0.0, 4.0]),
    ]

    def test_label_centroids_exact(self, spark):
        out = {r["label"]: r for r in
               centroids.label_centroids(_emb(spark, self.FIX)).collect()}
        assert out["a"]["centroid"] == [2.0, 0.0]
        assert out["b"]["centroid"] == [0.0, 3.0]
        assert out["a"]["dim"] == 2

    def test_nearest_centroid_confusion_is_identity(self, spark):
        emb = _emb(spark, self.FIX)
        out = centroids.nearest_centroid(
            emb, centroids.label_centroids(emb)
        ).collect()
        assert sorted((r["label"], r["assigned"], r["n_vecs"]) for r in out) \
            == [("a", "a", 2), ("b", "b", 2)]

    def test_tie_breaks_to_smallest_label(self, spark):
        # centroids for labels a and b are identical -> every vector ties
        rows = [
            (0, "a", [1.0, 1.0]),
            (1, "b", [1.0, 1.0]),
            (2, "c", [5.0, 0.0]),
        ]
        emb = _emb(spark, rows)
        out = centroids.nearest_centroid(
            emb, centroids.label_centroids(emb)
        ).collect()
        assigned = {r["label"]: r["assigned"] for r in out}
        assert assigned["a"] == "a" and assigned["b"] == "a"

    def test_partition_invariance(self, spark):
        rows = [
            (i, "lbl%d" % (i % 3), [float((i * 7) % 5), float((i * 3) % 4), 1.0])
            for i in range(60)
        ]
        a = centroids.label_centroids(_emb(spark, rows, 1)).collect()
        b = centroids.label_centroids(_emb(spark, rows, 9)).collect()
        ka = sorted((r["label"], tuple(r["centroid"])) for r in a)
        kb = sorted((r["label"], tuple(r["centroid"])) for r in b)
        assert ka == kb
