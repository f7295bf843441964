"""Batch-149 tests: URL canonicalization vs a urllib-based oracle,
Luhn vs the textbook python implementation, FFD packing replay."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow



def test_url_canonicalize_matches_urllib_oracle(spark, sf_dir):
    from urllib.parse import urlsplit, parse_qsl, urlencode

    from arrow_supercluster_spark.plans.registry_ext154 import (
        q_url_canonicalize,
    )

    got = {
        r.canonical_url: (r.n_docs, r.keeper_id)
        for r in q_url_canonicalize(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    want = {}
    for d in docs:
        raw = (
            f"HTTPS://WWW.{d.source.upper()}.EXAMPLE.COM/s/{d.doc_id % 7}"
            f"?utm_source=feed&id={d.doc_id % 50}"
            f"&utm_campaign=retrain&ref=rss#sec-{d.doc_id % 3}"
        )
        sp = urlsplit(raw)
        host = sp.netloc.lower()
        if host.startswith("www."):
            host = host[4:]
        params = sorted(
            f"{k}={v}"
            for k, v in parse_qsl(sp.query)
            if not k.startswith("utm_")
        )
        canon = f"{sp.scheme.lower()}://{host}{sp.path.lower()}"
        if params:
            canon += "?" + "&".join(params)
        e = want.setdefault(canon, [0, d.doc_id])
        e[0] += 1
        e[1] = min(e[1], d.doc_id)
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 1  # real collapse, not a bijection
    assert sum(v[0] for v in got.values()) == len(docs)


def test_luhn_matches_textbook_implementation(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext154 import q_luhn_check

    r = q_luhn_check(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).collect()

    def luhn_ok(num: str) -> bool:
        total = 0
        # standard right-to-left: double every second digit from the
        # check digit
        for i, ch in enumerate(reversed(num)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    n_valid = 0
    for d in docs:
        num = str((d.doc_id * 2654435761 + 40490) % 10**16).zfill(16)
        n_valid += luhn_ok(num)
    assert r.n_candidates == len(docs)
    assert r.n_valid == n_valid
    # Luhn accepts exactly one checksum residue class — rate near 1/10
    assert 0.05 < r.valid_rate < 0.16
    # a known-valid card test vector through the same query machinery
    assert luhn_ok("4539578763621486")
    assert not luhn_ok("4539578763621487")


def test_pack_sequences_ffd_replay(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import tokenize
    from arrow_supercluster_spark.plans.registry_ext154 import (
        _PACK_CTX,
        _PACK_GROUP_TOKEN_BUDGET,
        pack_group_count,
        q_pack_sequences,
    )
    from pyspark.sql import functions as F

    rows = {r.grp: r for r in q_pack_sequences(spark, sf_dir).collect()}
    lens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.least(
                F.size(tokenize(F.col("text"))), F.lit(_PACK_CTX)
            ).alias("toks"),
        )
        .collect()
    )
    # replay the data-derived group count (r6 de-weak): every group's
    # token total must respect the per-kernel budget up to one doc's
    # worth of rounding, and g must match the shipped derivation.
    g = pack_group_count(sum(d.toks for d in lens))
    assert set(rows) == set(range(g))
    by_grp = {}
    for d in lens:
        by_grp.setdefault(d.doc_id % g, []).append(
            (d.toks, d.doc_id)
        )
    if g > pack_group_count(0):
        # above the floor the budget is the binding constraint:
        # expected group total ~ total/g <= budget
        for items in by_grp.values():
            assert (
                sum(t for t, _ in items)
                <= 2 * _PACK_GROUP_TOKEN_BUDGET
            )
    for g, items in by_grp.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        bins = []
        for t, _ in items:
            for i, rem in enumerate(bins):
                if rem >= t:
                    bins[i] = rem - t
                    break
            else:
                bins.append(_PACK_CTX - t)
        r = rows[g]
        total = sum(t for t, _ in items)
        assert r.n_docs == len(items)
        assert r.total_tokens == total
        assert r.n_bins == len(bins)
        assert r.lp_lower_bound == -(-total // _PACK_CTX)
        assert r.n_bins >= r.lp_lower_bound
        assert abs(
            r.fill_rate - round(total / (len(bins) * _PACK_CTX), 4)
        ) < 1e-9
        assert 0 < r.fill_rate <= 1


def test_pack_group_count_derivation():
    from arrow_supercluster_spark.plans.registry_ext154 import (
        _PACK_GROUP_TOKEN_BUDGET,
        _PACK_GROUPS_MIN,
        pack_group_count,
    )

    # parallelism floor on small corpora
    assert pack_group_count(0) == _PACK_GROUPS_MIN
    assert pack_group_count(_PACK_GROUP_TOKEN_BUDGET) == _PACK_GROUPS_MIN
    # above the floor: ceil-division growth, so per-group tokens stay
    # bounded by the budget at ANY corpus size (the 100 TB property)
    big = 100 * _PACK_GROUP_TOKEN_BUDGET
    assert pack_group_count(big) == 100
    assert pack_group_count(big + 1) == 101
    # 100 TB ~ 25e12 tokens -> ~12M groups, each <= budget
    huge = 25 * 10**12
    g = pack_group_count(huge)
    assert huge / g <= _PACK_GROUP_TOKEN_BUDGET


def test_pack_manifest_consistent_with_pack_sequences(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext154 import (
        q_pack_manifest,
        q_pack_sequences,
    )

    man = {r.grp: r for r in q_pack_manifest(spark, sf_dir).collect()}
    seq = {r.grp: r for r in q_pack_sequences(spark, sf_dir).collect()}
    assert set(man) == set(seq)
    for g, m in man.items():
        s = seq[g]
        assert m.n_docs == s.n_docs
        assert m.total_tokens == s.total_tokens
        assert m.lp_lower_bound == s.lp_lower_bound
