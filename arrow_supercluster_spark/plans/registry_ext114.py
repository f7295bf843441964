"""Round-5 registry additions, batch 109 — web-corpus URL analytics,
the KMV distinct/Jaccard sketch, and link prediction:

- q_url_domain_rollup: URL parsing + registered-domain rollup — the
  first step of every Common-Crawl-style pipeline (group the corpus by
  where it came from before filtering/deduping per domain). URLs are
  derived deterministically from the document columns (the
  derived_points pattern), then *parsed back* with Spark's JVM-side
  `parse_url` (HOST / PATH / QUERY:key) — the oracle re-derives the
  same fields with an independent regex, so the check is a true
  cross-engine differential of the parser, not a tautology.
- q_kmv_sketch: K-Minimum-Values sketch (k=64) over the portable
  affine hash — distinct-count estimates for two event-derived element
  sets, their union, and the KMV Jaccard estimate |U_k ∩ A ∩ B| / k.
  The piece HyperLogLog (q_hll_portable) can't do: HLL unions, KMV
  also *intersects*. Every sketch is a TakeOrderedAndProject
  (orderBy().limit(k)) — the distributed partial top-k, never a
  single-reducer window — so the shape survives 100 TB.
- q_adamic_adar: Adamic-Adar link prediction over the user×item
  bipartite graph (items = the JSON `props.k` value bucketed mod 20):
  score(i,j) = Σ_{u ∈ N(i)∩N(j)} 1/ln(deg(u)), the classic
  common-neighbor statistic that down-weights promiscuous neighbors.
  Pure keyed self-join + agg; users with deg=1 can never appear as
  common neighbors, so ln(deg) ≥ ln 2 and the weight is total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs

_P = 2147483647
_KMV_K = 64
_AA_ITEMS = 20


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ===========================================================================
# R324 — URL parse + registered-domain rollup
# ===========================================================================

_SQL_URL = (
    "concat('https://', source, '.example.org/', lang, '/doc-', "
    "CAST(doc_id AS VARCHAR), '?ref=', CAST(doc_id % 7 AS VARCHAR))"
)


@register(
    "q_url_domain_rollup",
    f"""
    WITH u AS (
      SELECT doc_id, n_chars, lang, {_SQL_URL} AS url FROM documents
    ),
    parsed AS (
      SELECT doc_id, n_chars, lang,
             regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
      FROM u
    )
    SELECT regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
           host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT ref) AS BIGINT) AS n_refs,
           round(AVG(n_chars), 4) AS mean_chars,
           MIN(path) AS first_path
    FROM parsed
    GROUP BY 1, 2
    ORDER BY domain, host
    """,
)
def q_url_domain_rollup(spark, sf_dir):
    """R324 — URL parsing + per-registered-domain rollup. The URL
    column is derived deterministically from (source, lang, doc_id)
    and then parsed BACK with Spark's builtin `parse_url`
    (HOST/PATH/QUERY:ref — JVM-side, codegen'd, no Python), while the
    oracle parses with an independent regex: a genuine cross-engine
    differential of the parser. Rollup = one keyed agg per
    (registered_domain, host); registered domain = last two host
    labels. At 100 TB this is the scan-fused first pass of a
    crawl-curation pipeline — per-domain doc counts, language spread,
    query-param diversity, and path samples feed the domain-level
    block/allow decisions."""
    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.pmod("doc_id", F.lit(7)).cast("string"),
    )
    parsed = docs.select(
        "doc_id", "n_chars", "lang",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    return (
        parsed.groupBy(
            F.regexp_extract("host", r"([^.]+\.[^.]+)$", 1).alias("domain"),
            "host",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("ref").alias("n_refs"),
            F.round(F.avg("n_chars"), 4).alias("mean_chars"),
            F.min("path").alias("first_path"),
        )
        .orderBy("domain", "host")
    )


# ===========================================================================
# R325 — KMV (k-minimum-values) distinct + Jaccard sketch
# ===========================================================================

# portable affine hash on a BIGINT element; 2654435761 < 2^32 and
# (n % P) < 2^31 keep the product < 2^63 in BOTH engines (DuckDB BIGINT
# overflow raises rather than wrapping, so staying in-range is the
# portability contract, same as registry_ext43's poly hash).
_SQL_ELEM = "user_id * 100003 + CAST(floor(value * 10) AS BIGINT)"
_SQL_HV = f"(2654435761 * (({_SQL_ELEM}) % {_P}) + 12345) % {_P}"


@register(
    "q_kmv_sketch",
    f"""
    WITH a AS (
      SELECT DISTINCT {_SQL_HV} AS hv FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT DISTINCT {_SQL_HV} AS hv FROM events WHERE event_type = 'view'
    ),
    ka AS (SELECT hv FROM a ORDER BY hv LIMIT {_KMV_K}),
    kb AS (SELECT hv FROM b ORDER BY hv LIMIT {_KMV_K}),
    un AS (SELECT hv FROM a UNION SELECT hv FROM b),
    ku AS (SELECT hv FROM un ORDER BY hv LIMIT {_KMV_K}),
    est AS (
      SELECT 'click' AS set_name,
             round(({_KMV_K} - 1) * CAST({_P} AS BIGINT) * 1.0 / MAX(hv), 4) AS est_distinct
      FROM ka
      UNION ALL
      SELECT 'view', round(({_KMV_K} - 1) * CAST({_P} AS BIGINT) * 1.0 / MAX(hv), 4) FROM kb
      UNION ALL
      SELECT 'union', round(({_KMV_K} - 1) * CAST({_P} AS BIGINT) * 1.0 / MAX(hv), 4) FROM ku
    ),
    exact AS (
      SELECT 'click' AS set_name, CAST(COUNT(*) AS BIGINT) AS n_exact FROM a
      UNION ALL
      SELECT 'view', CAST(COUNT(*) AS BIGINT) FROM b
      UNION ALL
      SELECT 'union', CAST(COUNT(*) AS BIGINT) FROM un
    ),
    jac AS (
      SELECT round(SUM(CASE WHEN ku.hv IN (SELECT hv FROM ka)
                             AND ku.hv IN (SELECT hv FROM kb)
                            THEN 1 ELSE 0 END) * 1.0 / {_KMV_K}, 4)
               AS jaccard_est
      FROM ku
    )
    SELECT est.set_name, est.est_distinct, exact.n_exact,
           round(abs(est.est_distinct - exact.n_exact)
                   / exact.n_exact, 4) AS rel_error,
           jac.jaccard_est
    FROM est JOIN exact USING (set_name) CROSS JOIN jac
    ORDER BY set_name
    """,
)
def q_kmv_sketch(spark, sf_dir):
    """R325 — K-Minimum-Values sketch (k={k}) over the portable affine
    hash h(n) = (2654435761·(n mod P) + 12345) mod P, elements =
    (user_id, value-decile) pairs from two event types. est = (k−1)·P /
    h_(k) (the classic KMV estimator on hashes scaled to [0, P));
    union sketch = k smallest of A ∪ B; Jaccard estimate =
    |U_k ∩ A ∩ B| / k — the intersection capability HLL lacks. Every
    sketch is orderBy().limit(k) → TakeOrderedAndProject, a distributed
    partial top-k with k-row driver traffic; the joins that follow
    touch only ≤ 3k rows. Exact distincts + relative error reported
    alongside, so the query certifies its own accuracy.""".format(
        k=_KMV_K
    )
    ev = _events(spark, sf_dir)
    elem = (
        F.col("user_id") * 100003
        + F.floor(F.col("value") * 10).cast("long")
    )
    hv = F.pmod(2654435761 * F.pmod(elem, F.lit(_P)) + 12345, F.lit(_P))
    sets = {
        "click": ev.filter(F.col("event_type") == "click"),
        "view": ev.filter(F.col("event_type") == "view"),
    }
    distinct = {
        n: df.select(hv.alias("hv")).distinct() for n, df in sets.items()
    }
    distinct["union"] = distinct["click"].unionByName(
        distinct["view"]
    ).distinct()
    sketches = {
        n: d.orderBy("hv").limit(_KMV_K) for n, d in distinct.items()
    }
    est = None
    for n, sk in sketches.items():
        row = sk.agg(
            F.lit(n).alias("set_name"),
            F.round(
                (_KMV_K - 1) * _P * F.lit(1.0) / F.max("hv"), 4
            ).alias("est_distinct"),
        )
        est = row if est is None else est.unionByName(row)
    exact = None
    for n, d in distinct.items():
        row = d.agg(
            F.lit(n).alias("set_name"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        exact = row if exact is None else exact.unionByName(row)
    in_a = sketches["union"].join(sketches["click"], "hv", "left_semi")
    in_both = in_a.join(sketches["view"], "hv", "left_semi")
    jac = in_both.agg(
        F.round(F.count(F.lit(1)) * F.lit(1.0) / _KMV_K, 4).alias(
            "jaccard_est"
        )
    )
    return (
        est.join(exact, "set_name")
        .crossJoin(F.broadcast(jac))
        .select(
            "set_name",
            "est_distinct",
            "n_exact",
            F.round(
                F.abs(F.col("est_distinct") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_error"),
            "jaccard_est",
        )
        .orderBy("set_name")
    )


# ===========================================================================
# R326 — Adamic-Adar link prediction
# ===========================================================================

@register(
    "q_adamic_adar",
    f"""
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT)
               % {_AA_ITEMS} AS item
      FROM events
    ),
    deg AS (SELECT user_id, COUNT(*) AS d FROM ui GROUP BY 1),
    pairs AS (
      SELECT a.item AS item_i, b.item AS item_j, a.user_id
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
    )
    SELECT item_i, item_j,
           CAST(COUNT(*) AS BIGINT) AS common_users,
           round(SUM(1.0 / ln(deg.d)), 4) AS aa_score
    FROM pairs JOIN deg USING (user_id)
    GROUP BY item_i, item_j
    ORDER BY aa_score DESC, item_i, item_j
    LIMIT 25
    """,
)
def q_adamic_adar(spark, sf_dir):
    """R326 — Adamic-Adar link prediction over the user×item bipartite
    graph (item = props.k mod {m}): for each item pair, score =
    Σ_{{u ∈ N(i)∩N(j)}} 1/ln(deg(u)) — common neighbors down-weighted
    by how promiscuous they are. Shape: distinct (user, item) edge
    list → degree agg (broadcastable: |users| rows) → equi-self-join
    on user (the only shuffle; item<item halves the pairs) → keyed
    agg → TakeOrdered top-25. A user with deg=1 has no second item and
    never forms a pair, so ln(deg) ≥ ln 2 everywhere — no singular
    weights by construction.""".format(m=_AA_ITEMS)
    ev = _events(spark, sf_dir)
    ui = ev.select(
        "user_id",
        F.pmod(
            F.get_json_object("props", "$.k").cast("bigint"),
            F.lit(_AA_ITEMS),
        ).alias("item"),
    ).distinct()
    deg = ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("d"))
    a, b = ui.alias("a"), ui.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.item") < F.col("b.item")),
    ).select(
        F.col("a.item").alias("item_i"),
        F.col("b.item").alias("item_j"),
        F.col("a.user_id").alias("user_id"),
    )
    return (
        pairs.join(F.broadcast(deg), "user_id")
        .groupBy("item_i", "item_j")
        .agg(
            F.count(F.lit(1)).alias("common_users"),
            F.round(F.sum(F.lit(1.0) / F.log("d")), 4).alias("aa_score"),
        )
        .orderBy(
            F.col("aa_score").desc(), "item_i", "item_j"
        )
        .limit(25)
    )
