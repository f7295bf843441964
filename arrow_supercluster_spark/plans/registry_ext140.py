"""Round-5 registry additions, batch 135 — distance centrality,
social-choice aggregation, and core-elite graph structure:

- q_harmonic_centrality: harmonic centrality Σ 1/d(u,v) truncated at 3
  hops over the mutual 5-NN graph — the distance-based centrality that
  handles disconnected graphs (closeness centrality's 1/Σd blows up);
  exact hop sets D1/D2/D3 by unrolled frontier joins with set
  subtraction (no fixpoint — the truncation IS the scale bound).
- q_rank_aggregation: Borda count + Condorcet pairwise matrix over
  three source rankings (volume, mean length, distinct-language
  spread) — the social-choice alternative to q_rrf_fusion's
  reciprocal-rank heuristic, with the Condorcet-winner check (a
  candidate that beats every other head-to-head) and whether Borda
  agrees.
- q_rich_club: rich-club coefficient φ(k) = 2E_k/(N_k(N_k−1)) for
  degree thresholds k = 1..4 over the mutual 5-NN graph — do
  high-degree nodes preferentially interconnect? The elite-structure
  diagnostic next to assortativity (R124): assortativity is a global
  correlation, φ(k) is the curve.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_SQL_MUTUAL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY cos DESC, dst) AS rk
        FROM scored
      ) WHERE rk <= 5
    ),
    mutual AS (
      SELECT a.src AS u, a.dst AS w
      FROM knn a JOIN knn b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src < a.dst
    ),
    sym AS (
      SELECT u, w FROM mutual UNION ALL SELECT w, u FROM mutual
    )
"""


def _mutual_edges(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext import _emb
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact

    ed = knn_edges_exact(_emb(spark, sf_dir), 5)
    rev = ed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = (
        ed.join(rev, ["a", "b"])
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("w"))
        .localCheckpoint(eager=True)
    )
    return mutual


# ===========================================================================
# R398 — truncated harmonic centrality
# ===========================================================================

@register(
    "q_harmonic_centrality",
    f"""
    {_SQL_MUTUAL},
    d1 AS (SELECT DISTINCT u, w FROM sym),
    d2 AS (
      SELECT DISTINCT a.u, b.w
      FROM d1 a JOIN sym b ON b.u = a.w
      WHERE b.w != a.u
        AND NOT EXISTS (SELECT 1 FROM d1 x
                        WHERE x.u = a.u AND x.w = b.w)
    ),
    d3 AS (
      SELECT DISTINCT a.u, b.w
      FROM d2 a JOIN sym b ON b.u = a.w
      WHERE b.w != a.u
        AND NOT EXISTS (SELECT 1 FROM d1 x
                        WHERE x.u = a.u AND x.w = b.w)
        AND NOT EXISTS (SELECT 1 FROM d2 x
                        WHERE x.u = a.u AND x.w = b.w)
    ),
    cent AS (
      SELECT u,
             CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c3) AS BIGINT) AS n3
      FROM (
        SELECT u, 1 AS c1, 0 AS c2, 0 AS c3 FROM d1
        UNION ALL SELECT u, 0, 1, 0 FROM d2
        UNION ALL SELECT u, 0, 0, 1 FROM d3
      ) GROUP BY u
    )
    SELECT u AS vec_id, n1, n2, n3,
           round(n1 + n2 / 2.0 + n3 / 3.0, 4) AS harmonic_c3
    FROM cent
    ORDER BY harmonic_c3 DESC, vec_id
    LIMIT 15
    """,
)
def q_harmonic_centrality(spark, sf_dir):
    """R398 — 3-hop harmonic centrality over the mutual 5-NN graph:
    H₃(u) = |D1| + |D2|/2 + |D3|/3 with the exact distance-k sets from
    unrolled frontier joins and anti-join set subtraction (a node at
    distance 2 must NOT be at distance 1 — the dedup BFS needs).
    Truncation at 3 hops is the 100 TB answer to centrality: exact
    closeness needs all-pairs distances; H₃ needs three self-joins
    whose frontiers the k-regular-ish graph bounds at ~k³. Handles
    disconnection natively (unreachable ⇒ contributes 0, no ∞).
    Top-15 by the half-integer-exact score (n1 + n2/2 + n3/3 —
    deterministic from integers)."""
    mutual = _mutual_edges(spark, sf_dir)
    sym = mutual.unionByName(
        mutual.select(F.col("w").alias("u"), F.col("u").alias("w"))
    )
    d1 = sym.distinct()
    s2 = sym.select(F.col("u").alias("m"), F.col("w").alias("w2"))
    d2 = (
        d1.join(s2, d1["w"] == s2["m"])
        .filter(F.col("w2") != F.col("u"))
        .select("u", F.col("w2").alias("w"))
        .distinct()
        .join(d1, ["u", "w"], "left_anti")
    )
    d3 = (
        d2.join(s2, d2["w"] == s2["m"])
        .filter(F.col("w2") != F.col("u"))
        .select("u", F.col("w2").alias("w"))
        .distinct()
        .join(d1, ["u", "w"], "left_anti")
        .join(d2, ["u", "w"], "left_anti")
    )
    cent = (
        d1.groupBy("u").agg(F.count(F.lit(1)).alias("n1"))
        .join(
            d2.groupBy("u").agg(F.count(F.lit(1)).alias("n2")), "u", "left"
        )
        .join(
            d3.groupBy("u").agg(F.count(F.lit(1)).alias("n3")), "u", "left"
        )
        .select(
            F.col("u").alias("vec_id"),
            F.col("n1").cast("long").alias("n1"),
            F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
            F.coalesce("n3", F.lit(0)).cast("long").alias("n3"),
        )
    )
    return (
        cent.select(
            "vec_id",
            "n1",
            "n2",
            "n3",
            F.round(
                F.col("n1") + F.col("n2") / 2.0 + F.col("n3") / 3.0, 4
            ).alias("harmonic_c3"),
        )
        .orderBy(F.col("harmonic_c3").desc(), "vec_id")
        .limit(15)
    )


# ===========================================================================
# R399 — Borda count + Condorcet rank aggregation
# ===========================================================================

_SQL_SRC_METRICS = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS volume,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents GROUP BY source
"""


@register(
    "q_rank_aggregation",
    f"""
    WITH m AS ({_SQL_SRC_METRICS}),
    ranked AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY volume DESC, source) AS r1,
             ROW_NUMBER() OVER (ORDER BY total_chars * 1.0 / volume DESC,
                                source) AS r2,
             ROW_NUMBER() OVER (ORDER BY n_langs DESC, source) AS r3
      FROM m
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    borda AS (
      SELECT source,
             CAST((SELECT n FROM n) * 3 - (r1 + r2 + r3) AS BIGINT)
               AS borda_score,
             r1, r2, r3
      FROM ranked
    ),
    pairwise AS (
      SELECT a.source,
             CAST(SUM(CASE WHEN
               (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END
                + CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END
                + CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2
               THEN 1 ELSE 0 END) AS BIGINT) AS wins
      FROM borda a JOIN borda b ON a.source != b.source
      GROUP BY a.source
    )
    SELECT borda.source, borda.r1, borda.r2, borda.r3,
           borda.borda_score, pairwise.wins,
           (pairwise.wins = (SELECT n FROM n) - 1) AS condorcet_winner,
           (borda.borda_score =
              (SELECT MAX(borda_score) FROM borda)) AS borda_winner
    FROM borda JOIN pairwise USING (source)
    ORDER BY borda.borda_score DESC, borda.source
    LIMIT 10
    """,
)
def q_rank_aggregation(spark, sf_dir):
    """R399 — rank aggregation over three source rankings (volume,
    mean doc length, language spread): Borda score = Σ(n − rank) and
    the Condorcet pairwise matrix (a beats b iff it ranks higher on a
    majority of the three criteria); flags both the Condorcet winner
    (beats everyone head-to-head — may not exist) and the Borda
    winner (always exists, may disagree — the classic social-choice
    tension q_rrf_fusion's smooth heuristic hides). All ranks and
    scores exact integers over the |sources| frame (windows bounded
    by the source count)."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    w1 = Window.orderBy(F.col("volume").desc(), "source")
    w2 = Window.orderBy(
        (F.col("total_chars") * 1.0 / F.col("volume")).desc(), "source"
    )
    w3 = Window.orderBy(F.col("n_langs").desc(), "source")
    ranked = m.select(
        "source",
        F.row_number().over(w1).alias("r1"),
        F.row_number().over(w2).alias("r2"),
        F.row_number().over(w3).alias("r3"),
    )
    n = ranked.count()
    borda = ranked.select(
        "source",
        "r1",
        "r2",
        "r3",
        (F.lit(n * 3) - (F.col("r1") + F.col("r2") + F.col("r3")))
        .cast("long")
        .alias("borda_score"),
    )
    a = borda.alias("a")
    b = borda.alias("b")
    wins_cond = (
        F.when(F.col("a.r1") < F.col("b.r1"), 1).otherwise(0)
        + F.when(F.col("a.r2") < F.col("b.r2"), 1).otherwise(0)
        + F.when(F.col("a.r3") < F.col("b.r3"), 1).otherwise(0)
    ) >= 2
    pairwise = (
        a.join(b, F.col("a.source") != F.col("b.source"))
        .groupBy(F.col("a.source").alias("source"))
        .agg(
            F.sum(F.when(wins_cond, 1).otherwise(0))
            .cast("long")
            .alias("wins")
        )
    )
    best = borda.agg(F.max("borda_score").alias("best_b"))
    return (
        borda.join(pairwise, "source")
        .crossJoin(F.broadcast(best))
        .select(
            "source",
            "r1",
            "r2",
            "r3",
            "borda_score",
            "wins",
            (F.col("wins") == n - 1).alias("condorcet_winner"),
            (F.col("borda_score") == F.col("best_b")).alias("borda_winner"),
        )
        .orderBy(F.col("borda_score").desc(), "source")
        .limit(10)
    )


# ===========================================================================
# R400 — rich-club coefficient curve
# ===========================================================================

@register(
    "q_rich_club",
    f"""
    {_SQL_MUTUAL},
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY u
    ),
    ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
    club AS (
      SELECT ks.k, deg.node
      FROM ks JOIN deg ON deg.d > ks.k
    ),
    club_n AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k FROM club GROUP BY k
    ),
    club_e AS (
      SELECT c1.k, CAST(COUNT(*) AS BIGINT) AS e_k
      FROM mutual
      JOIN club c1 ON c1.node = mutual.u
      JOIN club c2 ON c2.node = mutual.w AND c2.k = c1.k
      GROUP BY c1.k
    )
    SELECT club_n.k, club_n.n_k,
           CAST(coalesce(club_e.e_k, 0) AS BIGINT) AS e_k,
           round(CASE WHEN club_n.n_k >= 2
                      THEN 2.0 * coalesce(club_e.e_k, 0)
                           / (club_n.n_k * (club_n.n_k - 1))
                      END, 6) AS phi
    FROM club_n LEFT JOIN club_e ON club_e.k = club_n.k
    ORDER BY club_n.k
    """,
)
def q_rich_club(spark, sf_dir):
    """R400 — rich-club coefficient φ(k) = 2E_{{>k}}/(N_{{>k}}(N_{{>k}}−1))
    for k = 1..4 over the mutual 5-NN graph: restrict to nodes of
    degree > k, count the edges surviving inside the club, normalize
    by the possible pairs. A rising φ(k) curve = the high-degree
    elite preferentially interconnects (hub cartels — the retrieval
    hubness pathology from yet another angle); flat/falling = no
    elite. Exact integer edge/degree counts; the curve completes the
    degree-structure set (assortativity R124 = one correlation,
    q_percolation_curve = attack response, φ(k) = elite density)."""
    mutual = _mutual_edges(spark, sf_dir)
    sym = mutual.unionByName(
        mutual.select(F.col("w").alias("u"), F.col("u").alias("w"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ks = spark.createDataFrame([(k,) for k in (1, 2, 3, 4)], "k int")
    club = ks.join(F.broadcast(deg), F.col("d") > F.col("k")).select(
        "k", "node"
    )
    club_n = club.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    c1 = club.select(F.col("k").alias("k1"), F.col("node").alias("nu"))
    c2 = club.select(F.col("k").alias("k2"), F.col("node").alias("nw"))
    club_e = (
        mutual.join(c1, mutual["u"] == c1["nu"])
        .join(c2, (mutual["w"] == c2["nw"]) & (F.col("k2") == F.col("k1")))
        .groupBy(F.col("k1").alias("k"))
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    return (
        club_n.join(club_e, "k", "left")
        .select(
            "k",
            F.col("n_k").cast("long").alias("n_k"),
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.round(
                F.when(
                    F.col("n_k") >= 2,
                    2.0
                    * F.coalesce("e_k", F.lit(0))
                    / (F.col("n_k") * (F.col("n_k") - 1)),
                ),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )
