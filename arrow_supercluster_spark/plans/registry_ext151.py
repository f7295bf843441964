"""Round-6 registry additions, batch 146 — internal cluster validity
beyond silhouette, and label agreement:

- q_calinski_harabasz: the variance-ratio criterion CH =
  (B/(k−1))/(W/(n−k)) over the embedding labels — between-cluster vs
  within-cluster dispersion around centroids. The cheap screening
  companion to q_silhouette (CH is one centroid pass, silhouette is
  all-pairs).
- q_davies_bouldin: Davies-Bouldin index — per-cluster mean
  centroid distance S_i, centroid separations M_ij, DB = mean_i
  max_{j≠i} (S_i+S_j)/M_ij. Lower is better; per-label rows expose
  WHICH cluster drags the index (its worst-separated neighbour).
- q_nmi_clustering: normalized mutual information (geometric mean
  normalization) between the ground-truth labels and a deterministic
  axis-argmax pseudo-clustering (largest of the first four embedding
  dimensions) — the label-agreement metric that, unlike q_ari_clustering's
  pair-counting, is information-theoretic and chance-corrected only
  via its normalization.

All three reduce the corpus to (label, dim) centroid tables — k·64
rows — so at 100 TB they are one partial-aggregated pass plus
driver-scale closed forms; no all-pairs stage (the contrast with
q_silhouette is the point).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb

_SQL_PTS = """
    pts AS (
      SELECT vec_id, label, i AS dim,
             CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, generate_series(1, 64) AS t(i)
    ),
    cent AS (
      SELECT label, dim, AVG(val) AS cv, CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY label, dim
    )
"""


def _pts_cent(spark, sf_dir):
    pts = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "val"),
    ).select("vec_id", "label", (F.col("pos") + 1).alias("dim"), "val")
    cent = pts.groupBy("label", "dim").agg(
        F.avg("val").alias("cv"), F.count(F.lit(1)).alias("n")
    )
    return pts, cent


# ===========================================================================
# R431 — Calinski-Harabasz variance-ratio criterion
# ===========================================================================

@register(
    "q_calinski_harabasz",
    f"""
    WITH {_SQL_PTS},
    gc AS (
      SELECT dim, AVG(val) AS gv FROM pts GROUP BY dim
    ),
    w AS (
      SELECT SUM((p.val - c.cv) * (p.val - c.cv)) AS w
      FROM pts p JOIN cent c ON p.label = c.label AND p.dim = c.dim
    ),
    b AS (
      SELECT SUM(c.n * (c.cv - gc.gv) * (c.cv - gc.gv)) AS b
      FROM cent c JOIN gc ON c.dim = gc.dim
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
      FROM pts
    )
    SELECT dims.n, dims.k,
           round(b.b, 4) AS between_ss,
           round(w.w, 4) AS within_ss,
           round((b.b / (dims.k - 1)) / (w.w / (dims.n - dims.k)), 4)
             AS calinski_harabasz
    FROM dims CROSS JOIN w CROSS JOIN b
    """,
)
def q_calinski_harabasz(spark, sf_dir):
    """R431 — variance-ratio criterion over the embedding labels:
    between-cluster dispersion B = Σ n_l·||c_l − c||² vs within
    W = Σ ||x − c_{l(x)}||², CH = (B/(k−1))/(W/(n−k)). One
    (label, dim) centroid pass (k·64 rows) + one point-centroid join
    that partial-aggregates map-side; no pairwise stage. sklearn
    calinski_harabasz_score is the test oracle."""
    pts, cent = _pts_cent(spark, sf_dir)
    gc = pts.groupBy("dim").agg(F.avg("val").alias("gv"))
    w = (
        pts.join(cent.select("label", "dim", "cv"), ["label", "dim"])
        .agg(
            F.sum(
                (F.col("val") - F.col("cv")) * (F.col("val") - F.col("cv"))
            ).alias("w")
        )
    )
    b = (
        cent.join(F.broadcast(gc), "dim")
        .agg(
            F.sum(
                F.col("n") * (F.col("cv") - F.col("gv"))
                * (F.col("cv") - F.col("gv"))
            ).alias("b")
        )
    )
    dims = pts.agg(
        F.countDistinct("label").alias("k"),
        F.countDistinct("vec_id").alias("n"),
    )
    j = dims.crossJoin(F.broadcast(w)).crossJoin(F.broadcast(b))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round("b", 4).alias("between_ss"),
        F.round("w", 4).alias("within_ss"),
        F.round(
            (F.col("b") / (F.col("k") - 1))
            / (F.col("w") / (F.col("n") - F.col("k"))),
            4,
        ).alias("calinski_harabasz"),
    )


# ===========================================================================
# R432 — Davies-Bouldin index
# ===========================================================================

@register(
    "q_davies_bouldin",
    f"""
    WITH {_SQL_PTS},
    pd AS (
      SELECT p.vec_id, p.label,
             sqrt(SUM((p.val - c.cv) * (p.val - c.cv))) AS dist
      FROM pts p JOIN cent c ON p.label = c.label AND p.dim = c.dim
      GROUP BY p.vec_id, p.label
    ),
    s AS (
      SELECT label, AVG(dist) AS s FROM pd GROUP BY label
    ),
    m AS (
      SELECT a.label AS li, b.label AS lj,
             sqrt(SUM((a.cv - b.cv) * (a.cv - b.cv))) AS m
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
      GROUP BY 1, 2
    ),
    r AS (
      SELECT m.li AS label, MAX((sa.s + sb.s) / m.m) AS max_r
      FROM m JOIN s sa ON sa.label = m.li JOIN s sb ON sb.label = m.lj
      GROUP BY 1
    ),
    db AS (SELECT AVG(max_r) AS db FROM r)
    SELECT r.label, round(s.s, 4) AS s_intra,
           round(r.max_r, 4) AS max_r,
           round(db.db, 4) AS davies_bouldin
    FROM r JOIN s ON s.label = r.label CROSS JOIN db
    ORDER BY r.label
    """,
)
def q_davies_bouldin(spark, sf_dir):
    """R432 — Davies-Bouldin over the embedding labels: S_i = mean
    member→centroid distance, M_ij = centroid separation, R_ij =
    (S_i+S_j)/M_ij, DB = mean over clusters of the worst R. The
    pairwise stage is k×k on CENTROIDS (k=10 here; broadcast-small at
    any corpus size), never on points — the scale contrast with
    q_silhouette. Per-label rows name each cluster's worst-separated
    neighbour pressure; sklearn davies_bouldin_score is the test
    oracle."""
    pts, cent = _pts_cent(spark, sf_dir)
    pd_ = (
        pts.join(cent.select("label", "dim", "cv"), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("val") - F.col("cv"))
                    * (F.col("val") - F.col("cv"))
                )
            ).alias("dist")
        )
    )
    s = pd_.groupBy("label").agg(F.avg("dist").alias("s"))
    ca = cent.select(
        F.col("label").alias("li"), "dim", F.col("cv").alias("cva")
    )
    cb = cent.select(
        F.col("label").alias("lj"), "dim", F.col("cv").alias("cvb")
    )
    m = (
        ca.join(cb, "dim")
        .filter(F.col("li") != F.col("lj"))
        .groupBy("li", "lj")
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("cva") - F.col("cvb"))
                    * (F.col("cva") - F.col("cvb"))
                )
            ).alias("m")
        )
    )
    sa = s.select(F.col("label").alias("li"), F.col("s").alias("sa"))
    sb = s.select(F.col("label").alias("lj"), F.col("s").alias("sb"))
    r = (
        m.join(F.broadcast(sa), "li")
        .join(F.broadcast(sb), "lj")
        .groupBy(F.col("li").alias("label"))
        .agg(F.max((F.col("sa") + F.col("sb")) / F.col("m")).alias("max_r"))
    )
    db = r.agg(F.avg("max_r").alias("db"))
    return (
        r.join(s, "label")
        .crossJoin(F.broadcast(db))
        .select(
            "label",
            F.round("s", 4).alias("s_intra"),
            F.round("max_r", 4).alias("max_r"),
            F.round("db", 4).alias("davies_bouldin"),
        )
        .orderBy("label")
    )


# ===========================================================================
# R433 — normalized mutual information vs an axis-argmax clustering
# ===========================================================================

_SQL_PRED = """
      CASE
        WHEN CAST(embedding[1] AS DOUBLE) >= CAST(embedding[2] AS DOUBLE)
         AND CAST(embedding[1] AS DOUBLE) >= CAST(embedding[3] AS DOUBLE)
         AND CAST(embedding[1] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE)
          THEN 1
        WHEN CAST(embedding[2] AS DOUBLE) >= CAST(embedding[3] AS DOUBLE)
         AND CAST(embedding[2] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE)
          THEN 2
        WHEN CAST(embedding[3] AS DOUBLE) >= CAST(embedding[4] AS DOUBLE)
          THEN 3
        ELSE 4
      END
"""


@register(
    "q_nmi_clustering",
    f"""
    WITH lab AS (
      SELECT label AS u, {_SQL_PRED} AS v FROM embeddings
    ),
    cells AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS c FROM lab GROUP BY u, v
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
    mu AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS cu FROM lab GROUP BY u),
    mv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cv FROM lab GROUP BY v),
    mi AS (
      SELECT SUM(cells.c * 1.0 / tot.n
                 * ln(tot.n * 1.0 * cells.c / (mu.cu * 1.0 * mv.cv)))
               AS mi
      FROM cells JOIN mu ON cells.u = mu.u
                 JOIN mv ON cells.v = mv.v
                 CROSS JOIN tot
    ),
    hu AS (
      SELECT -SUM(cu * 1.0 / tot.n * ln(cu * 1.0 / tot.n)) AS h
      FROM mu CROSS JOIN tot
    ),
    hv AS (
      SELECT -SUM(cv * 1.0 / tot.n * ln(cv * 1.0 / tot.n)) AS h
      FROM mv CROSS JOIN tot
    )
    SELECT tot.n, round(mi.mi, 6) AS mutual_info,
           round(hu.h, 6) AS h_true, round(hv.h, 6) AS h_pred,
           round(mi.mi / sqrt(hu.h * hv.h), 6) AS nmi
    FROM tot CROSS JOIN mi CROSS JOIN hu CROSS JOIN hv
    """,
)
def q_nmi_clustering(spark, sf_dir):
    """R433 — NMI (geometric normalization) between the true labels
    and the deterministic axis-argmax pseudo-clustering over the first
    four embedding dimensions (first maximum wins ties, stated
    identically in both engines). Contingency cells are exact counts;
    the entropies/MI are closed forms over ≤ k·4 cells. sklearn
    normalized_mutual_info_score(average_method='geometric') is the
    test oracle."""
    emb = _emb(spark, sf_dir)
    e = [
        F.element_at("embedding", i).cast("double") for i in (1, 2, 3, 4)
    ]
    pred = (
        F.when((e[0] >= e[1]) & (e[0] >= e[2]) & (e[0] >= e[3]), 1)
        .when((e[1] >= e[2]) & (e[1] >= e[3]), 2)
        .when(e[2] >= e[3], 3)
        .otherwise(4)
    )
    lab = emb.select(F.col("label").alias("u"), pred.alias("v"))
    cells = lab.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c"))
    tot = lab.agg(F.count(F.lit(1)).alias("n"))
    mu = lab.groupBy("u").agg(F.count(F.lit(1)).alias("cu"))
    mv = lab.groupBy("v").agg(F.count(F.lit(1)).alias("cv"))
    mi = (
        cells.join(F.broadcast(mu), "u")
        .join(F.broadcast(mv), "v")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("c") * 1.0 / F.col("n")
                * F.log(
                    F.col("n") * 1.0 * F.col("c")
                    / (F.col("cu") * 1.0 * F.col("cv"))
                )
            ).alias("mi")
        )
    )
    hu = mu.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            F.col("cu") * 1.0 / F.col("n")
            * F.log(F.col("cu") * 1.0 / F.col("n"))
        )).alias("hu")
    )
    hv = mv.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            F.col("cv") * 1.0 / F.col("n")
            * F.log(F.col("cv") * 1.0 / F.col("n"))
        )).alias("hv")
    )
    j = (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hu))
        .crossJoin(F.broadcast(hv))
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round("mi", 6).alias("mutual_info"),
        F.round("hu", 6).alias("h_true"),
        F.round("hv", 6).alias("h_pred"),
        F.round(
            F.col("mi") / F.sqrt(F.col("hu") * F.col("hv")), 6
        ).alias("nmi"),
    )
