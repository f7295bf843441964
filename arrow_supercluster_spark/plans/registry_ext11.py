"""Round-2 registry additions, batch 4: embedding int8 quantization,
TF-IDF keyword extraction, per-type z-score outliers, cross-doc
boilerplate n-gram detection, sliding event-time windows, a distributed
Lloyd k-means step, and a per-language median length filter.
All oracle-checked; float outputs rounded before hashing/ranking.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_supercluster_spark.operators import centroids
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs, _emb
from arrow_supercluster_spark.sources.tables import read_events


# ===========================================================================
# Embedding int8 quantization
# ===========================================================================

@register(
    "q_embedding_quantize",
    """
    SELECT vec_id,
           round(s, 9) AS scale,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) / s) AS INTEGER)
                          ) AS q,
           round(list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)
                      - round(CAST(x AS DOUBLE) / s) * s))), 6) AS max_err
    FROM (
      SELECT vec_id, embedding,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS s
      FROM (
        SELECT vec_id, embedding,
               CAST(list_max(list_transform(embedding, x -> abs(x)))
                    AS DOUBLE) AS m
        FROM embeddings
      ) t
    ) u
    """,
)
def q_embedding_quantize(spark, sf_dir):
    """Embedding ops — symmetric int8 quantization (the storage/serving
    compression every vector store applies at scale: 4× smaller than
    f32, SIMD-dottable): per-vector scale = max|x|/127, q = round(x/s),
    plus the max reconstruction error as the quality audit column.
    A narrow map — no shuffle, no UDF; at 100 TB this runs in the scan.
    The scale divides in DOUBLE on both engines (float bits promote
    identically) so q is integer-exact cross-engine; scale and max_err
    are rounded before hashing."""
    emb = _emb(spark, sf_dir)
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast(
        "double"
    )
    with_s = emb.select(
        "vec_id",
        "embedding",
        F.when(m == 0, F.lit(1.0)).otherwise(m / 127.0).alias("s"),
    )
    s = F.col("s")
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") / s).cast("int")
    )
    err = F.array_max(
        F.transform(
            "embedding",
            lambda x: F.abs(
                x.cast("double") - F.round(x.cast("double") / s) * s
            ),
        )
    )
    return with_s.select(
        "vec_id",
        F.round(s, 9).alias("scale"),
        q.alias("q"),
        F.round(err, 6).alias("max_err"),
    )


# ===========================================================================
# TF-IDF keyword extraction
# ===========================================================================

_TFIDF_K = 3


@register(
    "q_tfidf_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS dlen
      FROM toks GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round((tf.c / tf.dlen)
                   * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf FROM (
      SELECT doc_id, tok, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rk
      FROM scored
    ) WHERE rk <= {_TFIDF_K}
    """,
)
def q_tfidf_terms(spark, sf_dir):
    """Pipeline — per-document top-3 TF-IDF terms (keyword extraction /
    topic tagging; smoothed idf = ln((1+N)/(1+df))+1, the sklearn-
    documented public formula). One token agg builds (doc, tok, tf);
    document frequencies come back via a broadcast join (the token
    vocabulary is small relative to the corpus); the per-doc top-k
    window partitions by doc_id — bounded by doc length, not corpus
    size, so no hot reducer. Scores rounded before ranking so a 1-ulp
    ln() divergence can't flip the cutoff; ties break on token asc."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    dlen = Window.partitionBy("doc_id")
    tf = tf.withColumn("dlen", F.sum("c").over(dlen))
    df = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("df")
    )
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        F.round(
            (F.col("c") / F.col("dlen"))
            * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0),
            6,
        ).alias("tfidf"),
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "tok", "tfidf")
    )


# ===========================================================================
# Z-score outliers
# ===========================================================================

_Z_CUT = 2.0


@register(
    "q_zscore_outliers",
    f"""
    WITH stats AS (
      SELECT event_type,
             round(AVG(value), 6) AS mu,
             round(stddev_samp(value), 6) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sd, 4) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs(round((e.value - s.mu) / s.sd, 4)) >= {_Z_CUT}
    """,
)
def q_zscore_outliers(spark, sf_dir):
    """Pipeline — per-event-type z-score anomaly flagging (the profiling
    primitive behind data-quality alerts): one tiny stats agg (|types|
    rows → broadcast back), then a narrow filter over the stream. Mean
    and stddev are rounded to 6 before the z computation and z to 4
    before the cut so cross-engine aggregate association order can't
    flip a boundary row."""
    ev = read_events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", z.alias("z"))
        .filter(F.abs(F.col("z")) >= _Z_CUT)
    )


# ===========================================================================
# Cross-doc boilerplate n-grams
# ===========================================================================

_BP_N, _BP_MIN_DOCS = 3, 3


@register(
    "q_boilerplate_ngrams",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             array_to_string(t[i:i+{_BP_N - 1}], ' ') AS g
      FROM toks,
           unnest(generate_series(1, len(t) - {_BP_N - 1})) AS u(i)
      WHERE len(t) >= {_BP_N}
    ),
    frequent AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(*) FILTER (g IN (SELECT g FROM frequent)) AS n_boiler,
           round(COUNT(*) FILTER (g IN (SELECT g FROM frequent))
                 * 1.0 / COUNT(*), 6) AS boiler_frac
    FROM grams GROUP BY doc_id
    """,
)
def q_boilerplate_ngrams(spark, sf_dir):
    """Pipeline — cross-document boilerplate detection (the template/
    header removal step in every web-corpus pipeline, MassiveText-style
    repeated-span analysis): a 3-gram appearing in ≥3 distinct docs is
    boilerplate; each doc reports its boilerplate-position fraction.
    Shape: one n-gram agg keyed by gram (shuffle carries the gram string
    once per distinct gram via map-side combine); the frequent set is
    small by construction (only cross-doc repeats) → broadcast left
    semi-style flag join; the per-doc rollup keys on doc_id."""
    docs = _docs(spark, sf_dir)
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("t")).filter(
        F.size("t") >= _BP_N
    )
    grams = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (_BP_N - 1)),
                lambda i: F.array_join(F.slice("t", i, _BP_N), " "),
            )
        ).alias("g"),
    )
    frequent = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _BP_MIN_DOCS)
        .select("g", F.lit(1).alias("is_boiler"))
    )
    flagged = grams.join(F.broadcast(frequent), "g", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("is_boiler").alias("n_boiler"),
        F.round(
            F.count("is_boiler") / F.count(F.lit(1)).cast("double"), 6
        ).alias("boiler_frac"),
    )


# ===========================================================================
# Sliding event-time windows
# ===========================================================================

@register(
    "q_sliding_windows",
    """
    SELECT (epoch_us(ts) // 1000000 // 900 - k) * 900 AS w_start,
           COUNT(*) AS n, round(SUM(value), 4) AS sum_v
    FROM events, unnest(generate_series(0, 3)) AS u(k)
    GROUP BY 1
    """,
)
def q_sliding_windows(spark, sf_dir):
    """E6 companion — sliding event-time windows (1 h window / 15 min
    slide): each event lands in exactly 4 overlapping windows. Spark's
    window() generator expands in the projection (narrow) and the agg
    keys on window start — one shuffle with map-side combine, identical
    shape to the tumbling q_event_windows. The oracle derives the same
    4 aligned starts arithmetically from the epoch. Window start rides
    as epoch seconds so no timezone/format ambiguity reaches the hash."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"), "n", "sum_v"
        )
    )


# ===========================================================================
# Distributed Lloyd k-means step
# ===========================================================================

_KM_K = 8


@register(
    "q_kmeans_step",
    f"""
    WITH vec AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cid, v AS c FROM vec WHERE vec_id < {_KM_K}
    ),
    dists AS (
      SELECT vec.vec_id, seeds.cid,
             round(list_sum(list_transform(
               range(1, len(vec.v) + 1),
               j -> (vec.v[j] - seeds.c[j]) * (vec.v[j] - seeds.c[j])
             )), 6) AS d2
      FROM vec CROSS JOIN seeds
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM dists
      ) WHERE rk = 1
    )
    SELECT c.cid, s.n_vecs, c.centroid
    FROM (
      SELECT cid, list(av ORDER BY pos) AS centroid FROM (
        SELECT cid, pos, round(AVG(v), 6) AS av FROM (
          SELECT a.cid, unnest(vec.v) AS v,
                 unnest(generate_series(0, len(vec.v) - 1)) AS pos
          FROM assign a JOIN vec USING (vec_id)
        ) x GROUP BY 1, 2
      ) y GROUP BY cid
    ) c
    JOIN (SELECT cid, COUNT(*) AS n_vecs FROM assign GROUP BY cid) s
      USING (cid)
    """,
)
def q_kmeans_step(spark, sf_dir):
    """Embedding ops — one distributed Lloyd iteration (k-means, the IVF
    coarse quantizer's trainer): deterministic seeds (lowest k vec_ids),
    squared-L2 argmin against literal-shipped centroids (narrow map, no
    corpus shuffle), then the recomputed means via posexplode partial
    agg. The oracle recomputes assignment with the naive window form —
    differentially checking the array_min argmin rewrite. Distances and
    means rounded before comparison/output (see centroids.kmeans_step)."""
    return centroids.kmeans_step(_emb(spark, sf_dir), k=_KM_K)


# ===========================================================================
# Per-language median length filter
# ===========================================================================

@register(
    "q_median_length_filter",
    """
    WITH med AS (
      SELECT lang, quantile_cont(n_chars, 0.5) AS m
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN med USING (lang)
    WHERE d.n_chars > med.m
    """,
)
def q_median_length_filter(spark, sf_dir):
    """Pipeline — adaptive per-language length filter (keep docs above
    their own language's median length — thresholds derived from the
    corpus, the way real curation pipelines set them, rather than
    hand-tuned constants). The median table is |langs| rows → broadcast
    back; the filter is narrow. Medians of integer n_chars interpolate
    at worst to .5 — exactly representable, so the > cut is safe
    without rounding."""
    docs = _docs(spark, sf_dir)
    med = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("m")
    )
    return (
        docs.join(F.broadcast(med), "lang")
        .filter(F.col("n_chars") > F.col("m"))
        .select("doc_id", "lang", "n_chars")
    )
