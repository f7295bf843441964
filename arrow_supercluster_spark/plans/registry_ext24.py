"""Round-2 registry additions, batch 19 — spatial encoding and corpus
profiling:

- q_geohash_encode: classic geohash base32 cell codes (precision 6) as a
  pure JVM bit-interleave expression — the linearized spatial key that
  backs Z-order-style layout (sources/layout.py) with a portable,
  human-readable surface;
- q_char_entropy: per-document Shannon character entropy — a quality
  signal (gibberish / repeated-char detection) computed entirely in-row
  with nested HOFs, zero shuffle;
- q_equidepth_hist: equi-depth (quantile-boundary) histogram of
  events.value — the equi-width q_value_histogram's sibling; cuts are a
  tiny broadcast, assignment is a narrow comparison fold.

All three mirror their DuckDB oracles token-for-token on the integer/bit
arithmetic and round transcendental/aggregated floats per the registry's
float-parity discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Geohash encoding
# ===========================================================================

_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_PRECISION = 6                       # 6 chars = 30 bits (15 lng + 15 lat)
_GH_BITS = 5 * _GH_PRECISION
_GH_HALF = _GH_BITS // 2                # bits per axis


def _interleave_sql(lng_i: str, lat_i: str) -> str:
    """SQL for the interleaved 30-bit cell id: even bit positions (from the
    MSB) take longitude bits, odd take latitude — the geohash bit layout."""
    terms = []
    for i in range(_GH_HALF):
        terms.append(f"(({lng_i} >> {_GH_HALF - 1 - i}) & 1) * {1 << (_GH_BITS - 1 - 2 * i)}")
        terms.append(f"(({lat_i} >> {_GH_HALF - 1 - i}) & 1) * {1 << (_GH_BITS - 2 - 2 * i)}")
    return " + ".join(terms)


def _interleave_col(lng_i, lat_i):
    acc = F.lit(0).cast("long")
    for i in range(_GH_HALF):
        acc = acc + F.shiftright(lng_i, _GH_HALF - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (_GH_BITS - 1 - 2 * i)
        )
        acc = acc + F.shiftright(lat_i, _GH_HALF - 1 - i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (_GH_BITS - 2 - 2 * i)
        )
    return acc


@register(
    "q_geohash_encode",
    f"""
    WITH pts AS (
      SELECT id, lng, lat FROM ({SQL_POINTS})
      WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    scaled AS (
      SELECT id,
             least(CAST(floor(((lng + 180.0) / 360.0) * {1 << _GH_HALF}.0) AS BIGINT),
                   {(1 << _GH_HALF) - 1}) AS lng_i,
             least(CAST(floor(((lat + 90.0) / 180.0) * {1 << _GH_HALF}.0) AS BIGINT),
                   {(1 << _GH_HALF) - 1}) AS lat_i
      FROM pts
    ),
    cells AS (
      SELECT id, {_interleave_sql("lng_i", "lat_i")} AS cell FROM scaled
    )
    SELECT id,
           {" || ".join(
               f"substr('{_GH_ALPHA}', CAST((cell >> {_GH_BITS - 5 * (g + 1)}) & 31 AS INTEGER) + 1, 1)"
               for g in range(_GH_PRECISION)
           )} AS geohash
    FROM cells
    """,
)
def q_geohash_encode(spark, sf_dir):
    """Geo depth — geohash encoding at precision 6: scale each axis to a
    15-bit integer, interleave bits MSB-first (lng first, the public
    geohash layout), map each 5-bit group through the base32 alphabet.
    Entirely integer arithmetic inside one narrow projection — bit-exact
    cross-engine, no shuffle, survives any scale as a map-only stage.
    This is the human-readable form of the space-filling-curve key the
    Z-order layout (sources/layout.py) sorts by: prefix-equality =
    spatial proximity, so range scans over geohash-sorted parquet get
    min/max row-group pruning — the relational stand-in for the
    reference's per-zoom KDBush (arrow-cluster-engine.ts:418-426)."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    )
    half_max = F.lit((1 << _GH_HALF) - 1).cast("long")
    lng_i = F.least(
        F.floor(((F.col("lng") + F.lit(180.0)) / F.lit(360.0)) * F.lit(float(1 << _GH_HALF))).cast("long"),
        half_max,
    )
    lat_i = F.least(
        F.floor(((F.col("lat") + F.lit(90.0)) / F.lit(180.0)) * F.lit(float(1 << _GH_HALF))).cast("long"),
        half_max,
    )
    cell = _interleave_col(lng_i, lat_i)
    alpha = F.array(*[F.lit(c) for c in _GH_ALPHA])
    scaled = pts.select("id", cell.alias("cell"))
    chars = [
        F.element_at(
            alpha,
            (F.shiftright(F.col("cell"), _GH_BITS - 5 * (g + 1)).bitwiseAND(F.lit(31)) + 1).cast("int"),
        )
        for g in range(_GH_PRECISION)
    ]
    return scaled.select("id", F.concat(*chars).alias("geohash"))


# ===========================================================================
# Character-entropy quality signal
# ===========================================================================

@register(
    "q_char_entropy",
    """
    WITH per_doc AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ''), x -> x != '') AS cs
      FROM documents
    ),
    stats AS (
      SELECT doc_id, lang,
             length(cs) AS n,
             length(list_distinct(cs)) AS n_distinct,
             list_sum(list_transform(
               list_distinct(cs),
               c -> length(list_filter(cs, x -> x = c))
                    * log2(length(list_filter(cs, x -> x = c)))
             )) AS s
      FROM per_doc
    )
    SELECT doc_id, lang, n, n_distinct,
           CASE WHEN n = 0 THEN 0.0
                ELSE round(log2(CAST(n AS DOUBLE)) - s / n, 6) END AS entropy
    FROM stats
    """,
)
def q_char_entropy(spark, sf_dir):
    """Text quality — per-document Shannon character entropy,
    H = log2(n) − (Σ cnt·log2 cnt)/n over the character multiset: low
    entropy flags repeated-char spam / boilerplate, high flags random
    noise — a standard corpus-quality gate alongside q_text_quality and
    q_repetition_stats. Computed IN-ROW with nested HOFs (distinct chars
    ≈ alphabet size, so the count-per-char scan is O(|Σ|·len) JVM work):
    zero shuffle, zero Python — at 100 TB this is a map-only stage. The
    char array is bound as a lambda variable (the shingles() outer-array
    idiom, operators/dedup.py:57-72) so the split pipeline is evaluated
    once per row, not once per distinct char. Entropy is a sum over an
    engine-dependent distinct ordering → rounded to 6 digits (registry
    float-parity discipline); counts are exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cs_raw = F.filter(F.split(F.col("text"), ""), lambda x: x != F.lit(""))

    def inner(cs):
        n = F.size(cs)
        u = F.array_distinct(cs)
        s = F.aggregate(
            u,
            F.lit(0.0),
            lambda acc, c: acc
            + F.size(F.filter(cs, lambda x: x == c)).cast("double")
            * F.log2(F.size(F.filter(cs, lambda x: x == c)).cast("double")),
        )
        ent = F.when(n == 0, F.lit(0.0)).otherwise(
            F.round(F.log2(n.cast("double")) - s / n.cast("double"), 6)
        )
        return F.struct(
            n.cast("long").alias("n"),
            F.size(u).cast("long").alias("n_distinct"),
            ent.alias("entropy"),
        )

    st = F.element_at(F.transform(F.array(cs_raw), inner), 1)
    return docs.select(
        "doc_id",
        "lang",
        st["n"].alias("n"),
        st["n_distinct"].alias("n_distinct"),
        st["entropy"].alias("entropy"),
    )


# ===========================================================================
# Equi-depth histogram
# ===========================================================================

_ED_BUCKETS = 10
_ED_PS = [i / _ED_BUCKETS for i in range(1, _ED_BUCKETS)]


@register(
    "q_equidepth_hist",
    f"""
    WITH cuts AS (
      SELECT {", ".join(f"round(quantile_cont(value, {p}), 6) AS c{i}" for i, p in enumerate(_ED_PS))}
      FROM events WHERE value IS NOT NULL
    ),
    t AS (
      SELECT value,
             1 {"".join(f" + CAST(value > c{i} AS INTEGER)" for i in range(len(_ED_PS)))} AS bucket
      FROM events, cuts WHERE value IS NOT NULL
    )
    SELECT bucket, COUNT(*) AS n,
           round(MIN(value), 6) AS lo,
           round(MAX(value), 6) AS hi,
           round(SUM(value), 4) AS total
    FROM t GROUP BY bucket
    """,
)
def q_equidepth_hist(spark, sf_dir):
    """Profiling — equi-depth histogram of events.value (the optimizer-
    statistics shape: every bucket holds ≈1/10 of the rows, boundaries at
    exact deciles). Complements the equi-width q_value_histogram. Plan:
    one exact-percentile agg produces a 1-row cut table (decile
    boundaries rounded to 6 digits so a 1-ulp interpolation divergence
    can't flip a boundary comparison — the q_weighted_sample idiom),
    broadcast to a narrow strictly-greater fold for bucket assignment,
    then one partial-agg group-by on a 10-value key. At 100 TB the cut
    computation swaps to percentile_approx (q_approx_quantiles) and the
    rest of the plan is unchanged."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    cuts = ev.agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(f"c{i}")
            for i, p in enumerate(_ED_PS)
        ]
    )
    b = ev.select("value").crossJoin(F.broadcast(cuts))
    bucket = F.lit(1)
    for i in range(len(_ED_PS)):
        bucket = bucket + (F.col("value") > F.col(f"c{i}")).cast("int")
    return (
        b.select("value", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )
