"""Round-2 registry additions, batch 47 — hexagonal binning, ANN
evaluation, and tokenizer fertility:

- q_hexbin: pointy-top hexagonal binning (axial coordinates + cube
  rounding, pure arithmetic) — the hexagon-layer aggregation, the
  square grid's low-distortion sibling;
- q_lsh_eval: precision/recall of the sign-LSH near-dup path against
  the exact pair set, as a driver-visible one-row report (rows-only —
  the hyperplanes are engine-seeded);
- q_bpe_fertility: BPE tokens-per-word by language — the tokenizer
  fairness/efficiency diagnostic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext25 import _BPE_ENCODE_SQL
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points

# ===========================================================================
# Hex binning
# ===========================================================================

_HEX_SIZE = 1.5  # hex circumradius in degrees


def _hex_cols(lng, lat):
    """Axial hex coordinates via cube rounding (Red Blob Games' public
    formulation), pointy-top: fractional axial → cube → round → repair
    the largest-residual axis. Pure +-*/ and CASE — identical both
    engines."""
    qf = (F.sqrt(F.lit(3.0)) / 3.0 * lng - 1.0 / 3.0 * lat) / _HEX_SIZE
    rf = (2.0 / 3.0 * lat) / _HEX_SIZE
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = F.round(xf, 0), F.round(yf, 0), F.round(zf, 0)
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when((dx > dy) & (dx > dz), rz).otherwise(
        F.when(dz > dy, -rx - ry).otherwise(rz)
    )
    return q.cast("long"), r.cast("long")


def _sql_hex(lng: str, lat: str) -> tuple[str, str]:
    qf = f"((sqrt(3.0) / 3.0 * {lng} - 1.0 / 3.0 * {lat}) / {_HEX_SIZE})"
    rf = f"((2.0 / 3.0 * {lat}) / {_HEX_SIZE})"
    xf, zf = qf, rf
    yf = f"(-{xf} - {zf})"
    rx, ry, rz = f"round({xf}, 0)", f"round({yf}, 0)", f"round({zf}, 0)"
    dx = f"abs({rx} - {xf})"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - {zf})"
    q = f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN -{ry} - {rz} ELSE {rx} END)"
    r = (
        f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN {rz} "
        f"WHEN {dz} > {dy} THEN -{rx} - {ry} ELSE {rz} END)"
    )
    return f"CAST({q} AS BIGINT)", f"CAST({r} AS BIGINT)"


_HQ, _HR = _sql_hex("lng", "lat")


@register(
    "q_hexbin",
    f"""
    SELECT hq, hr, COUNT(*) AS n,
           round(AVG(lng), 6) AS mean_lng,
           round(AVG(lat), 6) AS mean_lat
    FROM (
      SELECT lng, lat, {_HQ} AS hq, {_HR} AS hr
      FROM ({SQL_POINTS}) WHERE lng IS NOT NULL AND lat IS NOT NULL
    )
    GROUP BY hq, hr
    """,
)
def q_hexbin(spark, sf_dir):
    """Geo visualization — hexagonal binning (axial coordinates + cube
    rounding, the public Red Blob formulation): per-hex counts and mean
    positions — the hexagon-layer aggregation that renders with ~13%
    less worst-case quantization distortion than squares. The hex
    assignment is pure narrow arithmetic (no trig, no UDF); one
    partial-agg group-by on the hex key. Same scale story as every cell
    aggregation: map + one bounded-key shuffle."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    )
    hq, hr = _hex_cols(F.col("lng"), F.col("lat"))
    return (
        pts.select("lng", "lat", hq.alias("hq"), hr.alias("hr"))
        .groupBy("hq", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("lng"), 6).alias("mean_lng"),
            F.round(F.avg("lat"), 6).alias("mean_lat"),
        )
    )


# ===========================================================================
# LSH evaluation
# ===========================================================================

@register("q_lsh_eval", None)
def q_lsh_eval(spark, sf_dir):
    """ANN eval — the sign-LSH near-dup path scored against the exact
    pair set (cos ≥ 0.45), as a driver-visible report: candidate pairs,
    exact pairs, overlap, precision, recall. Rows-only (the hyperplanes
    are engine-seeded numpy draws — deterministic within Spark, not
    SQL-replicable); the recall/precision floor is asserted in
    tests/test_batch47.py. This is the measurement loop every
    LSH-parameter choice must close."""
    from arrow_supercluster_spark.operators.similarity import (
        cosine_pairs_gemm,
        neardup_pairs_lsh,
    )

    from arrow_supercluster_spark.functions.checkpoint import truncate

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # r10: both pair sets feed TWO consumers each (their count + the
    # overlap semijoin); unmaterialized, the O(n²) GEMM kernel and the
    # 8-table LSH build each ran twice per invocation (30.6 s → ~15 s
    # at sf0.1).  truncate caps each at one execution.
    lsh = truncate(
        neardup_pairs_lsh(emb, threshold=0.45, n_planes=4, n_tables=8).select(
            "a_id", "b_id"
        )
    )
    # r7: the exact ground-truth pair set runs through the BLAS pair
    # kernel (one matmul per Arrow batch) — identical up to round-6,
    # replacing the per-row HOF all-pairs join
    exact = truncate(cosine_pairs_gemm(emb, 0.45).select("a_id", "b_id"))
    n_lsh = lsh.count()
    n_exact = exact.count()
    n_common = lsh.join(exact, ["a_id", "b_id"], "leftsemi").count()
    row = [
        (
            n_exact,
            n_lsh,
            n_common,
            round(n_common / n_lsh, 6) if n_lsh else None,
            round(n_common / n_exact, 6) if n_exact else None,
        )
    ]
    return spark.createDataFrame(
        row, "n_exact long, n_lsh long, n_common long, precision double, recall double"
    )


# ===========================================================================
# BPE fertility
# ===========================================================================

@register(
    "q_bpe_fertility",
    f"""
    WITH enc AS ({_BPE_ENCODE_SQL})
    SELECT d.lang,
           COUNT(*) AS n_docs,
           SUM(enc.n_words) AS n_words,
           SUM(enc.n_bpe) AS n_bpe,
           round(SUM(enc.n_bpe) * 1.0 / SUM(enc.n_words), 6) AS fertility
    FROM enc JOIN documents d ON d.doc_id = enc.doc_id
    GROUP BY d.lang
    """,
)
def q_bpe_fertility(spark, sf_dir):
    """Tokenizer diagnostics — BPE fertility (tokens per word) by
    language under the corpus-trained 3-merge tokenizer: uneven
    fertility across languages is the classic tokenizer-bias signal
    (some languages pay more tokens per word). Reuses q_bpe_encode's
    driver-literal merges and in-row encode, adds a |langs|-row rollup;
    the oracle wraps the same unrolled-CTE encode in the lang join."""
    from arrow_supercluster_spark.plans.registry_ext25 import q_bpe_encode

    enc = q_bpe_encode(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        enc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe").alias("n_bpe"),
            F.round(F.sum("n_bpe") * 1.0 / F.sum("n_words"), 6).alias("fertility"),
        )
    )
