"""Round-5 registry additions, batch 120 — streaming CDC, survey
sampling design, and overdispersed count modelling:

- q_cdc_stream: the STREAMING twin of q_cdc_apply — the CDC op log
  arrives one file per micro-batch (maxFilesPerTrigger=1), foreachBatch
  folds each batch into the running silver state (per-key argmax over
  (ts, seq), deletes as tombstones, an associative+commutative merge),
  and the final emit equals the batch materialization row-for-row.
  The bronze→silver lakehouse job as Structured Streaming.
- q_neyman_allocation: optimal (Neyman) stratified-sample allocation —
  n_h ∝ N_h·σ_h under a fixed budget, integer-ized by largest
  remainder so the allocations sum exactly to the budget. The survey
  -design step above q_stratified_sample's fixed quotas: high-variance
  strata earn more samples.
- q_negbin_fit: negative-binomial method-of-moments fit (r, p) to the
  per-type daily count series with the Poisson-adequacy verdict —
  the overdispersion follow-through to q_poisson_dispersion's test
  (when var > mean, Poisson underfits and NB's r = m²/(v−m) says by
  how much).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_NEYMAN_BUDGET = 1000


@register("q_cdc_stream", None)
def q_cdc_stream(spark, sf_dir):
    """R354 — streaming CDC materialization: the q_cdc_apply op log is
    written as multiple files, streamed with maxFilesPerTrigger=1
    (one micro-batch per file), and folded per batch into the running
    state by streaming/cdc.fold_cdc_batch — per-key (ts, seq)-argmax
    with tombstoned deletes and summed op counts; the merge is
    associative + commutative, so the final state is independent of
    the batch split (pinned by the re-split equivalence test). Output
    = live upserts in the batch twin's column shape; streaming≡batch
    equality is asserted in tests/test_batch120.py. Rows-only (a
    stateful foreachBatch fold has no SQL form)."""
    import tempfile

    from arrow_supercluster_spark.streaming import cdc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ops = cdc.cdc_ops(orders)
    src = tempfile.mkdtemp(prefix="cdc_stream_src_")
    ops.repartition(4, "seq").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = {"df": None}

    def fold(batch_df, batch_id):
        state["df"] = cdc.fold_cdc_batch(state["df"], batch_df)

    q = (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return cdc.finish_cdc_state(state["df"]).orderBy("custkey")


@register(
    "q_neyman_allocation",
    f"""
    WITH strata AS (
      SELECT event_type AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sc,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS ssq
      FROM events GROUP BY event_type
    ),
    sig AS (
      SELECT stratum, n_h,
             sqrt((ssq - sc * sc * 1.0 / n_h) / (10000.0 * (n_h - 1)))
               AS sigma
      FROM strata
    ),
    w AS (
      SELECT stratum, n_h, sigma,
             n_h * sigma / (SELECT SUM(n_h * sigma) FROM sig) AS share
      FROM sig
    ),
    quota AS (
      SELECT stratum, n_h, sigma, share,
             {_NEYMAN_BUDGET} * share AS q,
             CAST(floor({_NEYMAN_BUDGET} * share) AS BIGINT) AS base
      FROM w
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY q - base DESC, stratum) AS rk,
             {_NEYMAN_BUDGET} - (SELECT SUM(base) FROM quota) AS leftover
      FROM quota
    )
    SELECT stratum, n_h,
           round(sigma, 4) AS sigma,
           round(share, 6) AS share,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS n_alloc
    FROM ranked
    ORDER BY stratum
    """,
)
def q_neyman_allocation(spark, sf_dir):
    """R355 — Neyman-optimal stratified allocation of a {b}-unit sample
    budget over the event-type strata: n_h ∝ N_h·σ_h (σ from exact
    integer-cent moments), integerized by largest remainder (floor +
    top-remainder bonus, rank ties to the stratum name) so Σn_h = {b}
    exactly. High-variance strata earn proportionally more sample —
    the variance-minimizing design for a stratified mean estimate.
    One keyed agg + a |strata|-row broadcast ranking.""".format(
        b=_NEYMAN_BUDGET
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.round(F.col("value") * 100).cast("long")
    strata = ev.groupBy(F.col("event_type").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(cents).alias("sc"),
        F.sum(cents * cents).alias("ssq"),
    )
    sig = strata.select(
        "stratum",
        "n_h",
        F.sqrt(
            (F.col("ssq") - F.col("sc") * F.col("sc") * 1.0 / F.col("n_h"))
            / (10000.0 * (F.col("n_h") - 1))
        ).alias("sigma"),
    )
    tot = sig.agg(F.sum(F.col("n_h") * F.col("sigma")).alias("t"))
    quota = sig.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "sigma",
        (F.col("n_h") * F.col("sigma") / F.col("t")).alias("share"),
    ).select(
        "stratum",
        "n_h",
        "sigma",
        "share",
        (F.lit(_NEYMAN_BUDGET) * F.col("share")).alias("q"),
        F.floor(F.lit(_NEYMAN_BUDGET) * F.col("share")).alias("base"),
    )
    # join-based rank over the |strata|-row frame — no window at all,
    # so the registry-wide unpartitioned-window gate stays clean
    other = quota.select(
        F.col("stratum").alias("o_stratum"),
        (F.col("q") - F.col("base")).alias("o_rem"),
    )
    rem = F.col("q") - F.col("base")
    rk = (
        quota.join(
            F.broadcast(other),
            (F.col("o_rem") > rem)
            | ((F.col("o_rem") == rem) & (F.col("o_stratum") < F.col("stratum"))),
            "left",
        )
        .groupBy("stratum", "n_h", "sigma", "share", "q", "base")
        .agg((F.count("o_stratum") + 1).alias("rk"))
    )
    base_sum = quota.agg(F.sum("base").alias("bs"))
    ranked = rk.crossJoin(F.broadcast(base_sum)).select(
        "*",
        (F.lit(_NEYMAN_BUDGET) - F.col("bs")).alias("leftover"),
    )
    return ranked.select(
        "stratum",
        "n_h",
        F.round("sigma", 4).alias("sigma"),
        F.round("share", 6).alias("share"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_alloc"),
    ).orderBy("stratum")


@register(
    "q_negbin_fit",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(c) AS s, SUM(c * c) AS ssq
      FROM daily GROUP BY event_type
    ),
    mv AS (
      SELECT event_type, n_days,
             s * 1.0 / n_days AS mean_c,
             (ssq - s * s * 1.0 / n_days) / (n_days - 1) AS var_c
      FROM m
    )
    SELECT event_type, n_days,
           round(mean_c, 4) AS mean_c,
           round(var_c, 4) AS var_c,
           (var_c > mean_c) AS overdispersed,
           round(CASE WHEN var_c > mean_c
                      THEN mean_c * mean_c / (var_c - mean_c) END, 4) AS r,
           round(CASE WHEN var_c > mean_c
                      THEN mean_c / var_c END, 6) AS p
    FROM mv
    ORDER BY event_type
    """,
)
def q_negbin_fit(spark, sf_dir):
    """R356 — negative-binomial method-of-moments fit to the per-type
    daily counts: r = m²/(v−m), p = m/v when overdispersed (v > m),
    NULL otherwise (Poisson adequate — the q_poisson_dispersion
    verdict made quantitative). Integer count moments ⇒ exact; the
    arrival-modelling step behind capacity planning and count
    regression. Two keyed aggs."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    mean_c = F.col("s") * 1.0 / F.col("n_days")
    var_c = (
        F.col("ssq") - F.col("s") * F.col("s") * 1.0 / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return m.select(
        "event_type",
        "n_days",
        F.round(mean_c, 4).alias("mean_c"),
        F.round(var_c, 4).alias("var_c"),
        (var_c > mean_c).alias("overdispersed"),
        F.round(
            F.when(var_c > mean_c, mean_c * mean_c / (var_c - mean_c)), 4
        ).alias("r"),
        F.round(F.when(var_c > mean_c, mean_c / var_c), 6).alias("p"),
    ).orderBy("event_type")
