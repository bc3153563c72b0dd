"""Recrawl scheduling: page change-rate estimation + staleness priority.

A production crawler does not stop after the first fetch — the frontier
needs a signal for WHICH urls to refetch first. The standard estimator
(Cho & Garcia-Molina, "Estimating Frequency of Change", TOIT 2003) takes
a fetch history of ``n`` equal-interval observations of a page, ``X`` of
which found the page changed, and estimates the Poisson change rate

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / tau

(the +0.5 terms are the paper's bias correction that keeps the estimator
finite when every observation saw a change). Under the Poisson model the
probability the page is stale ``delta`` after its last fetch is
``1 - exp(-lambda_hat * delta)`` — that probability IS the recrawl
priority: refetch the pages most likely to have changed.

The reference crawler (vctruong100/spacetime-crawler4) fetches each URL
exactly once (frontier.py marks COMPLETE and never re-queues), so this
plane is the web-scale extension, not a parity surface.

No real fetch-history table exists in this sandbox, so a deterministic
synthetic log derives from the documents table via the md5 bucket family
(operators/sampling.sample_bucket) — the same injection discipline as the
PII audit: the DuckDB oracle re-derives the identical log bit-for-bit, so
the estimator itself is checked end to end, not the fixture.

Scale shape: log synthesis is a map-only ``sequence``+``explode`` (on a
real cluster the log is the Iceberg fetch-history table and this step
disappears); the estimator is ONE partial-aggregated groupBy on the url
key. Map-side combine shrinks the shuffle to one row per url, and the
output joins host-level onto the frontier's ``priority_table``
(crawl/engine.CrawlConfig.frontier_policy='domain_rank') to steer wave
selection toward fast-changing hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.sampling import sample_bucket

# synthetic-log parameter ranges (documented so the oracle mirrors them)
OBS_MIN, OBS_SPAN = 3, 5  # observations per url: 3..7
TAU_MIN, TAU_SPAN = 1, 7  # fetch interval, days: 1..7
P_MIN, P_SPAN = 5, 90  # per-url change propensity, percent: 5..94


def synthetic_fetch_log(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic fetch history: one row per (url, fetch).

    Per url (keyed on ``id_col``): ``n_obs`` in [3,7] observations at a
    fixed ``tau_days`` in [1,7] interval, each observation flagged changed
    with a per-url propensity in [5,94]% — every draw an independent md5
    bucket of (salt, key), so Spark and the SQL oracle synthesize the
    byte-identical log. Columns: (id, tau_days, obs_idx, changed).
    """
    key = F.col(id_col)
    base = docs.select(
        key.alias("id"),
        (F.lit(OBS_MIN) + F.pmod(sample_bucket(key, "fr:n"), F.lit(OBS_SPAN)))
        .cast("int")
        .alias("n_obs"),
        (F.lit(TAU_MIN) + F.pmod(sample_bucket(key, "fr:tau"), F.lit(TAU_SPAN)))
        .cast("int")
        .alias("tau_days"),
        (F.lit(P_MIN) + F.pmod(sample_bucket(key, "fr:p"), F.lit(P_SPAN)))
        .cast("int")
        .alias("p_pct"),
    )
    obs = base.select(
        "id",
        "tau_days",
        "p_pct",
        F.explode(F.sequence(F.lit(1), F.col("n_obs"))).alias("obs_idx"),
    )
    draw = sample_bucket(
        F.concat(F.col("id").cast("string"), F.lit(":"), F.col("obs_idx").cast("string")),
        "fr:chg",
    )
    return obs.select(
        "id",
        "tau_days",
        "obs_idx",
        (F.pmod(draw, F.lit(100)) < F.col("p_pct")).cast("int").alias("changed"),
    )


def change_rate(log: DataFrame, horizon_days: float = 7.0) -> DataFrame:
    """Cho–Garcia-Molina change-rate + staleness priority per url.

    Input: a fetch log (id, tau_days, obs_idx, changed) — tau_days constant
    per id (equal-interval observations, the paper's setting). Output per
    id: observation counts, ``lambda_day`` (estimated changes/day, 6dp) and
    ``p_stale`` = P(changed within ``horizon_days`` of the last fetch, 6dp)
    — the refetch priority. One groupBy; the ln/exp run on the unrounded
    aggregate exactly as the oracle does.
    """
    agg = log.groupBy("id", "tau_days").agg(
        F.count("*").alias("n_obs"),
        F.sum("changed").alias("n_changed"),
    )
    lam = (
        -F.log(
            (F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
            / (F.col("n_obs") + F.lit(0.5))
        )
        / F.col("tau_days")
    )
    return agg.select(
        "id",
        "tau_days",
        "n_obs",
        "n_changed",
        F.round(lam, 6).alias("lambda_day"),
        F.round(F.lit(1.0) - F.exp(-lam * F.lit(horizon_days)), 6).alias("p_stale"),
    )
