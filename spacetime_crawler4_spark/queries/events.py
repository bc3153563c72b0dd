"""Events-plane queries: sessionization, as-of, retention, funnels.

Split from the former single-module queries.py (round 5); definition
order within this file is preserved from the original.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import resources as _res
import math
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spacetime_crawler4_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dup_cluster_stats,
    duplicated_span_stats,
    remove_duplicated_spans,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    oph_lsh_pairs,
    simhash_docs,
    simhash_near_pairs,
    sql_tokens,
    word_shingles,
)
from spacetime_crawler4_spark.operators.multimodal import extract_media_meta
from spacetime_crawler4_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
    weighted_sample,
)
from spacetime_crawler4_spark.operators.webfilter import (
    DOC_GOOD_RULES,
    HOST_BLOCK_MEAN_RULES,
    c4_clean_lines,
    gopher_quality,
    host_reputation,
    repetition_stats,
)
from spacetime_crawler4_spark.operators.asof import asof_join
from spacetime_crawler4_spark.operators.decontam import (
    decontaminate,
    incremental_dedup,
)
from spacetime_crawler4_spark.operators.pii import (
    PII_PATTERNS,
    inject_pii,
    pii_report,
)
from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS
from spacetime_crawler4_spark.operators.graph import hits, pagerank, triangle_count
from spacetime_crawler4_spark.operators.quantize import int8_fidelity
from spacetime_crawler4_spark.operators.sketch import (
    CMS_DEPTH,
    cms_pairs_sql,
    cms_point_estimates,
    cms_registers,
    hll_estimate,
    hll_register_expr,
    hll_sql,
)
from spacetime_crawler4_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_pairs,
    ivf_assign,
    ivf_topk,
    ivf_topk_multiprobe,
    ivf_train,
    srp_near_pairs,
    srp_planes,
)
from spacetime_crawler4_spark.operators.textstats import (
    BACKOFF_ALPHA,
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    bigram_bits_per_token,
    doc_fingerprint,
    langid_heuristic,
    quality_features,
    token_stats,
    unigram_bits_per_token,
)
import os as _os

from ._shared import _FUNNEL_STEPS, _MAD_K, _RETENTION_MAX_DAY, _t  # noqa: F401



# --------------------------------------------------------------------------
# events plane (windows / event-time)
# --------------------------------------------------------------------------


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("day", "event_type")
    )


SQL_EVENTS_DAILY = """
SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(20)
    )


SQL_EVENTS_TOP_USERS = """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id ORDER BY total_value DESC, user_id ASC LIMIT 20
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session counts with a 30-minute inactivity gap (window
    functions: lag + conditional running sum — SURVEY.md §2.5 class)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gaps = ev.withColumn(
        "new_sess",
        (epoch - F.coalesce(F.lag(epoch).over(w), F.lit(0)) > 1800).cast("int"),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("new_sess")).cast("long").alias("n_sessions"),
        )
        .orderBy("user_id")
    )


SQL_EVENTS_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - coalesce(
                lag(CAST(floor(epoch(ts)) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
              > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions
FROM g GROUP BY user_id ORDER BY user_id
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence funnel (view -> click -> purchase, strict
    time order per user): users reaching each stage plus the end-to-end
    conversion rate. Three progressively-shrinking stage aggregates —
    each keyed on user_id so every join reuses the same hash partitioning;
    the stage frames only ever shrink, never the event fact re-shuffled."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    total = ev.agg(F.count_distinct("user_id").alias("n_users"))
    return (
        total.crossJoin(v.agg(F.count("*").alias("n_view")))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
        .select(
            "n_users",
            "n_view",
            "n_view_click",
            "n_full_funnel",
            F.round(F.col("n_full_funnel") / F.col("n_users"), 6).alias("conv_rate"),
        )
    )


SQL_EVENTS_FUNNEL = f"""
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel,
       round((SELECT count(*) FROM p) * 1.0
             / (SELECT count(DISTINCT user_id) FROM events), 6) AS conv_rate
"""


def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: seconds from first view to the first purchase
    after it, per converting user — exact median/p90 (Spark `percentile`
    == DuckDB `quantile_cont`). Same shrinking per-user stage aggregates
    as events_funnel."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.first("t1").alias("t1"))
    )
    secs = F.col("t3").cast("timestamp").cast("long") - F.col("t1").cast(
        "timestamp"
    ).cast("long")
    return p.select(secs.alias("s")).agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("s", F.lit(0.5)), 4).alias("median_secs"),
        F.round(F.percentile("s", F.lit(0.9)), 4).alias("p90_secs"),
    )


SQL_EVENTS_TIME_TO_CONVERT = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3, min(v.t1) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t1 GROUP BY e.user_id),
-- floor, not CAST: DuckDB CAST(double AS BIGINT) rounds to nearest,
-- Spark's timestamp->long truncates — sub-second parts would skew by 1s
s AS (SELECT CAST(floor(epoch(t3)) AS BIGINT)
             - CAST(floor(epoch(t1)) AS BIGINT) AS s FROM p)
SELECT count(*) AS n_converted,
       round(quantile_cont(s, 0.5), 4) AS median_secs,
       round(quantile_cont(s, 0.9), 4) AS p90_secs
FROM s
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events props column: distribution of the
    embedded "k" field per event type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_JSON = """
SELECT event_type, count(*) AS n_events,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution: every click joined to the latest view
    at-or-before it for the same user (union + ONE keyed window — one
    shuffle, linear; never the quadratic join-then-argmax). Oracle is
    DuckDB's native ASOF JOIN — an independent implementation of the
    same semantics. gap_us is an exact integer microsecond difference."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, views, "user_id", "ts",
        right_payload=["event_id", "ts", "value"], seq_col="event_id",
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("asof.event_id").alias("view_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof.ts").cast("timestamp"))
        ).alias("gap_us"),
        F.col("asof.value").alias("view_value"),
    ).orderBy("click_id")


SQL_EVENTS_ASOF = """
WITH l AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
r AS (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'view')
SELECT l.click_id, l.user_id, r.event_id AS view_id,
       date_diff('microsecond', r.ts, l.ts) AS gap_us,
       r.value AS view_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY click_id
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity date;
    cell (cohort_date, day_offset) counts distinct cohort members active
    exactly day_offset days later (0..7). Two keyed aggregates + one
    broadcastable first-seen join — the standard product-analytics query
    the events plane was missing."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= _RETENTION_MAX_DAY)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


SQL_EVENTS_RETENTION = f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, min(d) AS cohort_date FROM ev GROUP BY user_id)
SELECT cohort_date,
       date_diff('day', cohort_date, d) AS day_offset,
       count(DISTINCT ev.user_id) AS n_users
FROM ev JOIN first USING (user_id)
WHERE date_diff('day', cohort_date, d) <= {_RETENTION_MAX_DAY}
GROUP BY cohort_date, day_offset ORDER BY cohort_date, day_offset
"""


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly audit: median absolute deviation over
    per-day event counts, a day flagged when |count - median| > 3·MAD —
    the outlier rule that, unlike z-scores, one bad day cannot poison.
    Exact medians (percentile == quantile_cont); two 1-row scalar
    broadcasts, no division (flag compares against 3·MAD directly)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n_events")
    )
    med = daily.agg(F.percentile("n_events", F.lit(0.5)).alias("_med"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("n_events") - F.col("_med"))
    )
    mad = dev.agg(F.percentile("abs_dev", F.lit(0.5)).alias("_mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "d",
            "n_events",
            F.round("abs_dev", 4).alias("abs_dev"),
            (F.col("abs_dev") > F.lit(_MAD_K) * F.col("_mad")).alias("is_anomaly"),
        )
        .orderBy("d")
    )


SQL_EVENTS_ANOMALY_MAD = f"""
WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
               FROM events GROUP BY CAST(ts AS DATE)),
med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM daily),
dev AS (SELECT d, n_events, abs(n_events - med) AS abs_dev
        FROM daily CROSS JOIN med),
mad AS (SELECT quantile_cont(abs_dev, 0.5) AS mad FROM dev)
SELECT d, n_events, round(abs_dev, 4) AS abs_dev,
       abs_dev > {_MAD_K} * mad AS is_anomaly
FROM dev CROSS JOIN mad ORDER BY d
"""


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation (recency / frequency / monetary with
    quartile scores): recency = days from last activity to the corpus
    horizon, quartiles via ntile(4) with deterministic user_id
    tie-breaks — identical window semantics on both engines. The
    product-analytics twin of the ppx-partition ntile pattern."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    horizon = ev.agg(F.max("d").alias("_hz"))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.max("d").alias("_last"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff(F.col("_hz"), F.col("_last")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    return (
        per.withColumn("r_q", F.ntile(4).over(r_w))
        .withColumn("f_q", F.ntile(4).over(f_w))
        .withColumn("m_q", F.ntile(4).over(m_w))
        .orderBy("user_id")
    )


SQL_EVENTS_RFM = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
hz AS (SELECT max(d) AS hz FROM ev),
per AS (SELECT user_id,
               date_diff('day', max(d), hz) AS recency_days,
               count(*) AS frequency,
               round(sum(value), 2) AS monetary
        FROM ev CROSS JOIN hz GROUP BY user_id, hz)
SELECT user_id, recency_days, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS INTEGER) AS r_q,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id ASC) AS INTEGER) AS f_q,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id ASC) AS INTEGER) AS m_q
FROM per ORDER BY user_id
"""


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov over the
    (ts, event_id)-ordered stream): P(next | current) with exact counts —
    the user-journey structure funnels flatten away. One lag window on
    the user partitioning + one pair aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("_t"))
    return (
        pairs.join(tot, "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("_t"), 6).alias("p"),
        )
        .orderBy("prev_type", "event_type")
    )


SQL_EVENTS_MARKOV = """
WITH seq AS (SELECT user_id, event_type,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS prev_type
             FROM events),
pairs AS (SELECT prev_type, event_type, count(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type),
tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS t
        FROM pairs GROUP BY prev_type)
SELECT pairs.prev_type, event_type, n, round(n * 1.0 / t, 6) AS p
FROM pairs JOIN tot ON pairs.prev_type = tot.prev_type
ORDER BY pairs.prev_type, event_type
"""


def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the engagement-
    inequality scalar (0 = uniform, →1 = a few power users do
    everything). Exact rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    counts sorted asc (user_id tie-break); the window input is the
    REDUCED per-user table, never raw events."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    ranked = per.withColumn(
        "i", F.row_number().over(Window.orderBy(F.asc("x"), F.asc("user_id")))
    )
    return ranked.agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("n_events"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini"),
    )


SQL_EVENTS_GINI = """
WITH per AS (SELECT user_id, count(*) AS x FROM events GROUP BY user_id),
ranked AS (SELECT x, row_number() OVER (ORDER BY x ASC, user_id ASC) AS i
           FROM per)
SELECT count(*) AS n_users, CAST(sum(x) AS BIGINT) AS n_events,
       round(2.0 * sum(i * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
"""


def q_events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile: event volume and distinct users
    per hour 0-23 with each hour's share of the day — the load-shape
    audit capacity planning and anomaly baselines start from."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(F.hour("ts").alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = per.agg(F.sum("n_events").alias("_t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "hour",
            "n_events",
            "n_users",
            F.round(F.col("n_events") / F.col("_t"), 6).alias("share"),
        )
        .orderBy("hour")
    )


SQL_EVENTS_HOURLY_PROFILE = """
WITH per AS (SELECT CAST(hour(ts) AS INTEGER) AS hour, count(*) AS n_events,
                    count(DISTINCT user_id) AS n_users
             FROM events GROUP BY hour(ts)),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t FROM per)
SELECT hour, n_events, n_users, round(n_events * 1.0 / t, 6) AS share
FROM per CROSS JOIN tot ORDER BY hour
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch conversion attribution: each user's FIRST event (by
    ts, event_id tie-break) claims all their purchases. One window to
    elect the first touch, one purchase aggregate, one key join — the
    channel-attribution shape marketing pipelines run at full-event
    scale."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("_np"))
    )
    return (
        first.join(purch, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("_np").isNotNull().cast("long")).alias("n_converted"),
            F.coalesce(F.sum("_np"), F.lit(0)).cast("long").alias("n_purchases"),
            F.round(
                F.sum(F.col("_np").isNotNull().cast("double")) / F.count("*"), 6
            ).alias("conv_rate"),
        )
        .orderBy("first_touch")
    )


SQL_EVENTS_ATTRIBUTION = """
WITH f AS (SELECT user_id, event_type AS first_touch FROM (
             SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
             FROM events) WHERE rn = 1),
p AS (SELECT user_id, count(*) AS np FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
SELECT first_touch, count(*) AS n_users,
       CAST(sum(CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted,
       CAST(coalesce(sum(np), 0) AS BIGINT) AS n_purchases,
       round(sum(CASE WHEN np IS NOT NULL THEN 1.0 ELSE 0.0 END) / count(*), 6)
           AS conv_rate
FROM f LEFT JOIN p USING (user_id)
GROUP BY first_touch ORDER BY first_touch
"""


def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window event load: 4-hour windows every hour
    (``F.window(ts, '4 hours', '1 hour')``) with event count, distinct
    users, and value sum — the rate/alerting aggregation the streaming
    plane computes with the same window expression under a watermark
    (streaming/ingest.py). Each event lands in exactly 4 epoch-aligned
    windows; the replication factor is the slide ratio, map-side, before
    one groupBy — no self-join, no range join. The oracle derives the
    same 4 window starts per event arithmetically."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "4 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
            "sum_value",
        )
        .orderBy("window_start")
    )


SQL_EVENTS_SLIDING_WINDOW = """
WITH wnd AS (SELECT ts, user_id, value,
                    date_trunc('hour', ts) - to_hours(k.k) AS window_start
             FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k)
SELECT window_start,
       window_start + INTERVAL 4 HOUR AS window_end,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM wnd GROUP BY window_start ORDER BY window_start
"""


def q_events_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per sliding 4h/1h window: the windowed
    heavy-hitter leaderboard a live dashboard renders. Map-side 4×
    window replication (slide ratio), ONE groupBy on (window, type),
    then a rank window partitioned by window start — no self-join; at
    scale the per-window rank state is bounded by the type cardinality,
    and under streaming the same aggregation runs watermarked with the
    rank applied per emitted batch."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            F.window("ts", "4 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    rn = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n"), F.asc("event_type")
        )
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .orderBy("window_start", "rn")
    )


SQL_EVENTS_WINDOW_TOPK = """
WITH wnd AS (SELECT date_trunc('hour', ts) - to_hours(k.k) AS window_start,
                    event_type
             FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k),
cnt AS (SELECT window_start, event_type, count(*) AS n
        FROM wnd GROUP BY window_start, event_type)
SELECT window_start, event_type, n,
       row_number() OVER (PARTITION BY window_start
                          ORDER BY n DESC, event_type) AS rn
FROM cnt QUALIFY rn <= 3
ORDER BY window_start, rn
"""


# --------------------------------------------------------------------------
# Sliding-window HLL cardinality (session 14)
# --------------------------------------------------------------------------


def q_events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding 4h/1h window estimated with one HLL
    PER WINDOW (operators/sketch.hll_estimate_by keyed by window start):
    the composition a streaming dashboard actually runs — map-side 4×
    window replication, then registers shuffle once on (window, bucket)
    with partial max. Because registers merge by max, per-micro-batch
    register state folds into the same answer (the
    hll_merge_registers contract), which is what makes this the
    watermark-friendly cardinality path; exact countDistinct per window
    and the relative error ride along as the audit."""
    from spacetime_crawler4_spark.operators.sketch import hll_estimate_by

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "4 hours", "1 hour").alias("w"), "user_id"
    ).select(F.col("w.start").alias("window_start"), "user_id")
    est = hll_estimate_by(base, "window_start", "user_id")
    exact = base.groupBy("window_start").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        est.join(exact, "window_start")
        .select(
            "window_start",
            "n_exact",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("window_start")
    )


def _sql_events_sliding_distinct() -> str:
    from spacetime_crawler4_spark.operators.sketch import hll_group_sql

    return f"""
WITH wnd AS (SELECT date_trunc('hour', ts) - to_hours(k.k) AS window_start,
                    user_id
             FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k),
est AS (SELECT * FROM ({hll_group_sql("wnd", "window_start", "user_id")}) hq),
exact AS (SELECT window_start, count(DISTINCT user_id) AS n_exact
          FROM wnd GROUP BY window_start)
SELECT x.window_start, x.n_exact, e.hll_estimate,
       round(CAST(abs(e.hll_estimate - x.n_exact) AS DOUBLE) / x.n_exact, 6)
           AS rel_err
FROM est e JOIN exact x ON x.window_start = e.grp
ORDER BY x.window_start
"""


def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily event volume via a
    RANGE-frame window (range between 6 preceding days and current,
    keyed on the day ordinal) — the frame-spec window class nothing
    else in the registry exercises; gaps in the calendar are handled
    by RANGE semantics (missing days simply contribute nothing), which
    a ROWS frame would silently get wrong."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    keyed = daily.withColumn("day_ord", F.datediff("day", F.lit("1970-01-01")))
    w = Window.orderBy("day_ord").rangeBetween(-6, 0)
    return (
        keyed.select(
            "day",
            "n",
            F.round(F.avg("n").over(w), 4).alias("ma7"),
            F.sum("n").over(w).alias("sum7"),
        )
        .orderBy("day")
    )


SQL_EVENTS_MOVING_AVG = """
WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
               FROM events GROUP BY day),
keyed AS (SELECT day, n, day - DATE '1970-01-01' AS day_ord FROM daily)
SELECT day, n,
       round(avg(n) OVER (ORDER BY day_ord
                          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
           AS ma7,
       sum(n) OVER (ORDER BY day_ord
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum7
FROM keyed ORDER BY day
"""


# --------------------------------------------------------------------------
# Mann-Kendall trend test; Benford first-digit audit (session 14)
# --------------------------------------------------------------------------


def q_events_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test over the daily event-volume
    series — the nonparametric drift detector a pipeline runs on its
    own telemetry before alerting (no normality assumption, robust to
    outliers). S = Σ_{i<j} sign(n_j − n_i) over day pairs is
    integer-exact; Var(S) carries the tie correction
    Σ t(t−1)(2t+5); Z applies the standard ±1 continuity correction.
    The day-pair self-join is over the REDUCED daily series (365 rows
    → trivial), never raw events — at 100 TB the reduction is the only
    wide stage."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_row = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .agg(
            F.coalesce(
                F.sum(F.signum(F.col("b.n") - F.col("a.n")).cast("long")),
                F.lit(0),
            ).alias("s")
        )
    )
    nd = daily.agg(F.count("*").alias("n_days"))
    ties = (
        daily.groupBy("n")
        .agg(F.count("*").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    joined = s_row.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(ties))
    var_s = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "n_days",
        "s",
        F.round(var_s, 4).alias("var_s"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("trend_at_5pct"),
    )


SQL_EVENTS_TREND_MK = """
WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
               FROM events GROUP BY day),
sv AS (SELECT coalesce(sum(CAST(sign(b.n - a.n) AS BIGINT)), 0) AS s
       FROM daily a JOIN daily b ON a.day < b.day),
nd AS (SELECT count(*) AS n_days FROM daily),
tt AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
       FROM (SELECT n, count(*) AS t FROM daily GROUP BY n)),
j AS (SELECT s, n_days, tie_term,
             (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term) / 18.0
                 AS var_s
      FROM sv CROSS JOIN nd CROSS JOIN tt)
SELECT n_days, s, round(var_s, 4) AS var_s,
       round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z,
       abs(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                ELSE 0.0 END) > 1.96 AS trend_at_5pct
FROM j
"""


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product stickiness per month: mean daily active users over the
    month's active days divided by monthly active users (DAU/MAU) —
    the engagement-intensity ratio every growth dashboard tracks. Two
    distinct aggregates and one tiny join; the day-level distinct is
    the only wide stage and shuffles on (month, day)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    dau = (
        base.groupBy("month", "day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .groupBy("month")
        .agg(F.count("*").alias("n_days"), F.avg("dau").alias("avg_dau"))
    )
    mau = base.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month")
        .select(
            "month",
            "n_days",
            F.round("avg_dau", 4).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("month")
    )


SQL_EVENTS_STICKINESS = """
WITH base AS (SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
                     CAST(ts AS DATE) AS day, user_id
              FROM events),
d AS (SELECT month, day, count(DISTINCT user_id) AS dau
      FROM base GROUP BY month, day),
da AS (SELECT month, count(*) AS n_days, avg(dau) AS avg_dau
       FROM d GROUP BY month),
m AS (SELECT month, count(DISTINCT user_id) AS mau FROM base GROUP BY month)
SELECT month, n_days, round(avg_dau, 4) AS avg_dau, mau,
       round(avg_dau / mau, 6) AS stickiness
FROM da JOIN m USING (month)
ORDER BY month
"""
