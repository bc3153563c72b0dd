"""Crawl-state analytics: the reference report (report/report.py:21-98) as
six short DataFrame queries over the final frontier table (SURVEY.md §3.3).

All pure JVM built-ins over the committed state — the natural OLAP slice:
A2 global word counts / W1 top-50 (freq desc, word asc tie-break),
A3 longest page, A4 subdomain counts, A5 finish-code tallies, A6 totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS

# report/report.py:15-19 — valid-word filter; the manual filter list is the
# reference's ad-hoc noise list, kept configurable here
DEFAULT_MANUAL_FILTER: tuple[str, ...] = ()


def top_words(frontier: DataFrame, k: int = 50, manual_filter=DEFAULT_MANUAL_FILTER) -> DataFrame:
    """A2+W1 (report.py:56-59,76-78; helpers/common_words.py:4-29)."""
    words = frontier.select(F.explode("words").alias("word", "cnt"))
    cond = (F.length("word") >= 3) & F.col("word").rlike(r"\p{L}")
    if manual_filter:
        cond = cond & ~F.col("word").isin(*manual_filter)
    return (
        words.filter(cond)
        .groupBy("word")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.asc("word"))
        .limit(k)
    )


def longest_page(frontier: DataFrame) -> DataFrame:
    """A3 (report.py:48-54): argmax page by valid-word total."""
    totals = (
        frontier.select(
            "url",
            F.aggregate(
                F.map_values("words"), F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("total_words"),
        )
    )
    return totals.orderBy(F.desc("total_words"), F.asc("url")).limit(1)


def subdomain_counts(frontier: DataFrame, suffix: str) -> DataFrame:
    """A4 (report.py:35-41,83-85): URL counts per hostname under suffix."""
    host = F.parse_url("url", F.lit("HOST"))
    return (
        frontier.select(host.alias("hostname"))
        .filter(F.col("hostname").endswith(suffix))
        .groupBy("hostname")
        .count()
        .orderBy("hostname")
    )


def finish_tallies(frontier: DataFrame) -> DataFrame:
    """A5 (report.py:43-67): finish-code histogram."""
    return frontier.groupBy("status", "finish").count().orderBy("status", "finish")


def totals(frontier: DataFrame) -> DataFrame:
    """A6 + headline numbers (report.py:26,70; REPORT.txt:1-2,198-200)."""
    return frontier.agg(
        F.count("*").alias("unique_urls"),
        F.sum((F.col("status") == STATUS.IS_DOWN).cast("long")).alias("downloads"),
        F.sum(
            F.col("finish").isin(FINISH.BAD, FINISH.NOT_ALLOWED, FINISH.CACHE_ERROR).cast("long")
        ).alias("errors"),
        F.sum((F.col("finish") == FINISH.TOO_SIMILAR).cast("long")).alias("too_similar"),
        F.sum((F.col("finish") == FINISH.TOO_EXACT).cast("long")).alias("too_exact"),
    )
