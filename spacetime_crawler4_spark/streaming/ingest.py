"""Streaming ingestion + event-time aggregation.

All transformations here are expressed so Structured Streaming's
incremental planner can run them: stateless projections for the text
plane, watermark + windowed aggregation for metrics, ``foreachBatch``
where the batch engine (with its snapshot-store state) is the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spacetime_crawler4_spark.operators.textplane import crawl_features_udf

PAGES_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("redirect_to", StringType()),
        StructField("retry_after", IntegerType()),
    ]
)


def stream_pages(spark: SparkSession, drops_dir: str) -> DataFrame:
    """File-source stream over a directory receiving pages-parquet drops
    (the streaming analogue of the fetch join's right side)."""
    return (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drops_dir)
    )


def streaming_text_plane(pages_stream: DataFrame) -> DataFrame:
    """Fused parse/tokenize/simhash over a page stream — stateless, so it
    runs unchanged under the incremental planner; per-batch parallelism is
    the file-split parallelism of the trigger."""
    feat = crawl_features_udf(F.col("url"), F.col("html"), F.col("content_type"))
    return pages_stream.select(
        "url",
        "warc_ts",
        feat.alias("feat"),
    ).select(
        "url",
        "warc_ts",
        F.col("feat.sitemap").alias("sitemap"),
        F.col("feat.n_total").alias("n_tokens"),
        F.col("feat.n_unique").alias("n_unique"),
        F.col("feat.smhash").alias("smhash"),
        F.size("feat.links").alias("n_links"),
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Event-time windowed counts with late-data handling: the watermark
    bounds state and admits stragglers up to ``watermark`` late — the
    streaming analogue of the per-wave metrics table (SURVEY.md §2.9)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("sitemap").cast("long")).alias("n_sitemaps"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_pages",
            "total_tokens",
            "n_sitemaps",
        )
    )


def incremental_crawl_query(
    spark: SparkSession,
    seeds_stream: DataFrame,
    pages_path: str,
    robots_path: str,
    state_dir: str,
    config=None,
    checkpoint_dir: str | None = None,
):
    """Drive the batch crawl engine from a stream of seed-URL batches.

    Each micro-batch resumes the engine from the snapshot store, appends
    the new seeds to the frontier, and runs waves to quiescence — state
    durability and exactly-once-ness come from the store's atomic commits
    (Iceberg snapshot transactions in production), not from Spark's state
    store. ``seeds_stream`` needs a single ``url: string`` column.
    """
    from spacetime_crawler4_spark.crawl import schema as S
    from spacetime_crawler4_spark.crawl.engine import CrawlEngine
    from spacetime_crawler4_spark.crawl.schema import FINISH, FRONTIER_SCHEMA, STATUS

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        urls = [r["url"] for r in batch_df.select("url").distinct().collect()]
        if not urls:
            return
        eng = CrawlEngine(
            spark, pages_path, robots_path, urls, config, state_dir=state_dir
        )
        eng.init_state(resume=True)
        if eng.store.latest_wave() is not None:
            # dedup within the batch by urlhash (first in sorted order wins)
            # before the frontier anti-join — two seed spellings that
            # collapse to one urlhash must yield one frontier row, matching
            # the reference nap's add-time dedup
            batch_seen: set[str] = set()
            uniq: list[str] = []
            for u in sorted(urls):
                h = S.urlhash(u)
                if h not in batch_seen:
                    batch_seen.add(h)
                    uniq.append(u)
            rows = [
                {
                    "urlhash": S.urlhash(u),
                    "url": u,
                    "parent": None,
                    "status": STATUS.NO_DOWN,
                    "finish": FINISH.OK,
                    "absdepth": 0,
                    "reldepth": 0,
                    "monodepth": 0,
                    "dupdepth": 0,
                    "words": {},
                    "links": [],
                    "exhash": None,
                    "smhash": None,
                    "gen": 0,
                    "seq": f"b{batch_id:07d}.{S.seed_seq(i)}",
                    "domain": S.domain_of(u),
                    "retries": 0,
                }
                for i, u in enumerate(uniq)
            ]
            new_seeds = spark.createDataFrame(rows, FRONTIER_SCHEMA).join(
                eng.frontier.select("urlhash"), "urlhash", "left_anti"
            )
            eng.frontier = eng.frontier.unionByName(new_seeds).localCheckpoint(
                eager=True
            )
        eng.run(resume=False)
        if eng.store is not None:
            eng.store.commit(
                eng.wave_no,
                {
                    "frontier": eng.frontier,
                    "domains": eng.domains,
                    "exact_buckets": eng.exact_buckets,
                    "sim_index": eng.sim_index,
                },
                eng.metrics,
            )

    writer = seeds_stream.writeStream.foreachBatch(handle_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
