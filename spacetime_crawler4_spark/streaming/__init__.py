"""Structured Streaming surface.

The reference is a pull-loop batch system with threads — it has NO
streaming semantics (SURVEY.md §2.9). This package provides the natural
streaming extensions a production crawl/training-data pipeline adds on
top of the same engine:

- streaming text plane: the fused parse/tokenize/simhash UDF applied to a
  stream of fetched pages (stateless, executor-parallel)
- watermarked event-time aggregation over crawl/fetch metrics
- incremental crawling: new seed batches drive frontier waves via
  ``foreachBatch`` — all durable state stays in the snapshot store
  (Iceberg tables in production), so no Spark state-store/watermark
  machinery is needed (SURVEY.md §2.9 last paragraph)
"""

from spacetime_crawler4_spark.streaming.ingest import (  # noqa: F401
    stream_pages,
    streaming_text_plane,
    windowed_event_counts,
)
