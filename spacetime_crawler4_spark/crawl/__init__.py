"""PySpark-native crawl engine: partitioned URL frontier + fetch scheduler.

The wave loop re-expresses the reference's FIFO worker pipeline
(reference crawler2/worker.py:27-121) as iterative batch dataflow over a
frontier table (SURVEY.md §1.3, §3.1): every wave is one declarative
DataFrame plan — sift → robots gate → fetch join → pre-filters → exact/near
dedup → parse/tokenize UDFs → link expansion → seen-set anti-join — and one
atomic snapshot commit.
"""

from spacetime_crawler4_spark.crawl.schema import (  # noqa: F401
    FINISH,
    STATUS,
    CrawlConfig,
)
from spacetime_crawler4_spark.crawl.engine import CrawlEngine  # noqa: F401
from spacetime_crawler4_spark.crawl.seqoracle import SeqCrawler  # noqa: F401
