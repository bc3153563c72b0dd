"""Pure building blocks shared by the pandas UDFs and the crawl engine.

Everything here is either a plain-Python function (used inside Arrow-batched
pandas UDFs — never as row-at-a-time Spark Python UDFs) or a factory that
returns a JVM-side Column expression.
"""

from spacetime_crawler4_spark.functions.textnorm import (  # noqa: F401
    STOPWORDS_SET,
    is_contraction,
    is_stopword,
)
from spacetime_crawler4_spark.functions.tokenizer import tokenize  # noqa: F401
from spacetime_crawler4_spark.functions.crc import crc32, crc64, crc64_batch  # noqa: F401
from spacetime_crawler4_spark.functions.simhash import (  # noqa: F401
    SIMHASH_BITS,
    SIMHASH_THRESHOLD,
    simhash32,
    simhash32_str,
    hamming32,
)
from spacetime_crawler4_spark.functions.exhash import exhash, exhash_col  # noqa: F401
from spacetime_crawler4_spark.functions.urls import (  # noqa: F401
    get_urlhash,
    normalize_url,
    is_valid_url,
    rel_dirdepth,
)
from spacetime_crawler4_spark.functions.htmltext import (  # noqa: F401
    extract_page,
    extract_sitemap_urls,
)
