"""Spark-side operators: Arrow-batched pandas UDFs + column-expression
compositions built on the pure functions in ``..functions``.

Exactly three pandas UDFs carry Python work at scale (SURVEY.md §2.10):
parse, token-features, simhash — everything else is JVM built-ins.
"""

from spacetime_crawler4_spark.operators.textplane import (  # noqa: F401
    PARSE_SCHEMA,
    TOKEN_SCHEMA,
    parse_page_udf,
    token_features_udf,
    simhash_udf,
    with_text_plane,
)
