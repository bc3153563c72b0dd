"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (reference-parity tokenizer top-50) at sf0.001
queries()    — every implemented operator from SURVEY.md §2 + the
               training-data suite (dedup / similarity / text-stats /
               multimodal), each as (spark, sf_dir) -> DataFrame
oracle_sql() — semantically-identical DuckDB SQL for EVERY query (the
               crc64-simhash plane is SQL-checked too: the word-hash
               dictionary is inlined as a VALUES table and the bit-vote
               sum re-run in SQL — queries._sql_simhash_fp)

Implementations live in spacetime_crawler4_spark.queries (operators in
spacetime_crawler4_spark.operators.*); this module is just the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spacetime_crawler4_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    fn, _ = reg["crawl_top50_parity_tokens"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
