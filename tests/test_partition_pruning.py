"""Partition-pruning runtime proof: the file-layout half of the Iceberg
scale story (crawl/iceberg.py partition specs; the bucketed-join twin is
tests/test_bucketed_join.py).

At 100 TB the difference between scanning one `source=` directory and
scanning the table is the whole query budget. Two checks here, one
static and one UNFAKEABLE runtime one:

- the executed scan must carry the predicate as a PartitionFilter (it
  prunes at file listing, before any IO), and
- a poison partition — its parquet file replaced by garbage bytes on
  disk — must be invisible to a query whose filter prunes it, while a
  full scan of the same table fails on it. Pruning either happened
  physically or the garbage would have been read.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("pp") / "docs"
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 8).cast("string")).alias("source"),
        (F.col("id") * 37 % 500).alias("n_chars"),
    )
    df.write.partitionBy("source").parquet(str(out))
    return out


def test_partition_filter_reaches_the_scan(spark, part_dir):
    q = spark.read.parquet(str(part_dir)).filter(F.col("source") == "src3")
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src3" in plan
    # and the data predicate is NOT also a pushed data filter — source is
    # a partition column, it must prune at listing, not row-group level
    assert q.count() == 250


def test_poison_partition_proves_physical_pruning(spark, part_dir):
    poison = part_dir / "source=src5"
    originals = sorted(poison.glob("*.parquet"))
    assert originals
    saved = [(p, p.read_bytes()) for p in originals]
    try:
        for p in originals:
            p.write_bytes(b"this is not a parquet file")
        pruned = (
            spark.read.parquet(str(part_dir))
            .filter(F.col("source") == "src2")
            .agg(F.count("*").alias("n"))
        )
        # the pruned query never touches the poisoned directory
        assert pruned.collect()[0]["n"] == 250
        # whereas the unpruned scan must hit the garbage and fail
        with pytest.raises(Exception):
            spark.read.parquet(str(part_dir)).agg(F.sum("n_chars")).collect()
    finally:
        for p, b in saved:
            p.write_bytes(b)


def test_dynamic_partition_pruning_from_dim_filter(spark, part_dir):
    """DPP: when the pruning predicate only exists on the DIM side of a
    join, Spark must derive a runtime subquery that prunes the
    partitioned fact's file listing. The executed fact scan carries a
    dynamicpruning expression on the partition column — at 100 TB this
    is what keeps a dim-filtered star join from scanning the whole
    fact table even though the fact itself has no literal predicate."""
    dim = spark.createDataFrame(
        [("src1", "keep"), ("src6", "keep"), ("src2", "drop")],
        ["source", "verdict"],
    )
    fact = spark.read.parquet(str(part_dir))
    q = (
        fact.join(dim.filter(F.col("verdict") == "keep"), "source")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    rows = {r["source"]: r["n"] for r in q.collect()}
    assert rows == {"src1": 250, "src6": 250}
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_parquet_aggregate_pushdown_answers_from_footers(spark, part_dir):
    """Metadata-only aggregation: under the DSv2 parquet reader with
    aggregate pushdown on, COUNT/MIN/MAX with no data filters are
    answered from parquet footer statistics — the scan node itself
    carries the aggregate (PushedAggregation) and emits one row per
    row-group instead of the data. At 100 TB this turns table-stat
    queries from full scans into a footer walk. Values are checked
    against the default (v1) reader's computed answer."""
    flat = str(part_dir.parent / "flat")
    spark.read.parquet(str(part_dir)).write.mode("overwrite").parquet(flat)

    def stats():
        df = spark.read.parquet(flat)
        return df.agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )

    expected = stats().collect()[0]
    v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        q = stats()
        got = q.collect()[0]
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan and "COUNT(*)" in plan
        assert "MIN(n_chars)" in plan and "MAX(n_chars)" in plan
        assert (got["n"], got["lo"], got["hi"]) == (
            expected["n"], expected["lo"], expected["hi"],
        )
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.set("spark.sql.sources.useV1SourceList", v1)
