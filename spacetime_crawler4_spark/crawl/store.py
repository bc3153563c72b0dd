"""Snapshot state store: Iceberg-commit semantics on plain parquet.

No Iceberg runtime ships in this sandbox, so durability is a directory of
immutable snapshot folders plus an atomically-renamed ``manifest.json``
naming the current one — the same commit discipline as an Iceberg snapshot
(write-new-files, swap-pointer; reference analogue: the Nap tmp+rename save,
crawler2/nap.py:285-288). On a real cluster every ``commit`` maps 1:1 to a
``MERGE INTO frontier`` + ``INSERT`` transaction on Iceberg tables; the
engine's read/update pattern (latest snapshot in, per-wave delta out) is
exactly the copy-on-write path, with merge-on-read + periodic compaction as
the documented optimization at 10^10-row frontiers.

A killed crawl resumes from the last committed wave: snapshots are only
ever written between waves, so the loaded frontier is clean (any IN_USE
rows are demoted to NO_DOWN for safety, mirroring frontier.py:212-242).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "domains", "exact_buckets", "sim_index")


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def latest_wave(self) -> int | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)["wave"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None

    def commit(
        self,
        wave: int,
        tables: dict[str, DataFrame],
        metrics: list[dict],
    ) -> None:
        snap = os.path.join(self.root, f"snap-{wave:05d}")
        tmp = snap + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        for name in TABLES:
            tables[name].write.mode("overwrite").parquet(os.path.join(tmp, name))
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        # per-partition lineage from the parquet footers (no Spark job):
        # which files exist, how many rows each contributed at this commit
        import glob

        import pyarrow.parquet as papq

        lineage: dict[str, list[dict]] = {}
        for name in TABLES:
            lineage[name] = [
                {
                    "file": os.path.basename(p),
                    "rows": papq.read_metadata(p).num_rows,
                }
                for p in sorted(glob.glob(os.path.join(tmp, name, "*.parquet")))
            ]
        with open(os.path.join(tmp, "lineage.json"), "w") as f:
            json.dump({"wave": wave, "tables": lineage}, f)
        if os.path.exists(snap):
            shutil.rmtree(snap)
        os.replace(tmp, snap)
        mtmp = self._manifest_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"wave": wave, "snapshot": f"snap-{wave:05d}"}, f)
        os.replace(mtmp, self._manifest_path)  # the atomic commit point

    def load_latest(self, spark: SparkSession) -> tuple[int, dict[str, DataFrame], list[dict]] | None:
        wave = self.latest_wave()
        if wave is None:
            return None
        snap = os.path.join(self.root, f"snap-{wave:05d}")
        tables = {
            name: spark.read.parquet(os.path.join(snap, name)) for name in TABLES
        }
        with open(os.path.join(snap, "metrics.json")) as f:
            metrics = json.load(f)
        return wave, tables, metrics
