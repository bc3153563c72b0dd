"""Partitioned cuckoo filter — the north rule's documented upgrade path
for the URL-seen set ("broadcast bloom-filter (upgradable to cuckoo)").

Why cuckoo over bloom (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014): supports DELETION (a bloom cannot un-see a
URL — frontier compaction/rollback needs it), better space at low target
false-positive rates, and two cache lines per probe.

Scale design — the build is DISTRIBUTED: a cuckoo table cannot be
OR-merged like bloom bitmaps, so the filter is sharded by key:
``build_cuckoo_partitioned`` hash-partitions the keys (pmod nparts) and
builds each shard INSIDE an executor via applyInPandas; only the compact
serialized shards reach the driver (same O(filter bytes) driver footprint
as the JVM bloom sketch). The probe routes each key to its shard with the
same pmod — vectorized numpy over Arrow batches, no false negatives by
construction.

Standard parameters: 4-slot buckets, 16-bit fingerprints (~0.0007 fp rate
at 95% load), partial-key eviction i2 = i1 ^ H(fp).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from spacetime_crawler4_spark.functions.bloom import murmur3_hash_long

SLOTS = 4
MAX_KICKS = 500


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints (0 marks an empty slot)."""
    fp = (murmur3_hash_long(keys, 0x9747B28C) & np.uint32(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _index1(keys: np.ndarray, nbuckets: int) -> np.ndarray:
    return (murmur3_hash_long(keys, 0) % np.uint32(nbuckets)).astype(np.int64)


def _index2(i1: np.ndarray, fp: np.ndarray, nbuckets: int) -> np.ndarray:
    # partial-key cuckoo: i2 = i1 xor H(fp); involutive, so either index
    # recovers the other — deletion/eviction never needs the original key
    h = murmur3_hash_long(fp.astype(np.int64), 0x5BD1E995) % np.uint32(nbuckets)
    return (i1 ^ h.astype(np.int64)) % nbuckets


@dataclass
class CuckooFilter:
    table: np.ndarray  # uint16 [nbuckets, SLOTS]; 0 = empty

    @classmethod
    def with_capacity(cls, n: int, load: float = 0.5) -> CuckooFilter:
        """Size for ``n`` keys at ``load`` design occupancy. Fan et al.
        run b=4 tables to 0.95 load for space-optimality; the default
        here is 0.5 because our tables are BUILD-bound, not space-bound
        (a broadcast seen-filter is KBs either way, and every key whose
        two buckets fill under contention falls off the vectorized bulk
        path into the per-key eviction walk — at 0.76 measured load that
        walk was 85% of the build wall). Pass load=0.95 to trade build
        time back for space."""
        nbuckets = 1
        while nbuckets * SLOTS * load < max(n, 16):
            nbuckets <<= 1
        return cls(np.zeros((nbuckets, SLOTS), dtype=np.uint16))

    @property
    def nbuckets(self) -> int:
        return self.table.shape[0]

    # ------------------------------------------------------------- write
    def _try_put(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert(self, key: int) -> None:
        k = np.array([key], dtype=np.int64)
        fp = int(_fingerprints(k)[0])
        i1 = int(_index1(k, self.nbuckets)[0])
        i2 = int(_index2(np.array([i1]), np.array([fp], dtype=np.uint16), self.nbuckets)[0])
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return
        rng = np.random.default_rng(key & 0xFFFFFFFF)  # deterministic kicks
        b = i1
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(0, SLOTS))
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            b = int(
                _index2(
                    np.array([b]), np.array([fp], dtype=np.uint16), self.nbuckets
                )[0]
            )
            if self._try_put(b, fp):
                return
        raise RuntimeError("cuckoo filter over capacity")

    def _bulk_pass(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized slot placement: write each (bucket, fp) into its
        bucket's next free slot, honoring within-batch contention (two
        keys aiming at one bucket consume two slots). Returns the boolean
        mask of keys that did NOT fit this pass."""
        if len(buckets) == 0:
            return np.zeros(0, dtype=bool)
        fill = (self.table != 0).sum(axis=1).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        # rank of each key within its bucket run (0,1,2,... per bucket)
        starts = np.r_[0, np.nonzero(np.diff(sb))[0] + 1]
        rank = np.arange(len(sb)) - np.repeat(
            starts, np.diff(np.r_[starts, len(sb)])
        )
        slot = fill[sb] + rank
        ok = slot < SLOTS
        self.table[sb[ok], slot[ok]] = fps[order][ok]
        rejected = np.zeros(len(buckets), dtype=bool)
        rejected[order[~ok]] = True
        return rejected

    def insert_many(self, keys: np.ndarray) -> None:
        """Bulk insert, numpy-vectorized: one grouped pass on i1, one on
        i2 for the spill, then the per-key eviction loop ONLY for keys
        whose both buckets are full (rare below the 95% design load).
        The per-key python loop this replaces priced the distributed
        shard build at ~140 µs/key — the whole cuckoo seen-filter crawl
        was build-bound on it (BASELINE.md round-4 notes)."""
        keys = keys.astype(np.int64, copy=False)
        fps = _fingerprints(keys)
        i1s = _index1(keys, self.nbuckets)
        rej1 = self._bulk_pass(i1s, fps)
        if rej1.any():
            i2s = _index2(i1s[rej1], fps[rej1], self.nbuckets)
            rej2 = self._bulk_pass(i2s, fps[rej1])
            if rej2.any():
                for k in keys[rej1][rej2]:
                    self.insert(int(k))  # eviction path

    def delete(self, key: int) -> bool:
        """Remove one copy of the key's fingerprint; True if found —
        the operation a bloom filter cannot provide."""
        k = np.array([key], dtype=np.int64)
        fp = int(_fingerprints(k)[0])
        i1 = int(_index1(k, self.nbuckets)[0])
        i2 = int(_index2(np.array([i1]), np.array([fp], dtype=np.uint16), self.nbuckets)[0])
        for b in (i1, i2):
            hits = np.nonzero(self.table[b] == fp)[0]
            if len(hits):
                self.table[b, hits[0]] = 0
                return True
        return False

    # -------------------------------------------------------------- read
    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        fps = _fingerprints(keys)
        i1 = _index1(keys, self.nbuckets)
        i2 = _index2(i1, fps, self.nbuckets)
        f = fps[:, None]
        return ((self.table[i1] == f) | (self.table[i2] == f)).any(axis=1)

    # --------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> CuckooFilter:
        arr = np.frombuffer(blob, dtype=np.uint16).copy()
        return cls(arr.reshape(len(arr) // SLOTS, SLOTS))


def build_cuckoo_partitioned(
    df: DataFrame, col: str, expected: int, nparts: int = 16
) -> list[bytes]:
    """Distributed sharded build: keys hash-partition by pmod(key, nparts);
    each shard's table is built by an executor (applyInPandas) and only the
    serialized shards are collected. Returns nparts blobs (missing shards
    come back as empty filters)."""
    per = max(expected // nparts, 16)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter.with_capacity(max(len(pdf), per))
        cf.insert_many(pdf["k"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"part": [int(pdf["part"].iloc[0])], "blob": [cf.to_bytes()]})

    rows = (
        df.select(
            F.col(col).alias("k"), F.pmod(F.col(col), F.lit(nparts)).alias("part")
        )
        .groupBy("part")
        .applyInPandas(_build, "part int, blob binary")
        .collect()
    )
    got = {int(r["part"]): bytes(r["blob"]) for r in rows}
    empty = CuckooFilter.with_capacity(16).to_bytes()
    return [got.get(i, empty) for i in range(nparts)]


def cuckoo_might_contain_udf(shards: list[bytes]):
    """Arrow-batched probe over a LongType column, routing each key to its
    pmod shard. No false negatives by construction."""
    nparts = len(shards)

    @pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        filters = [CuckooFilter.from_bytes(b) for b in shards]
        vals = keys.to_numpy(dtype=np.int64, na_value=0)
        part = np.mod(np.mod(vals, nparts) + nparts, nparts)  # pmod semantics
        out = np.zeros(len(vals), dtype=bool)
        for p in range(nparts):
            m = part == p
            if m.any():
                out[m] = filters[p].might_contain(vals[m])
        return pd.Series(out)

    return probe
