#!/usr/bin/env python
"""Cross-scale oracle-parity sweep: the exact driver-style comparison
(tests/test_oracle_parity.py — row count, column names, order-insensitive
exact values) for EVERY registry + pending query, at an arbitrary SF dir.

The driver and the in-suite gate both run at sf0.01; this tool re-runs the
identical comparison at other scales (sf0.001, sf0.1) to catch
scale-dependent divergence a single-SF gate can miss (df-cap effects,
overflow, rounding drift in bigger aggregates). Fixture-based crawl_*
queries are SF-independent but re-checked anyway — they're cheap.

Usage: python tools/parity_sweep.py [SF_DIR] [--skip name ...] [--only name ...]
Flags and the positional SF_DIR compose in any order. Prints one line per
query and a final JSON summary.
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v + 0.0)
    return v


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", nargs="+", default=[], metavar="NAME")
    ap.add_argument("--only", nargs="+", default=None, metavar="NAME")
    ns = ap.parse_args()
    skip = set(ns.skip)
    only = set(ns.only) if ns.only is not None else None
    sf_dir = ns.sf_dir

    from spacetime_crawler4_spark.queries import (
        SF_PINNED_ORACLES,
        pending_registry,
        registry,
    )
    from spacetime_crawler4_spark.session import get_spark

    if not sf_dir.rstrip("/").endswith("sf0.01"):
        skip |= SF_PINNED_ORACLES  # oracle inlines an sf0.01-frozen artifact

    spark = get_spark("parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    reg = {**registry(), **pending_registry()}
    ok, bad, skipped = [], [], []
    for name, (fn, sql) in reg.items():
        if only is not None and name not in only:
            continue
        if name in skip or sql is None:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            ddf = con.sql(sql)
            dcols, drows = list(ddf.columns), ddf.fetchall()
            match = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _multiset(scols, srows) == _multiset(dcols, drows)
            )
        except Exception as exc:  # pragma: no cover - report, don't die
            print(f"ERR  {name}: {exc}")
            bad.append(name)
            continue
        wall = time.time() - t0
        print(f"{'ok ' if match else 'BAD'} {name} rows={len(srows)} {wall:.1f}s")
        (ok if match else bad).append(name)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_ok": len(ok),
                "n_bad": len(bad),
                "bad": bad,
                "skipped": skipped,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
