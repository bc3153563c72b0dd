#!/usr/bin/env python
"""Materialize the deterministic synthetic web corpus.

Usage: python tools/gen_fixture.py [--out .fixtures] [--scale 1]
Writes pages.parquet / robots.parquet / seeds.parquet.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spacetime_crawler4_spark.sources.fixture import write_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".fixtures")
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()
    counts = write_corpus(args.out, scale=args.scale)
    print(json.dumps({"out": args.out, **counts}))


if __name__ == "__main__":
    main()
