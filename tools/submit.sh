#!/usr/bin/env bash
# Package the engine as a --py-files zip and spark-submit the crawl —
# the north-rule submission shape, runnable unchanged against a real
# cluster master. Usage:
#   tools/submit.sh [--master local[8]] --pages P --robots R --seeds S [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP="${SPARK_GRAFT_PYFILES_ZIP:-/tmp/stc4_pyfiles.zip}"
rm -f "$ZIP"
# -x: no caches; the zip is the exact import surface executors see
zip -qr "$ZIP" spacetime_crawler4_spark -x '*__pycache__*' -x '*.pyc'
MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"
  shift 2
fi
exec spark-submit --master "$MASTER" --py-files "$ZIP" tools/submit_crawl.py "$@"
