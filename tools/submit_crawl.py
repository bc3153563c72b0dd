#!/usr/bin/env python
"""spark-submit driver script for the crawl engine.

The north-rule submission shape: the package ships as a zip via
``--py-files`` (so executors can import it without any install step) and
this thin driver just delegates to the package CLI:

    zip -r /tmp/stc4.zip spacetime_crawler4_spark
    spark-submit --master local[8] --py-files /tmp/stc4.zip \
        tools/submit_crawl.py --pages ... --robots ... --seeds ... [args]

On a real cluster swap ``--master`` for yarn/k8s — the engine is
master-agnostic (crawl/run.py builds the session from --master only).
tools/submit.sh wraps the zip + submit; tests/test_spark_submit.py runs
the whole shape end-to-end in local mode.
"""

import sys

from spacetime_crawler4_spark.crawl.run import main

if __name__ == "__main__":
    main(sys.argv[1:])
