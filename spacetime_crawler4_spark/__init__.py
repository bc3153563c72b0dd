"""spacetime_crawler4_spark — a PySpark-native web-crawl analytics engine.

A from-scratch re-implementation of the *capabilities* of
vctruong100/spacetime-crawler4 (reference at /root/reference), re-expressed
Spark-first: the reference's thread-and-mutex crawl loop becomes an iterative
batch dataflow over DataFrames (wave-BFS with per-domain politeness budgets),
its in-memory dict state becomes snapshot-committed parquet tables, and its
per-page Python helpers become Arrow-batched pandas UDFs plus JVM-side
column expressions.

Layout:
    functions/   pure-Python + column-expression building blocks
                 (tokenizer, crc64, simhash, exhash, URL canonicalization,
                 HTML text/link extraction) — reference-parity surfaces
    udfs.py      the pandas/Arrow UDF wrappers (parse, tokenize, simhash)
    operators/   relational operators: report aggregates, dedup (exact,
                 simhash-LSH, minhash-LSH, ngram-jaccard), similarity
                 search, text stats, multimodal plumbing
    crawl/       the frontier engine: schema, wave loop, robots/politeness,
                 URL-seen (bloom + anti-join), snapshot checkpoint store
    sources/     fixture corpus generator (synthetic Common-Crawl-style web)
    streaming/   Structured Streaming frontier feed (foreachBatch wave driver)
"""

__version__ = "0.1.0"
