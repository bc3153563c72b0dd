"""Anchor-text link graph — the classic web-scale anchor aggregation.

The reference crawler collects outlinks but discards the anchor text
(scraper.py:10-36 ``extract_next_links`` returns bare URLs), so this plane
is an additive web-scale extension on top of the shared extractor
(functions/htmltext.py): the search-engine anchor index. Three operators:

- ``anchor_edges``      — pages(url, html) → one row per <a href>:
                          (src_url, src_domain, pos, dst_url, dst_domain,
                          anchor_text). Arrow-batched ``mapInPandas`` (the
                          parse is inherently per-document Python; batches
                          cross the boundary as Arrow columns) with the dst
                          normalized exactly like the crawl frontier's links
                          (normalize ∘ defrag ∘ urljoin), so edges join
                          against frontier urlhash/url keys directly.
- ``anchor_summary``    — per dst_url: in-degree, distinct referring pages /
                          hosts, and the modal anchor text (count desc, text
                          asc tie-break). Two keyed aggregations on dst —
                          shuffles on the key it must shuffle on, no
                          collect, no window over the full edge set.
- ``domain_graph``      — host-level projection: per (src_domain,
                          dst_domain) edge count + distinct targets. This is
                          the shape PageRank/HITS consume (operators/graph).
- ``anchor_term_index`` — (dst_url, term) anchor-term frequencies using the
                          engine-wide ``sql_tokens`` tokenizer — the
                          anchor-text ranking signal (BM25-style fields).

Scale: every aggregation keys on dst (or the domain pair) — at a 10^10-URL
frontier these are plain hash-partitioned shuffles with map-side partial
aggregation; the modal-anchor election is a two-stage count→max per key, not
a global sort. No driver materialization anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from spacetime_crawler4_spark.operators.dedup import sql_tokens

EDGE_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("src_domain", StringType()),
        StructField("pos", IntegerType()),
        StructField("dst_url", StringType()),
        StructField("dst_domain", StringType()),
        StructField("anchor_text", StringType()),
    ]
)


def anchor_edges(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) pages → anchor-text edges, one row per <a href> in
    document order (``pos``). dst normalization matches the frontier's link
    normalization byte-for-byte (functions/htmltext.extract_page)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside the worker function: the UDF ships self-contained
        from spacetime_crawler4_spark.crawl.schema import domain_of
        from spacetime_crawler4_spark.functions.htmltext import extract_page

        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in EDGE_SCHEMA.fields}
            for u, h in zip(pdf[url_col], pdf[html_col]):
                ex = extract_page(u, h or b"")
                if not ex.anchors:
                    continue
                sdom = domain_of(u)
                for pos, (dst, text) in enumerate(ex.anchors):
                    out["src_url"].append(u)
                    out["src_domain"].append(sdom)
                    out["pos"].append(pos)
                    out["dst_url"].append(dst)
                    out["dst_domain"].append(domain_of(dst))
                    out["anchor_text"].append(text)
            yield pd.DataFrame(out)

    return pages.select(url_col, html_col).mapInPandas(_extract, EDGE_SCHEMA)


def anchor_summary(edges: DataFrame) -> DataFrame:
    """Per target URL: in-degree, distinct referring pages and hosts, and
    the modal anchor text (most frequent; ties broken by text asc).

    Election = groupBy(dst, text) count, then a min_by over a (count desc,
    text asc)-ordered struct per dst — two map-side-combinable aggregations,
    never a global window."""
    per_text = edges.groupBy("dst_url", "anchor_text").agg(
        F.count("*").alias("n_text")
    )
    # min of (-n_text, text) == (count desc, text asc) winner
    top = per_text.groupBy("dst_url").agg(
        F.min(F.struct((-F.col("n_text")).alias("neg"), "anchor_text")).alias("w")
    )
    base = edges.groupBy("dst_url").agg(
        F.count("*").alias("in_degree"),
        F.countDistinct("src_url").alias("n_src_pages"),
        F.countDistinct("src_domain").alias("n_src_hosts"),
    )
    return base.join(top, "dst_url").select(
        "dst_url",
        "in_degree",
        "n_src_pages",
        "n_src_hosts",
        F.col("w.anchor_text").alias("top_anchor"),
    )


def domain_graph(edges: DataFrame) -> DataFrame:
    """Host-level link graph: per (src_domain, dst_domain) edge count and
    distinct target pages — the input shape for host PageRank/HITS."""
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("dst_url").alias("n_targets"),
    )


def anchor_term_index(edges: DataFrame, min_len: int = 1) -> DataFrame:
    """(dst_url, term) anchor-term frequencies with referring-host support —
    the anchor-text field of a BM25-style ranker. Tokenizer = the shared
    ``sql_tokens`` (identical expression in the DuckDB oracles)."""
    return (
        edges.select(
            "dst_url",
            "src_domain",
            F.explode(sql_tokens(F.col("anchor_text"))).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .groupBy("dst_url", "term")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("src_domain").alias("n_hosts"),
        )
    )


def nav_line_share(pages: DataFrame, edges: DataFrame) -> DataFrame:
    """Link-density content/chrome split per page (the CETR / boilerplate-
    detection signal, Weninger et al. 2010): a text line is NAV CHROME when
    its trimmed form equals the trimmed visible text of an <a> on the SAME
    page — the extractor serializes each anchor's visible text as its own
    fragment/line, so the equality join recovers exactly the link-density
    classification without re-parsing HTML.

    ``pages`` = (url, text) with newline-joined fragments; ``edges`` =
    anchor_edges output (src_url, anchor_text). Returns per page:
    (url, n_lines, n_nav_lines, nav_char_share, content_chars) over
    non-blank lines, nav_char_share rounded 6dp.

    Scale shape: both sides pre-reduce before the join — lines aggregate
    per (url, key) with counts/chars, anchors distinct per (url, key) — so
    the join is keyed, skew-free (one row per page-key on each side), and
    linear; one final per-url aggregate.
    """
    occ = (
        pages.select(
            F.col("url"),
            F.explode(F.split(F.col("text"), "\n")).alias("line"),
        )
        .filter(F.trim("line") != "")
        .groupBy("url", F.trim(F.col("line")).alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length(F.col("line"))).alias("chars"),
        )
    )
    nav_keys = (
        edges.filter(F.trim("anchor_text") != "")
        .select(
            F.col("src_url").alias("url"),
            F.trim(F.col("anchor_text")).alias("key"),
        )
        .distinct()
        .withColumn("is_nav", F.lit(True))
    )
    return (
        occ.join(nav_keys, ["url", "key"], "left")
        .groupBy("url")
        .agg(
            F.sum("n").alias("n_lines"),
            F.sum(F.when(F.col("is_nav"), F.col("n")).otherwise(F.lit(0))).alias(
                "n_nav_lines"
            ),
            F.round(
                F.sum(F.when(F.col("is_nav"), F.col("chars")).otherwise(F.lit(0)))
                / F.sum("chars"),
                6,
            ).alias("nav_char_share"),
            F.sum(
                F.when(F.col("is_nav"), F.lit(0)).otherwise(F.col("chars"))
            ).alias("content_chars"),
        )
    )


def anchor_concentration(edges: DataFrame, min_inlinks: int = 2) -> DataFrame:
    """Per-target anchor-text concentration — the link-farm signature of
    many inlinks carrying the SAME anchor string (organic links vary
    their wording; SEO-planted links repeat the money phrase; see
    Benczur et al., SpamRank, AIRWeb 2005 for anchor-distribution spam
    signals).

    One row per ``dst_url`` with at least ``min_inlinks`` inlinks:
    (dst_url, n_inlinks, n_anchors, anchor_entropy, top_share).
    Entropy is Shannon over the anchor-count distribution computed with
    the single-pass identity H = ln(n) - sum(c*ln(c))/n, so the whole
    operator is TWO keyed hash-aggregates on dst — (dst, anchor) counts,
    then the per-dst fold — with map-side partial aggregation and no
    window or self-join anywhere. At 10^10 edges both shuffles key on
    the column they must key on.
    """
    g = (
        edges.select("dst_url", F.trim(F.col("anchor_text")).alias("a"))
        .groupBy("dst_url", "a")
        .agg(F.count("*").alias("c"))
    )
    return (
        g.groupBy("dst_url")
        .agg(
            F.sum("c").alias("n_inlinks"),
            F.count("*").alias("n_anchors"),
            (
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
                / F.sum("c")
            ).alias("anchor_entropy"),
            (F.max("c") / F.sum("c")).alias("top_share"),
        )
        .filter(F.col("n_inlinks") >= min_inlinks)
    )


def cocitation_pairs(
    edges: DataFrame, max_out: int = 50, min_common: int = 2
) -> DataFrame:
    """Co-citation related-page pairs (Small 1973; the classic
    "related pages" primitive): targets linked by the same source are
    related, scored by how many sources they share.

    Returns (url_a, url_b, n_common) with url_a < url_b and
    ``n_common >= min_common``.

    Scale shape: a source with out-degree f contributes f*(f-1)/2
    pairs, so the self-join is quadratic in the WORST source, not the
    corpus — ``max_out`` drops hub/chrome sources (sitemaps, nav pages)
    before the join, the same df-cap discipline as the shingle dedup
    plane. What remains is one equi-join on src over deduped edges plus
    one hash-aggregate on the pair key.
    """
    e = edges.select("src_url", "dst_url").distinct()
    deg = e.groupBy("src_url").agg(F.count("*").alias("_od"))
    kept = e.join(
        deg.filter(F.col("_od") <= max_out).select("src_url"), "src_url"
    )
    a = kept.select("src_url", F.col("dst_url").alias("url_a"))
    b = kept.select("src_url", F.col("dst_url").alias("url_b"))
    return (
        a.join(b, "src_url")
        .filter(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-source-host link reciprocity — the link-exchange spam metric
    (Gyongyi & Garcia-Molina, "Web spam taxonomy", AIRWeb 2005: mutual
    link schemes): the share of a host's outgoing page-level edges whose
    exact reverse edge also exists.

    Returns (src_domain, n_edges, n_recip, recip_share).

    Scale shape: edges deduped once, then ONE self equi-join on the full
    (src,dst) pair key — an equality join on a high-cardinality composite
    key, no fan-out (each edge matches at most its unique reverse) — and
    one groupBy(src_domain). Nothing quadratic anywhere.
    """
    e = edges.select("src_url", "dst_url", "src_domain").distinct()
    rev = (
        edges.select(
            F.col("dst_url").alias("src_url"),
            F.col("src_url").alias("dst_url"),
        )
        .distinct()
        .withColumn("recip", F.lit(True))
    )
    return (
        e.join(rev, ["src_url", "dst_url"], "left")
        .groupBy("src_domain")
        .agg(
            F.count("*").alias("n_edges"),
            # sum skips nulls: an all-unreciprocated host would yield NULL
            F.coalesce(F.sum(F.col("recip").cast("long")), F.lit(0)).alias(
                "n_recip"
            ),
            F.round(
                F.coalesce(F.sum(F.col("recip").cast("long")), F.lit(0))
                / F.count("*"),
                6,
            ).alias("recip_share"),
        )
    )
