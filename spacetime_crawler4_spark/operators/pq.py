"""Product quantization (PQ) for embedding columns — the compression side
of similarity search at 100 TB: a dim-D float vector becomes m small codes
(one per subspace), and approximate distances are computed against the
codes alone (ADC — asymmetric distance computation), so the big side of a
search carries bytes, not floats. Jegou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — public algorithm.

Spark shape: codebooks are tiny (m × ksub × dsub) and inlined as literal
expressions, so ENCODE is a per-row projection with ZERO shuffle (the same
inline-codebook discipline as operators/similarity.ivf_assign). ADC scoring
broadcasts the query side (each query carrying its m×ksub lookup table as
an array column) and ranks with one window — the only corpus-wide shuffle
is the final per-query top-k.

Float discipline: squared L2 is always the three-dot-product form
``dot(a,a) - 2*dot(a,b) + dot(b,b)`` with sequential folds, matching the
DuckDB oracle's ``list_dot_product`` algebra term for term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spacetime_crawler4_spark.operators.similarity import dot


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance as dot(a,a) - 2·dot(a,b) + dot(b,b)."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _sub(col: Column, s: int, dsub: int) -> Column:
    return F.slice(col, s * dsub + 1, dsub)


def pq_codebooks_from_seeds(seed_vecs, m: int) -> list[list[list[float]]]:
    """Deterministic codebooks without training: sub-slices of ``ksub``
    seed vectors. codebooks[s][j] = seed j's s-th subvector."""
    if not seed_vecs:
        raise ValueError("pq: empty seed set")
    dim = len(seed_vecs[0])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [[float(x) for x in v[s * dsub : (s + 1) * dsub]] for v in seed_vecs]
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): per-subspace nearest-codeword codes.

    Zero shuffle: each subspace's argmin is an ``array_min`` over
    struct(round(sqdist, 6), j) literals evaluated inside the scan's
    projection (ties -> lowest codeword id). The subvector's own norm is
    bound once per subspace via a functional let (transform over a
    1-element array), not recomputed per codeword.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    e = F.col(vec_col)

    def _code(s: int) -> Column:
        sub = _sub(e, s, dsub)

        def _cands(nx: Column) -> Column:
            return F.array(
                *[
                    F.struct(
                        F.round(
                            nx
                            - F.lit(2.0) * dot(sub, _lit_vec(cw))
                            + F.lit(_codeword_norm2(cw)),
                            6,
                        ).alias("d"),
                        F.lit(j).alias("j"),
                    )
                    for j, cw in enumerate(codebooks[s])
                ]
            )

        return F.array_min(
            F.flatten(F.transform(F.array(dot(sub, sub)), lambda nx: _cands(nx)))
        )["j"]

    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.array(*[_code(s) for s in range(m)]).alias("codes"),
    )


def _codeword_norm2(cw) -> float:
    """Codeword self-dot folded sequentially — same order as dot()."""
    acc = 0.0
    for x in cw:
        acc += float(x) * float(x)
    return acc


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adist, rank) — approximate
    squared-L2 ranking where each neighbor contributes only its m codes.

    The query side (tiny) computes its m×ksub distance lookup table as an
    array-of-arrays column and is broadcast; the corpus side carries codes
    only. adist = sum_s lut[s][code_s] via zip_with + a sequential fold.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = pq_encode(emb, codebooks, id_col, vec_col)

    qv = F.col(vec_col)
    lut = F.array(
        *[
            F.array(
                *[
                    F.round(
                        dot(_sub(qv, s, dsub), _sub(qv, s, dsub))
                        - F.lit(2.0) * dot(_sub(qv, s, dsub), _lit_vec(cw))
                        + F.lit(_codeword_norm2(cw)),
                        6,
                    )
                    for cw in codebooks[s]
                ]
            )
            for s in range(m)
        ]
    )
    q = query_ids.join(emb, id_col).select(
        F.col(id_col).alias("query_id"), lut.alias("lut")
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.col("lut"),
                        lambda c, l: F.element_at(l, c + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def l2_brute_topk(
    emb: DataFrame,
    query_ids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k — the recall yardstick for pq_adc_topk,
    computed with the identical three-dot-product algebra."""
    q = query_ids.join(emb, id_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    e = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(sqdist(F.col("qvec"), F.col("nvec")), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )
