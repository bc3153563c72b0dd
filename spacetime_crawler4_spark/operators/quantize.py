"""Scalar int8 embedding quantization with a measured-fidelity audit.

The standard 4x storage/bandwidth cut before embeddings go to an ANN
index (symmetric per-vector scheme used by faiss's SQ8 / modern vector
DBs): per vector, ``scale = max(|x|)/127``, ``code_i = round(x_i/scale)``
clamped into [-127, 127], dequantized as ``code_i * scale``.

Everything is map-only array math over the embedding row — zero shuffles
at any corpus scale; the 100 TB cost model is "one projection pass, then
you ship int8". The audit query reports, per vector, the reconstruction
MSE and the cosine between the original and dequantized vector — the
number that tells you whether downstream retrieval survives the cut.

Portability contract (shared with operators/similarity.py): rounding is
the explicit ``floor(x/scale + 0.5)`` fold so Spark and the DuckDB oracle
perform bit-identical IEEE double ops regardless of each engine's
round-half convention; reported floats are rounded to 6dp; code sums and
extremes are integers (hash-exact by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.similarity import cosine


def int8_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max(|x|)/127 (double)."""
    return F.array_max(F.transform(vec, F.abs)) / F.lit(127.0)


def int8_codes(vec: Column, scale: Column) -> Column:
    """array<int> codes: floor(x/scale + 0.5) clamped to [-127, 127];
    an all-zero vector (scale 0) codes to all zeros."""
    return F.transform(
        vec,
        lambda x: F.when(scale > 0,
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )


def int8_dequant(codes: Column, scale: Column) -> Column:
    """array<double>: code * scale."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def int8_fidelity(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dim, scale, code_sum, code_min, code_max, mse, cos_fid) —
    the quantize -> dequantize -> compare audit in one map-only pass.
    ``code_sum``/``code_min``/``code_max`` are integer invariants of the
    exact code vector (any rounding or clamp divergence breaks them);
    ``mse`` is the mean squared reconstruction error and ``cos_fid`` the
    original-vs-dequantized cosine, both 6dp."""
    v = F.col(vec_col).cast("array<double>")
    df = df.select(
        F.col(id_col).alias("id"),
        v.alias("_v"),
        int8_scale(v).alias("_scale"),
    ).select(
        "id",
        "_v",
        "_scale",
        int8_codes(F.col("_v"), F.col("_scale")).alias("_codes"),
    ).select(
        "id",
        "_v",
        "_scale",
        "_codes",
        int8_dequant(F.col("_codes"), F.col("_scale")).alias("_deq"),
    )
    sqerr = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_deq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.select(
        "id",
        F.size("_v").alias("dim"),
        F.round("_scale", 6).alias("scale"),
        F.aggregate(
            F.col("_codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_min("_codes").alias("code_min"),
        F.array_max("_codes").alias("code_max"),
        F.round(sqerr / F.size("_v"), 6).alias("mse"),
        F.round(cosine(F.col("_v"), F.col("_deq")), 6).alias("cos_fid"),
    )
