"""int8 quantization: reconstruction bound, edge cases, map-only plan."""

from pyspark.sql import functions as F

from spacetime_crawler4_spark.operators.quantize import (
    int8_codes,
    int8_dequant,
    int8_fidelity,
    int8_scale,
)


def test_int8_roundtrip_error_bounded(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = int8_fidelity(emb, "vec_id", "embedding").collect()
    assert len(rows) == emb.count()
    for r in rows:
        # symmetric scheme: per-dim error <= scale/2, so
        # mse <= (scale/2)^2; cosine fidelity essentially 1 at 8 bits
        assert r.mse <= (r.scale / 2) ** 2 + 1e-9, r
        assert r.cos_fid > 0.999, r
        assert -127 <= r.code_min <= r.code_max <= 127
        # max(|x|) quantizes to exactly +/-127 -> an extreme is hit
        assert r.code_max == 127 or r.code_min == -127


def test_int8_zero_vector_and_exact_values(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -0.5, 0.25, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        "vec_id",
        int8_codes(F.col("embedding"), int8_scale(F.col("embedding"))).alias("c"),
        int8_dequant(
            int8_codes(F.col("embedding"), int8_scale(F.col("embedding"))),
            int8_scale(F.col("embedding")),
        ).alias("d"),
    ).collect()
    rows = {r.vec_id: r for r in out}
    assert rows[1].c == [0, 0, 0]
    # scale = 1/127: codes are x*127 rounded
    assert rows[2].c == [127, -63, 32, 0]
    assert abs(rows[2].d[0] - 1.0) < 1e-12


def test_int8_fidelity_is_map_only(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    plan = (
        int8_fidelity(emb, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
