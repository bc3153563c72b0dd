"""As-of (point-in-time) join — the event-time operator Spark lacks.

``asof_join(left, right, ...)`` attaches, to every left row, the latest
right row with ``right.ts <= left.ts`` within the same key — the join
every attribution / feature-backfill / slowly-changing-dimension pipeline
needs (DuckDB/kdb ``ASOF JOIN``, pandas ``merge_asof``).

Formulation (the scale-defining choice): **union + one window**, not a
join. The two sides are tagged and unioned, then one window
``partitionBy(key).orderBy(ts, side)`` takes ``last(right_payload,
ignorenulls)`` over rows-unbounded-preceding — right rows at equal ts
sort before left rows, giving the standard inclusive (``<=``) as-of
semantics. Cost: ONE shuffle keyed on the join key + one sort — the
same price as any per-key aggregate, linear in |left| + |right|. The
tempting ``join ON l.key = r.key AND r.ts <= l.ts`` + argmax explodes to
O(|matches|) intermediate rows (every earlier right row per left row)
before the window prunes — quadratic per key on long histories.

Determinism: ties inside one side are broken by ``seq_col`` in the sort,
so the result is a pure function of the input (the oracle uses DuckDB's
native ASOF JOIN, which this reproduces whenever (key, ts) is unique
per side — asserted on the test data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_payload: list[str],
    seq_col: str | None = None,
    out_col: str = "asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + struct ``out_col`` (default
    ``asof``) holding the payload columns of the latest ``right`` row
    at-or-before its ts (NULL when no prior right row exists for the key).

    ``right_payload`` — right columns to carry; ``seq_col`` — optional
    within-side tiebreak column included in the sort for full
    determinism when (key, ts) can repeat.

    Raises ``ValueError`` when ``out_col`` or one of the internal
    temporaries collides with a left column name — a silent duplicate
    column would only blow up at the NEXT select-by-name.
    """
    lcols = left.columns
    reserved = {"_k", "_ts", "_side", "_seq", "_rp"} | {out_col}
    clash = sorted(reserved & set(lcols))
    if clash:
        raise ValueError(
            f"asof_join: left columns {clash} collide with the output "
            f"column or internal temporaries; rename them or pass a "
            f"different out_col"
        )
    payload = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        *([F.col(seq_col).alias("_seq")] if seq_col else [F.lit(0).alias("_seq")]),
        payload.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        *([F.col(seq_col).alias("_seq")] if seq_col else [F.lit(0).alias("_seq")]),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionByName(l)
        .withColumn(out_col, F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*[F.col(f"_l_{c}").alias(c) for c in lcols], out_col)
    )
