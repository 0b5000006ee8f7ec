"""Temporal operators: as-of join (point-in-time lookup).

Spark has no ASOF JOIN; the declarative construction is the classic
union-and-carry: tag both sides, sort by (key, ts, side) and carry the
last RIGHT row forward with a window `last(..., ignorenulls=True)` — one
shuffle on the join key, no range cross-product, no per-row Python.

Scale shape: the shuffle keys on the join key (skew follows key activity,
same as any keyed join — salt hot keys upstream if needed); the window
scan is a single ordered pass per key partition. DuckDB's native
ASOF JOIN is the oracle (queries()[asof_join]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts: str = "ts", right_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """For every left row, attach the most recent right row with
    right.ts <= left.ts for the same key (strictly point-in-time: a right
    row at the same timestamp IS visible). Left rows with no prior right
    row keep nulls.

    Ties inside the right side at the same (key, ts) resolve to the row
    that sorts last by the carried columns (deterministic)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]

    l_tag = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns
                   if c not in (on, ts)]).alias("_lpayload"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_rpayload"),
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns
                           if c not in (on, ts)]).alias("s")
            ).schema["s"].dataType
        ).alias("_lpayload"),
        F.struct(*right_cols).alias("_rpayload"),
    )
    merged = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # same-timestamp right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side", "_rpayload")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        "_asof", F.last("_rpayload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out = carried.select(
        on, ts, "_lpayload", "_asof"
    )
    for c in [f.name for f in out.schema["_lpayload"].dataType.fields]:
        out = out.withColumn(c, F.col(f"_lpayload.{c}"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_asof.{c}"))
    return out.drop("_lpayload", "_asof")
