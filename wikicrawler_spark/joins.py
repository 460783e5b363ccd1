"""Custom join operators Spark lacks natively (SURVEY.md §2.5 notes the
reference needs none of these; they are engine-breadth additions for the
training-data pipeline, where event/metric alignment needs them).

asof_join — for every left row, the latest right row with
``right.ts <= left.ts`` within the same key. Implemented as the classic
union-and-carry pattern: tag both sides, sort per key by (ts, side) with
right rows first on ties, window-carry the last right payload forward, keep
left rows. ONE shuffle (the per-key window), no Python — compare
``pd.merge_asof``-per-group via applyInPandas, which ships every byte
through Arrow.

Tie semantics: a right row AT the same timestamp matches (<=), mirroring
DuckDB's ASOF JOIN (the oracle) and pandas merge_asof defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """Left as-of join. ``on``: ordering column (same name both sides);
    ``by``: equality key; ``value_cols``: right columns to carry.
    Returns every left row + carried right values (null when no right row
    precedes it)."""
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        by, on,
        *[F.col(c).alias(c + suffix) for c in value_cols],
    ).withColumn("__side", F.lit(0))

    carried = [c + suffix for c in value_cols]
    for c in carried:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(r_tag.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows (side 0) sort BEFORE left rows at equal ts -> <= semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 1).drop("__side")
