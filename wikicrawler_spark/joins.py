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
    carried = [c + suffix for c in value_cols]
    clash = [c for c in carried if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: left already has column(s) {clash}; pick another suffix"
        )

    # Carry ONE struct per right row (never null, even when every member is
    # null) so last(ignorenulls) picks the whole matched row atomically —
    # a genuinely-NULL right value is carried AS NULL instead of being
    # skipped for an older row's value (DuckDB ASOF semantics), and with
    # multiple value_cols all carried values come from the same right row.
    r_tag = right.select(
        by, on,
        F.struct(*[F.col(c) for c in value_cols]).alias("__payload"),
    ).withColumn("__side", F.lit(0))
    payload_t = r_tag.schema["__payload"].dataType
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__payload", F.lit(None).cast(payload_t))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows (side 0) sort BEFORE left rows at equal ts -> <= semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "__payload", F.last("__payload", ignorenulls=True).over(w)
    )
    for c in value_cols:
        out = out.withColumn(c + suffix, F.col("__payload")[c])
    return out.filter(F.col("__side") == 1).drop("__side", "__payload")
