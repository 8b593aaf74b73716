"""As-of join — match each left row to the latest right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB does). The scalable composition used
here is the **union + running-last trick**:

1. Tag right rows 0 and left rows 1, union them on (key, time).
2. Sort within each key partition by (time, tag, right-id) — a window, not
   a global sort.
3. ``last(right_value, ignoreNulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` gives, at every left
   row, the most recent right row with ``right.time <= left.time``
   (inclusive, because tag 0 sorts before tag 1 at equal times).
4. Keep only left rows.

Scale notes (100 TB): this is ONE shuffle on the join key (same cost as any
hash join on the key) and a linear window pass — no range-explosion, no
skew beyond what the key itself has. The alternative (theta-join +
row_number) materializes every candidate pair and is quadratic per key;
avoid it. If the right side is tiny, broadcast it and use a
``max_by``-style aggregation instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: for each left row, latest right row per ``on`` key
    with ``right_time <= left_time``. Right columns come back as
    ``{prefix}{col}``; unmatched left rows keep them NULL.
    """
    lhs = left.withColumn("__tag", F.lit(1)).withColumn(
        "__t", F.col(left_time)
    )
    rhs_cols: list[Column] = [
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
    ]
    # Equality-join semantics for NULL keys: a NULL never equals a NULL,
    # so null-key right rows can match nothing — drop them BEFORE the
    # union (partitionBy would otherwise group both sides' NULL keys into
    # one partition and fill null-key left rows from null-key right rows,
    # diverging from ASOF JOIN). Null-key LEFT rows stay and come out
    # with NULL matches, like any unmatched left row.
    rhs = right.filter(F.col(on).isNotNull()).select(
        *rhs_cols, *[F.col(c).alias(f"__r_{c}") for c in right_cols]
    )

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # Deterministic intra-key order: time, then right-before-left at equal
    # times (inclusive as-of), then right id columns as final tiebreak.
    order = [F.col("__t"), F.col("__tag")] + [
        F.col(f"__r_{c}") for c in right_cols
    ]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Pack ALL right columns into one struct and take last() of that ONCE:
    # per-column last(ignorenulls) would backfill a NULL field of the
    # latest right row from an OLDER right row — and could stitch together
    # fields of different right rows. The struct is non-null per right row
    # (left rows contribute NULL structs), so last(struct) returns the
    # whole latest right row with its NULL fields intact — true as-of
    # semantics, matching DuckDB's ASOF JOIN.
    packed = unioned.withColumn(
        "__r_struct",
        F.when(
            F.col("__tag") == 0,
            F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]),
        ),
    )
    out = packed.withColumn(
        "__r_last", F.last("__r_struct", ignorenulls=True).over(w)
    )
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__r_last.{c}"))
    keep = [c for c in left.columns] + [f"{prefix}{c}" for c in right_cols]
    return out.filter(F.col("__tag") == 1).select(*keep)
