"""As-of (most-recent-prior) join — the standard event-enrichment shape.

"For each left event, attach the right event with the greatest timestamp
<= the left timestamp sharing the key" — e.g. each click annotated with
the view that preceded it. Spark has no ASOF join operator; the naive
range join explodes to |L|x|R| per key before picking the max. This
implementation is the UNION + RUNNING-LAST formulation:

  1. tag both sides, union on (key, ts);
  2. one hash shuffle on the key; within each key-partition, sort by
     (ts, side) — right rows sort BEFORE left rows at equal ts, giving
     `<=` (inclusive) semantics;
  3. a running `last(..., ignorenulls)` window carries the latest right
     row's payload forward onto every subsequent left row;
  4. keep the left rows.

Cost: ONE shuffle + one sort — identical to a regular sort-merge join —
regardless of how many right rows precede each left row. Left rows with
no prior right match keep NULLs (ASOF LEFT semantics, matching DuckDB's
`ASOF LEFT JOIN` which the driver oracle uses). Deterministic except when
the right side holds exact-duplicate (key, ts) pairs, where either payload
may win (same caveat as any ASOF engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + ``{ts}{suffix}`` / ``{col}{suffix}`` columns from the
    most recent right row at-or-before each left row's ``ts``.

    A NULL in a right payload column is carried over by the next older
    non-null (ignorenulls semantics) — supply already-clean payloads."""
    r = right.select(
        F.col(key),
        F.col(ts),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    l_tagged = left.withColumn("__side", F.lit(1))
    u = l_tagged.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        f"{ts}{suffix}",
        F.last(F.when(F.col("__side") == 0, F.col(ts)), ignorenulls=True).over(w),
    )
    for c in value_cols:
        u = u.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return u.filter(F.col("__side") == 1).drop(
        "__side", *[f"__r_{c}" for c in value_cols]
    )
