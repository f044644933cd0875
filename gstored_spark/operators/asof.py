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

    The matched right row travels as ONE struct through a single
    running-last window, so the attached ts and every payload column come
    from the SAME right row — a NULL payload in the matched row stays
    NULL instead of being silently back-filled from an older row."""
    r = right.select(
        F.col(key),
        F.col(ts),
        F.struct(F.col(ts).alias("__ts"), *[F.col(c) for c in value_cols]).alias(
            "__r_row"
        ),
    ).withColumn("__side", F.lit(0))
    l_tagged = left.withColumn("__side", F.lit(1))
    u = l_tagged.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__r_row", ignorenulls=True).over(w))
    u = u.withColumn(f"{ts}{suffix}", F.col("__match.__ts"))
    for c in value_cols:
        u = u.withColumn(f"{c}{suffix}", F.col(f"__match.{c}"))
    return u.filter(F.col("__side") == 1).drop("__side", "__r_row", "__match")
