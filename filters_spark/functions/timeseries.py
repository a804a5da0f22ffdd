"""Time-series regularization for event tables.

The reference library (eflglobal/filters) validates scalar values; it
has no temporal-regularization surface.  This module is part of the
engine-category extension layer (SURVEY.md §2.9): the ops every
event-derived training pipeline needs before a model sees the data —
a regular time spine (models assume fixed-step sequences), gap
flags, and forward-filled carry-over values.

Scale notes (100 TB):

- ``time_spine`` derives each key's [min, max] bucket range with one
  aggregation and EXPLODES the missing buckets from per-key bounds —
  the spine is generated distributed, never driver-side, and its row
  count is Σ_key (range/step), independent of the raw event count.
- ``forward_fill`` is ``last(ignorenulls)`` over an UNBOUNDED
  PRECEDING window per key — one shuffle on the key, reused by every
  filled column; no self-join, no iterative pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_spine", "forward_fill", "gapfill"]


def time_spine(df: DataFrame, key: str, ts_col: str, step: str) -> DataFrame:
    """One row per (key, bucket) for every ``step``-sized bucket
    between that key's first and last observed bucket, inclusive.
    ``step`` is an SQL interval string (e.g. ``'1 day'``, ``'2 day'``)."""
    bucket = _bucket(F.col(ts_col), step)
    bounds = df.select(F.col(key), bucket.alias("_b")).groupBy(key).agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    return bounds.select(
        key,
        F.explode(
            F.sequence("_b0", "_b1", F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )


def _step_parts(step: str) -> tuple[int, str]:
    """'2 day' → (2, 'day'), 'hour' → (1, 'hour'); validates the unit.

    Multi-count week/month steps are rejected: their bucket grid is
    calendar-ambiguous (no fixed epoch anchor), and a mismatched grid
    silently drops aggregated rows off the spine join.
    """
    parts = step.strip().split()
    if len(parts) == 1:
        count_s, unit = "1", parts[0]
    elif len(parts) == 2:
        count_s, unit = parts
    else:
        raise ValueError(f"unsupported spine step: {step!r}")
    try:
        count = int(count_s)
    except ValueError:
        raise ValueError(f"unsupported spine step: {step!r}") from None
    unit = unit.lower().rstrip("s")
    if unit not in {"minute", "hour", "day", "week", "month"}:
        raise ValueError(f"unsupported spine step unit: {step!r}")
    if count < 1:
        raise ValueError(f"spine step count must be >= 1: {step!r}")
    if count != 1 and unit in {"week", "month"}:
        raise ValueError(
            f"multi-{unit} steps are calendar-ambiguous; "
            f"use '1 {unit}' or a day-based step"
        )
    return count, unit


def _bucket(ts: Column, step: str) -> Column:
    """Bucket ``ts`` onto the grid the spine steps over: calendar
    ``date_trunc`` for single-unit steps, epoch-aligned tumbling
    ``window(...).start`` for multi-count steps — every aggregated
    bucket is guaranteed to land on a spine point (the spine's
    ``sequence`` start is itself on this grid)."""
    count, unit = _step_parts(step)
    if count == 1:
        return F.date_trunc(unit, ts)
    return F.window(ts, f"{count} {unit}")["start"]


def forward_fill(df: DataFrame, key: str, ts_col: str,
                 cols: list[str]) -> DataFrame:
    """Carry each column's last non-null value forward in time within
    the key.  Leading gaps (before the first observation) stay NULL."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )


def gapfill(df: DataFrame, key: str, ts_col: str, step: str,
            agg: dict[str, Column], fill: bool = True) -> DataFrame:
    """Regularize an event stream: bucket to ``step``, aggregate per
    (key, bucket), left-join onto the full per-key spine (missing
    buckets surface as rows with ``is_gap = true``), then optionally
    forward-fill the aggregated columns.

    ``agg`` maps output column name → aggregate Column expression over
    the raw events (e.g. ``{'v': F.sum('value')}``)."""
    bucket = _bucket(F.col(ts_col), step).alias(ts_col)
    per_bucket = df.select(key, bucket, *[
        c for c in df.columns if c not in (key, ts_col)
    ]).groupBy(key, ts_col).agg(
        *[expr.alias(name) for name, expr in agg.items()]
    )
    spine = time_spine(df, key, ts_col, step)
    joined = (
        spine.join(per_bucket, [key, ts_col], "left")
        .withColumn("is_gap", F.col(list(agg)[0]).isNull())
    )
    if fill:
        joined = forward_fill(joined, key, ts_col, list(agg))
    return joined
