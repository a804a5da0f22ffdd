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

__all__ = ["time_spine", "forward_fill", "gapfill",
           "maintain_continuous_rollup"]


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


def window_funnel(df: DataFrame, user_col: str, ts_col: str,
                  steps: list[Column], window: str | None = None
                  ) -> DataFrame:
    """FUNNEL analysis (ClickHouse ``windowFunnel``'s semantics): per
    user, the FURTHEST level of an ordered condition chain — events
    walk in timestamp order, step j counts only on an event AFTER one
    that completed steps 1..j-1, and with ``window`` every chain
    event must fall within that duration of the step-1 event
    ANCHORING its chain (every step-1 event opens a fresh anchor; the
    user's level is the best over all anchors).

    Returns ``(user_col, funnel_level int)`` — 0 rows never appear
    (users with no step-matching events are absent; left-join and
    coalesce to 0 for a population denominator).  Conversion tables
    are one ``groupBy(funnel_level)`` away.

    The classic O(n·k) DP with O(k) state: slot j holds the LATEST
    anchor time of any chain that has reached level j.  An event
    matching step j>1 promotes ``anchor[j] = max(anchor[j],
    anchor[j-1])`` when the anchor is within the window; a step-1
    match refreshes ``anchor[1]``.  All levels read the PRE-event
    state, so one event never satisfies two consecutive steps of the
    same chain; equal-timestamp events chain in their sorted order
    (ties broken by the struct sort — give events distinct
    timestamps for fully partition-invariant results).  Slots fill
    prefix-first, so the level is the non-null count.

    Scale shape: ONE user-keyed shuffle — events filter to
    step-matching rows (the dominant reduction on real logs), fold
    to a per-user sorted (ts, bitmask) array, and the DP runs as an
    ``aggregate`` HOF over the array.  Per-user arrays are
    session-sized (the sessionize contract)."""
    if not steps:
        raise ValueError("window_funnel: steps must be non-empty")
    k = len(steps)
    win_us = None
    if window is not None:
        n, unit = _step_parts(window)
        mult = {"minute": 60, "hour": 3600, "day": 86400,
                "week": 604800}.get(unit)
        if mult is None:
            raise ValueError(
                f"window_funnel: window unit {unit!r} is not a fixed "
                "duration (months vary); use minute/hour/day/week")
        win_us = n * mult * 1_000_000
    mask = None
    for i, c in enumerate(steps):
        bit = F.when(F.coalesce(c, F.lit(False)), F.lit(1 << i)) \
            .otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
    ev = (df.select(F.col(user_col),
                    F.unix_micros(F.col(ts_col)).alias("_us"),
                    mask.cast("int").alias("_m"))
          .where(F.col("_m") > 0)
          .groupBy(user_col)
          .agg(F.array_sort(F.collect_list(
              F.struct(F.col("_us"), F.col("_m")))).alias("_ev")))
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step_fn(acc, e):
        slots = []
        for j in range(1, k + 1):
            cur = F.element_at(acc, j)
            hit = e["_m"].bitwiseAND(F.lit(1 << (j - 1))) != 0
            if j == 1:
                slots.append(F.when(hit, F.greatest(cur, e["_us"]))
                             .otherwise(cur))
                continue
            prev = F.element_at(acc, j - 1)
            ok = hit & prev.isNotNull()
            if win_us is not None:
                ok = ok & ((e["_us"] - prev) <= F.lit(win_us))
            slots.append(F.when(ok, F.greatest(cur, prev))
                         .otherwise(cur))
        return F.array(*slots)

    final = F.aggregate(F.col("_ev"), init, step_fn)
    return ev.select(
        F.col(user_col),
        F.size(F.filter(final, lambda x: x.isNotNull()))
        .cast("int").alias("funnel_level"))


def maintain_continuous_rollup(spark, src_path: str, dst_path: str,
                               key: str, ts_col: str, step: str,
                               aggs: list[tuple[str, str, str]],
                               cursor_path: str,
                               group_cols: tuple[str, ...] = ()) -> int | None:
    """Continuous aggregate (the hypertable-rollup pattern —
    TimescaleDB's continuous aggregates, public docs): a time-bucket
    rollup of a versioned SOURCE table, maintained INCREMENTALLY in a
    versioned DESTINATION table.  Each call consumes the source's
    change feed since the cursor (``sources.versioned.
    consume_changes``), finds the AFFECTED buckets (distinct
    ``time_bucket(ts)`` over every change image — inserts, deletes,
    and both update images, so a row MOVING between buckets dirties
    both), recomputes ONLY those buckets from the current snapshot,
    and merges them into the destination — tombstoning (bucket,
    groups) rows whose last source row vanished (``n_rows = 0``;
    consumers filter ``n_rows > 0``).

    ``aggs`` is ``[(fn, col, alias), ...]`` with fn ∈
    {sum, count, min, max, avg} — ANY of them stays correct because
    dirty buckets are recomputed from the snapshot, never
    delta-adjusted (no mergeability requirement, no drift
    accumulation).  ``n_rows`` is always maintained.  Rows with NULL
    ``ts_col`` are outside the rollup by contract.

    The destination carries a surrogate merge key ``_rk``
    (unit-separator concat of bucket + group values — group values
    must not contain ``\\x1f``).  The cursor is acked only AFTER the
    destination commit, so a crash in between replays the span and
    the recompute-then-merge is idempotent (at-least-once consumption
    composed with keyed upsert — the same contract as the streaming
    sinks).

    Returns the new destination version, or None when already caught
    up.  Scale shape: the change feed's one diff join, then ONE
    bucket-scoped recompute (a semi join against the broadcast
    affected-bucket set — at 100 TB with the source clustered/
    stats'd on ``ts_col`` this prunes to the dirty time range) and
    one keyed merge; cost tracks the CHANGED time range, not table
    size.  Pinned: incremental ≡ full recompute is hash-gated by
    ``rel_continuous_rollup`` and pytest-pinned across update/delete/
    crash-replay sequences."""
    from ..sources import versioned as V

    changes, to, ack = V.consume_changes(spark, src_path, key,
                                         cursor_path)
    if changes is None:
        return None
    b = _bucket(F.col(ts_col), step)
    affected = (changes.select(b.alias("bucket"))
                .where(F.col("bucket").isNotNull()).distinct())
    snap = (V.read_version(spark, src_path, to)
            .withColumn("bucket", b)
            .where(F.col("bucket").isNotNull()))
    scoped = snap.join(F.broadcast(affected), "bucket", "left_semi")
    exprs = []
    for fn, col, alias in aggs:
        if fn == "count":
            exprs.append(F.count(F.lit(1)).cast("long").alias(alias))
        elif fn in ("sum", "min", "max", "avg"):
            exprs.append(getattr(F, fn)(col).alias(alias))
        else:
            raise ValueError(f"maintain_continuous_rollup: unsupported "
                             f"agg fn {fn!r}")
    gcols = ["bucket", *group_cols]
    # NULL group values must stay distinguishable: concat_ws SKIPS
    # nulls (element AND separator), so (NULL, 'z') and ('z', NULL)
    # would collide on the surrogate — encode NULL explicitly.
    rk = F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
        for c in gcols])
    recomputed = (scoped.groupBy(*gcols)
                  .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                       *exprs)
                  .withColumn("_rk", rk))
    if V.latest_version(dst_path) is None:
        version = V.write_versioned(
            recomputed, dst_path, _op="rollup-init",
            extra_meta={"rollup_src_version": to})
    else:
        old = (V.read_version(spark, dst_path)
               .join(F.broadcast(affected), "bucket", "left_semi"))
        types = dict(recomputed.dtypes)
        gone = (old.join(recomputed, "_rk", "left_anti")
                .select(*[F.col(c) for c in gcols],
                        F.lit(0).cast("long").alias("n_rows"),
                        *[F.lit(None).cast(types[a]).alias(a)
                          for _, _, a in aggs],
                        F.col("_rk")))
        updates = recomputed.select(*recomputed.columns).unionByName(
            gone.select(*recomputed.columns))
        version = V.merge_versioned(
            spark, dst_path, updates, "_rk",
            extra_meta={"rollup_src_version": to})
    ack()
    return version
