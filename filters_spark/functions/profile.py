"""Data-quality profiling (SURVEY.md §2.9 aggregations row:
"approx_count_distinct for profiling; cube/rollup for data-quality
dashboards").

``profile(df)`` computes, in ONE pass over the data (a single
aggregate with every statistic as an expression — no per-column
jobs), a long-format summary:

    (column, n_rows, n_nulls, n_distinct, approx_distinct, min, max)

Scale notes: one scan, one tiny shuffle (the global aggregate);
``n_distinct`` is exact only when ``exact_distinct=True`` (it is the
expensive one — per-column hash sets); the default uses HyperLogLog
(``approx_count_distinct``, fixed memory).  min/max are rendered as
strings so one long table covers heterogeneous column types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile", "null_report", "category_drift", "ks_statistic", "table_diff", "mad_outliers", "winsorize"]


def profile(df: DataFrame, columns: list[str] | None = None,
            exact_distinct: bool = False, rsd: float = 0.05) -> DataFrame:
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"_approx_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        entry = F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nulls_{c}").cast("long").alias("n_nulls"),
            (F.col(f"_dist_{c}").cast("long") if exact_distinct else F.lit(None).cast("long")).alias("n_distinct"),
            F.col(f"_approx_{c}").cast("long").alias("approx_distinct"),
            F.col(f"_min_{c}").alias("min"),
            F.col(f"_max_{c}").alias("max"),
        )
        rows.append(entry)
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def null_report(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_nulls, null_frac) — the minimal quality dashboard."""
    cols = columns or df.columns
    p = profile(df, cols)
    return p.select(
        "column", "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
    )


def category_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Categorical distribution drift between two slices (e.g. last
    week vs this week of a feed): per-category shares in each slice
    and their absolute difference — ``0.5 * sum(abs_diff)`` is the
    total-variation distance, the standard drift alarm for a
    training-data intake.

    Plan shape: one grouped count per slice (map-side combined), each
    cross-joined with its own 1-row total as a BROADCAST, stitched
    with a full-outer join on the category (a category present in
    only one slice shows share 0 on the other — exactly the drift
    you most want to see).  Nothing leaves the executors; the result
    is |categories| rows.
    """
    def shares(df: DataFrame, out: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("_cat")).agg(
            F.count(F.lit(1)).alias("_n"))
        total = counts.agg(F.sum("_n").alias("_t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "_cat", F.round(F.col("_n") / F.col("_t"), 6).alias(out))
    a = shares(df_a, "share_a")
    b = shares(df_b, "share_b").withColumnRenamed("_cat", "_catb")
    return (
        # eqNullSafe: a NULL category is a real category in an intake
        # feed — a plain equi-join would emit it as two half-rows,
        # each claiming the other slice has share 0 (a maximal false
        # drift alarm on identical distributions)
        a.join(b, a["_cat"].eqNullSafe(b["_catb"]), "full_outer")
        .select(
            F.coalesce(F.col("_cat"), F.col("_catb")).alias(col),
            F.coalesce("share_a", F.lit(0.0)).alias("share_a"),
            F.coalesce("share_b", F.lit(0.0)).alias("share_b"),
            F.round(F.abs(F.coalesce("share_a", F.lit(0.0))
                          - F.coalesce("share_b", F.lit(0.0))), 6)
            .alias("abs_diff"),
        )
    )


def ks_statistic(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between numeric
    distributions: ``max |ECDF_a(x) − ECDF_b(x)|`` — the numeric
    complement of :func:`category_drift` (the drift alarm for price /
    length / score columns, where category shares don't apply).

    Exact formulation: union both samples with membership flags, one
    RANGE-framed running sum per side over the value order (RANGE,
    not ROWS, so ties evaluate the ECDFs after ALL equal values —
    the mathematically correct step function), take the max absolute
    difference of the normalized sums.  Returns one row
    (ks, n_a, n_b); ``ks`` is NULL when either sample is empty
    (``try_divide`` — the statistic is undefined, and under ANSI mode
    a plain division would throw instead of degrading).

    Scale note: the exact statistic needs a single global value
    order.  That is fine up to tens of millions of rows (one sort);
    at 100 TB evaluate the ECDFs on an ``approx_percentile`` grid per
    side instead — the sup over a 1000-point quantile grid bounds the
    exact KS within 1/1000 — or pre-aggregate equal values first.
    """
    u = (
        df_a.select(F.col(col).cast("double").alias("_v"),
                    F.lit(1).alias("_a"), F.lit(0).alias("_b"))
        .unionAll(
            df_b.select(F.col(col).cast("double").alias("_v"),
                        F.lit(0).alias("_a"), F.lit(1).alias("_b")))
        .where(F.col("_v").isNotNull())
    )
    w = Window.orderBy("_v").rangeBetween(Window.unboundedPreceding, 0)
    cum = u.select(
        F.sum("_a").over(w).alias("_ca"),
        F.sum("_b").over(w).alias("_cb"),
    )
    totals = u.agg(F.sum("_a").alias("_na"), F.sum("_b").alias("_nb"))
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.round(F.max(F.abs(
                F.try_divide(F.col("_ca"), F.col("_na"))
                - F.try_divide(F.col("_cb"), F.col("_nb")))), 6)
            .alias("ks"),
            F.first("_na").alias("n_a"),
            F.first("_nb").alias("n_b"),
        )
    )


def table_diff(a: DataFrame, b: DataFrame,
               key_cols: list[str] | None = None) -> DataFrame:
    """Content diff of two same-schema frames — the backfill /
    migration verification tool: which rows did the rewrite add,
    remove, or (with ``key_cols``) change?

    Without keys: rows compare by their FULL md5 content fingerprint
    (the prof_table_fingerprint canonical encoding: every column cast
    to string, NULL mapped to a sentinel, '|'-joined) and the result
    is one row per difference CLASS — (status 'added'|'removed',
    fingerprint, n) with multiplicity deltas counted exactly (three
    identical rows in ``a`` vs one in ``b`` reports 'removed' n=2).
    With ``key_cols``: per-key comparison — (status 'added'|
    'removed'|'changed', key fingerprint, n) where 'changed' means
    the key exists on both sides with different non-key content.

    Scale shape: two grouped fingerprint counts + one full-outer join
    on the 16-byte hash — narrow shuffles, never row-by-row driver
    comparison; an identical 100 TB pair costs two scans and an
    empty join."""
    if [f.simpleString() for f in a.schema.fields] != \
            [f.simpleString() for f in b.schema.fields]:
        raise ValueError(
            "table_diff: schemas differ — diff the schema first "
            "(expect_schema), then the content")

    def canon(cols):
        return F.md5(F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"),
                              F.lit("\x00null")) for c in cols]))

    if key_cols is None:
        fa = a.groupBy(canon(a.columns).alias("fingerprint")) \
            .agg(F.count(F.lit(1)).alias("_na"))
        fb = b.groupBy(canon(b.columns).alias("fingerprint")) \
            .agg(F.count(F.lit(1)).alias("_nb"))
        j = fa.join(fb, "fingerprint", "full_outer").select(
            "fingerprint",
            F.coalesce("_na", F.lit(0)).alias("_na"),
            F.coalesce("_nb", F.lit(0)).alias("_nb"))
        return (j.where(F.col("_na") != F.col("_nb"))
                .select(F.when(F.col("_na") > F.col("_nb"), "removed")
                        .otherwise("added").alias("status"),
                        "fingerprint",
                        F.abs(F.col("_na") - F.col("_nb"))
                        .cast("bigint").alias("n")))
    val_cols = [c for c in a.columns if c not in key_cols]
    fa = a.select(canon(key_cols).alias("key_fp"),
                  canon(val_cols).alias("_va"))
    fb = b.select(canon(key_cols).alias("key_fp"),
                  canon(val_cols).alias("_vb"))
    j = fa.join(fb, "key_fp", "full_outer")
    status = (F.when(F.col("_vb").isNull(), "removed")
              .when(F.col("_va").isNull(), "added")
              .when(F.col("_va") != F.col("_vb"), "changed"))
    return (j.select(status.alias("status"), "key_fp")
            .where(F.col("status").isNotNull())
            .groupBy("status", "key_fp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")))


def _join_back_nullsafe(left: DataFrame, right: DataFrame,
                        keys: list[str]) -> DataFrame:
    """Broadcast-join per-group stats back onto the input with
    NULL-SAFE key equality — ``join(..., keys)`` silently DROPS rows
    whose group column is NULL (inner join, null-unsafe `=`), while
    groupBy keeps NULL as a real group (r10 ADVICE: mad_outliers /
    winsorize / top_fraction_by_group all lost NULL-group rows).
    Right-side keys are renamed before the join so output columns
    stay exactly the left schema + the right's stat columns."""
    if not keys:
        return left.crossJoin(F.broadcast(right))
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"_nsj_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_nsj_{k}"))
    return (left.join(F.broadcast(r), cond)
            .drop(*[f"_nsj_{k}" for k in keys]))


def mad_outliers(df: DataFrame, col: str, by: list[str] | None = None,
                 k: float = 3.0) -> DataFrame:
    """Robust outlier detection by MEDIAN absolute deviation — the
    profiler's answer to "which rows are numerically anomalous"
    without the mean/stddev trap (a single extreme value inflates
    stddev until nothing is an outlier; the median and MAD have a 50%
    breakdown point).

    Flags rows where ``|x − median| > k · MAD`` per group (``by``;
    global when omitted) — NO division, so zero-MAD groups (a
    majority-constant column, the classic MAD caveat) simply flag
    every deviating row, and the whole predicate is ANSI-safe and
    engine-exact on integer inputs (medians interpolate to halves,
    MADs to quarters — all exact in binary; pick a ``k`` with an
    exact binary representation, e.g. 3.0, for cross-engine gates).

    Returns the input rows plus ``_med``, ``_mad``, ``is_outlier``.
    Scale shape: two grouped EXACT-median aggregates (shuffles
    bounded by the group count) + one broadcast join back; NULLs in
    ``col`` get ``is_outlier = NULL`` (three-valued, never flagged);
    rows whose GROUP key is NULL form their own group (null-safe
    join back — row counts are preserved exactly).
    """
    keys = list(by or [])
    gmed = (df.groupBy(*keys).agg(F.median(col).alias("_med"))
            if keys else df.agg(F.median(col).alias("_med")))
    j = _join_back_nullsafe(df, gmed, keys)
    dev = F.abs(F.col(col) - F.col("_med"))
    gmad = (j.groupBy(*keys).agg(F.median(dev).alias("_mad"))
            if keys else j.agg(F.median(dev).alias("_mad")))
    out = _join_back_nullsafe(j, gmad, keys)
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(col) - F.col("_med")) > F.lit(k) * F.col("_mad"))


def winsorize(df: DataFrame, col: str, by: list[str] | None = None,
              k: float = 3.0, out_col: str | None = None) -> DataFrame:
    """Robust clamping to ``median ± k·MAD`` per group — the
    outlier TREATMENT beside :func:`mad_outliers`' detection
    (winsorization: extreme values are pulled to the fence instead of
    dropped, preserving row counts for downstream joins/aggregates).
    Same exact-arithmetic properties: no division, zero-MAD groups
    clamp everything to the median, NULLs pass through NULL,
    integer inputs stay engine-exact (fences land on quarters).
    Appends ``out_col`` (default ``{col}_winsorized``)."""
    out_col = out_col or f"{col}_winsorized"
    flagged = mad_outliers(df, col, by=by, k=k)
    lo = F.col("_med") - F.lit(k) * F.col("_mad")
    hi = F.col("_med") + F.lit(k) * F.col("_mad")
    return flagged.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(None))
        .when(F.col(col) < lo, lo)
        .when(F.col(col) > hi, hi)
        .otherwise(F.col(col).cast("double"))
    ).drop("_med", "_mad", "is_outlier")
