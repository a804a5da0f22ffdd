"""Join strategies Spark lacks natively: as-of join, salted skew
join (SURVEY.md §2.9 joins row; custom-operator guidance (a): compose
existing DataFrame ops).

**As-of join** (``asof_join``): for each left row, the most recent
right row at-or-before (backward) or at-or-after (forward) its
timestamp, per key.  Implemented as union → single sort per key →
running ``last(ignorenulls)`` window — ONE shuffle/sort over
|L|+|R| rows, versus the O(|L|·|R|) blowup of the naive range-join
formulation.  This is the standard log-merge trick; at 100 TB the
shuffle is on (key, time) which parquet time-partitioning already
pre-clusters, and AQE handles per-key skew.

**Salted join** (``salted_join``): explicit hot-key mitigation for
when AQE's skew splitting isn't available (e.g. bucketed tables,
older shuffle services): left rows get a random salt in [0, n), the
right (small-but-too-big-to-broadcast) side is replicated n ways, and
the join key becomes (key, salt) — hot keys spread across n tasks at
the cost of replicating the right side n×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "salted_join", "scd2", "upsert"]


def asof_join(left: DataFrame, right: DataFrame,
              left_time: str, right_time: str,
              by_left: str, by_right: str,
              direction: str = "backward",
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the matching right row's columns.

    direction='backward': latest right with right_time <= left_time.
    direction='forward':  earliest right with right_time >= left_time.
    Ties within the right side (duplicate (key, time) rows) resolve to
    the row whose payload struct sorts LAST — the window orders by
    (time, side, payload), so the match is deterministic across
    shuffles/retries.  Right payload columns must therefore be
    orderable types (no maps); pre-dedup per (key, time) otherwise.
    Right columns come back suffixed; unmatched → NULL.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    rcols = [c for c in right.columns if c not in (right_time, by_right)]
    payload = F.struct(
        F.col(right_time).alias("_t"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        F.col(by_right).alias("_key"),
        F.col(right_time).cast("timestamp").alias("_time"),
        F.lit(0).alias("_is_left"),
        payload.alias("_payload"),
    )
    l = left.select(
        F.col(by_left).alias("_key"),
        F.col(left_time).cast("timestamp").alias("_time"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))
    unioned = l.select("_key", "_time", "_is_left", "_payload", "_lrow").unionByName(
        r.select("_key", "_time", "_is_left", "_payload", "_lrow")
    )

    # _payload in the orderBy pins which duplicate-(key, time) right row
    # wins (last/ignorenulls picks the max-sorting payload) — without it
    # the match would depend on shuffle arrival order.  Left rows have a
    # NULL payload; nulls_first keeps them ordered before right ties only
    # among themselves, and _is_left already separates the two sides.
    if direction == "backward":
        # right rows sort before left rows at equal time (<= semantics)
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_time").asc(), F.col("_is_left").asc(),
                     F.col("_payload").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_time").desc(), F.col("_is_left").asc(),
                     F.col("_payload").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_payload", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_match", matched)
        .where(F.col("_is_left") == 1)
    )
    left_cols = [F.col("_lrow").getField(c).alias(c) for c in left.columns]
    right_out = [
        F.col("_match").getField("_t").alias(right_time + suffix)
    ] + [F.col("_match").getField(c).alias(c + suffix) for c in rcols]
    return out.select(*left_cols, *right_out)


#: join types for which replicating the right side n_salts ways is
#: result-preserving (unmatched RIGHT rows are never emitted).
_SALT_SAFE_HOW = frozenset(
    {"inner", "left", "left_outer", "leftouter",
     "left_semi", "leftsemi", "semi",
     "left_anti", "leftanti", "anti", "cross"}
)


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with explicit key salting for hot keys.  Results are
    identical to ``left.join(right, on, how)``; only the shuffle
    layout changes (hot left keys spread over ``n_salts`` tasks,
    right side replicated ``n_salts``×).

    Only left-preserving join types are allowed: with ``right`` /
    ``full`` outer joins every unmatched right row would be emitted
    once per salt replica, so those raise ``ValueError`` (flip the
    operands and use ``how='left'`` instead)."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            f"replicated {n_salts}x, so right/full outer joins would emit "
            "unmatched right rows once per salt. Flip the operands and use "
            "how='left', or use a plain join with AQE skew handling."
        )
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def upsert(base: DataFrame, updates: DataFrame, key: str,
           validate_keys: bool = True) -> DataFrame:
    """Keyed upsert (CDC merge): rows from ``updates`` replace
    same-key rows in ``base``; unmatched update rows insert; unmatched
    base rows persist.  Pure DataFrame expression of MERGE semantics
    for plain-parquet pipelines (no transactional table format in
    this environment — with one, prefer its native MERGE, which
    rewrites only touched files).

    Plan shape: ONE full-outer join on the key + per-column coalesce
    (update side wins).  At 100 TB both sides shuffle on the key once
    — the same cost as any keyed join; if base is bucketed on the key
    the exchange on that side disappears.  Requires both frames to
    share a schema; updates must be unique per key (enforce upstream
    with exact_dedup — nondeterministic which duplicate wins
    otherwise).

    NULL merge keys are rejected INSIDE the plan (a NULL key joins to
    nothing and would surface as an all-NULL output row): the update
    key column carries a ``raise_error`` CASE arm, so the merge fails
    loudly at execution time with zero extra jobs — nothing eager at
    plan-build time.  ``validate_keys=False`` opts out (caller has
    already guaranteed non-null keys and wants the narrowest plan).
    """
    if base.columns != updates.columns or base.dtypes != updates.dtypes:
        raise ValueError(
            f"upsert requires identical schemas; base has {base.dtypes}, "
            f"updates has {updates.dtypes}"
        )
    key_col = F.col(key)
    if validate_keys:
        key_col = F.when(F.col(key).isNotNull(), F.col(key)).otherwise(
            F.raise_error(F.lit(
                f"upsert: updates contain a NULL {key!r} merge key — NULL "
                "keys cannot match or insert deterministically; filter or "
                "repair them upstream"
            ))
        )
    u = updates.select(
        *[
            (key_col if c == key else F.col(c)).alias(f"_u_{c}")
            for c in updates.columns
        ],
        F.lit(True).alias("_u_present"),
    )
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    # row-presence dispatch, NOT per-column coalesce: an update row
    # wins wholesale (including its legitimate NULL columns — MERGE
    # semantics); presence is tracked by a sentinel column, not the
    # key, so it stays correct whatever the key's own nullability
    has_update = F.col("_u_present").isNotNull()
    return joined.select([
        F.when(has_update, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
        for c in base.columns
    ])


def scd2(events: DataFrame, key: str, ts_col: str,
         attr_cols: list[str] | None = None,
         collapse_unchanged: bool = True) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    stream: one validity interval per (key, change), with
    ``valid_from`` = the change's timestamp, ``valid_to`` = the next
    change's timestamp (NULL = still current), and ``is_current``.

    ``collapse_unchanged`` drops consecutive rows whose tracked
    attributes did not change (the dimension only versions on real
    change — the standard SCD2 contract); disable to version every
    event.  Change detection and interval stitching are both windows
    over the SAME (key × ts) sort, so the whole build is ONE shuffle
    keyed by ``key`` — at 100 TB that is a single exchange of the
    change stream, and a dimension bucketed on the key afterwards
    joins facts without re-shuffling.  Ties on ``ts_col`` within a
    key are broken by the attribute tuple so the history is
    deterministic for any input order.
    """
    attr_cols = attr_cols or [
        c for c in events.columns if c not in (key, ts_col)]
    w = Window.partitionBy(key).orderBy(ts_col, *attr_cols)
    df = events
    if collapse_unchanged:
        changed = F.lit(False)
        for c in attr_cols:
            prev = F.lag(F.col(c)).over(w)
            # null-safe inequality: a NULL→value or value→NULL flip
            # IS a change; NULL→NULL is not
            changed = changed | ~F.col(c).eqNullSafe(prev)
        first = F.lag(F.col(ts_col)).over(w).isNull()
        df = df.withColumn("_keep", first | changed).where(F.col("_keep")) \
               .drop("_keep")
    w2 = Window.partitionBy(key).orderBy(ts_col, *attr_cols)
    valid_to = F.lead(F.col(ts_col)).over(w2)
    return df.select(
        key,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        *attr_cols,
    )


def scd2_from_changes(spark, path: str, key: str, from_version: int,
                      to_version: int | None = None) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 replica of a VERSIONED
    table's change feed (Delta Live Tables' ``APPLY CHANGES … STORED
    AS SCD TYPE 2``, on this format's CDC): one validity interval per
    (key, content version) with ``__start_version`` /
    ``__end_version`` (NULL = current) / ``is_current`` —
    :func:`apply_changes_sink` keeps the LATEST state, this keeps the
    HISTORY, and a dimension built this way as-of-joins facts at any
    commit.

    Seeding: keys already present at ``from_version`` open their
    first interval THERE (one snapshot read).  The span's feed is
    read PER COMMIT (consecutive ``read_changes`` pairs — a span
    read would NET intermediate states away, exactly what a type-2
    history must keep): stored change files make each pair
    O(that commit's changes); commits without them pay a diff.
    Each commit contributes one net event per key, so
    postimages/inserts OPEN intervals, the next event's version
    CLOSES the previous one (a single ``lead`` window), and deletes
    close without opening — re-inserted keys start a fresh interval.
    ONE shuffle keyed by ``key`` on top of the feeds; change
    detection is the feed's own fingerprinting (unchanged rewrites
    never version — the SCD2 contract).

    Plan size: when every commit in the span stored its change files
    under one schema (the ``store_changes=True`` discipline), the
    span reads as ONE multi-path scan (``versioned.
    read_changes_per_commit``) and the plan is O(1) in history
    length.  Spans with unstored commits fall back to one union
    branch per commit — the giant-union plan class SCALE.md §25
    documents (80k-char plans at 120 commits); for a long-lived
    table either store feeds at commit time or maintain the
    dimension on cadence with :func:`maintain_scd2`: bounded feed
    consumption per call into a STORED versioned dimension.
    """
    from ..sources import versioned as V

    if to_version is None:
        to_version = V.latest_version(path)
    base = V.read_version(spark, path, from_version).withColumn(
        "_change_type", F.lit("insert")).withColumn(
        "_commit_version", F.lit(from_version).cast("long"))
    vers = [v for v in V.versions(path)
            if from_version <= v <= to_version]
    events = base
    # Bounded-plan fast path (r12 — SCALE.md §25/§32, VERDICT r11
    # task 10): when every commit in the span stored its change
    # files under one schema, the whole span reads as ONE multi-path
    # scan with the commit version derived from each file's
    # `changes/v=N/` path segment — plan size O(1) in history length
    # instead of one union branch per commit (80k-char plans at 120
    # commits, planning time dominating execution).  Rows are
    # identical to the per-pair loop's by construction (stored ≡
    # diff is the library contract; per-commit images, never netted).
    fast = V.read_changes_per_commit(spark, path, key,
                                     from_version, to_version)
    if fast is not None:
        events = events.unionByName(
            fast.where(F.col("_change_type") != "update_preimage"),
            allowMissingColumns=True)
    else:
        for lo, hi in zip(vers, vers[1:]):
            f = (V.read_changes(spark, path, key, lo, hi)
                 .where(F.col("_change_type") != "update_preimage")
                 .withColumn("_commit_version", F.lit(hi).cast("long")))
            events = events.unionByName(f, allowMissingColumns=True)
    attr_cols = [c for c in events.columns
                 if c not in (key, "_change_type", "_commit_version")]
    w = Window.partitionBy(key).orderBy("_commit_version")
    out = events.withColumn(
        "__end_version", F.lead("_commit_version").over(w))
    return (out.where(F.col("_change_type") != "delete")
            .select(key, *attr_cols,
                    F.col("_commit_version").alias("__start_version"),
                    "__end_version",
                    F.col("__end_version").isNull().alias("is_current")))


#: Surrogate merge key separator for the stored SCD2 dimension
#: (key value must not contain it — same contract as the rollup's).
_SCD2_SEP = "\x1f"


def maintain_scd2(spark, src_path: str, dim_path: str, key: str,
                  cursor_path: str,
                  start_version: int = 1) -> int | None:
    """INCREMENTAL SCD2 maintenance (r10 VERDICT #3, the
    ``maintain_continuous_rollup`` pattern): keep a STORED versioned
    TYPE-2 dimension of ``src_path`` up to date by consuming its
    change feed since a cursor — each call does BOUNDED work (the
    commits since the cursor) and produces a BOUNDED plan (one feed
    branch per consumed commit), where :func:`scd2_from_changes`
    rebuilds the whole span with a union branch per historical commit
    (the SCALE.md §25 giant-union class).

    Per call: walk the source commits in ``(cursor, head]`` reading
    each commit's net events PER COMMIT (a span read would net
    intermediate states away — the type-2 invariant), pull the
    dimension's OPEN intervals for the affected keys only, re-stitch
    events + open intervals with the same single ``lead`` window
    ``scd2_from_changes`` uses, and MERGE the resulting interval rows
    into the dimension keyed by the surrogate ``_sk`` = key ‖ ␟ ‖
    start-version (file-reuse merge: a daily delta against a
    billion-row dimension rewrites the touched slice).  Inserts/
    postimages open intervals and close the key's previous one;
    deletes close without opening; re-inserts start fresh intervals.

    First call (no cursor file): seeds from the snapshot at
    ``start_version`` (keys present open their first interval there —
    identical seeding to ``scd2_from_changes(from_version=
    start_version)``) plus the commits after it.

    CRASH-SAFE: the cursor is acked only AFTER the dimension commit,
    so a crash in between replays the span; replayed interval rows
    carry identical (``_sk``, content) and the merge's fingerprinting
    makes the re-apply a no-op (at-least-once consumption composed
    with keyed upsert — the sink contract).  A replayed event that
    ties an already-open interval at the same version dedupes by
    (key, version) with the interval ranked last.

    Returns the new dimension version, or None when already caught
    up.  Pinned: N maintenance calls ≡ ``scd2_from_changes`` full
    rebuild (hash gate ``rel_scd2_maintain`` + TestMaintainScd2 incl.
    crash replay and bounded-plan audit)."""
    from ..sources import versioned as V

    head = V.latest_version(src_path)
    if head is None:
        raise ValueError(f"maintain_scd2: {src_path!r} has no snapshots")
    cur = V.read_cursor(cursor_path)
    if cur is not None and cur >= head:
        return None
    if cur is None:
        seed_from = start_version
        events = V.read_version(spark, src_path, seed_from) \
            .withColumn("_change_type", F.lit("insert")) \
            .withColumn("_cv", F.lit(seed_from).cast("long"))
    else:
        seed_from = cur
        events = None
    vers = [v for v in V.versions(src_path) if seed_from <= v <= head]
    # bounded-plan fast path — one scan for the whole consumed span
    # when every commit stored its feed (see scd2_from_changes)
    fast = V.read_changes_per_commit(spark, src_path, key,
                                     seed_from, head)
    if fast is not None:
        f = (fast.where(F.col("_change_type") != "update_preimage")
             .withColumnRenamed("_commit_version", "_cv"))
        events = f if events is None else \
            events.unionByName(f, allowMissingColumns=True)
    else:
        for lo, hi in zip(vers, vers[1:]):
            f = (V.read_changes(spark, src_path, key, lo, hi)
                 .where(F.col("_change_type") != "update_preimage")
                 .withColumn("_cv", F.lit(hi).cast("long")))
            events = f if events is None else \
                events.unionByName(f, allowMissingColumns=True)
    if events is None:
        V.advance_cursor(cursor_path, head)
        return None
    attr_cols = [c for c in events.columns
                 if c not in (key, "_change_type", "_cv")]
    dim_exists = V.latest_version(dim_path) is not None
    if dim_exists:
        affected = events.select(key).distinct()
        open_ivs = (V.read_version(spark, dim_path)
                    .where(F.col("is_current"))
                    .join(F.broadcast(affected), key, "left_semi")
                    .select(key, *attr_cols,
                            F.lit("open").alias("_change_type"),
                            F.col("__start_version").alias("_cv")))
        events = events.unionByName(open_ivs)
        # crash replay: an already-open interval can tie a replayed
        # event at the same version — same content, dedupe with the
        # stored interval ranked LAST so the event's type wins
        pri = F.when(F.col("_change_type") == "open", 0).otherwise(1)
        wd = Window.partitionBy(key, "_cv").orderBy(pri.desc())
        events = (events.withColumn("_rn", F.row_number().over(wd))
                  .where(F.col("_rn") == 1).drop("_rn"))
    w = Window.partitionBy(key).orderBy("_cv")
    out = events.withColumn("__end_version", F.lead("_cv").over(w))
    rows = (out.where(F.col("_change_type") != "delete")
            .select(key, *attr_cols,
                    F.col("_cv").alias("__start_version"),
                    "__end_version",
                    F.col("__end_version").isNull().alias("is_current"))
            .withColumn("_sk", F.concat_ws(
                _SCD2_SEP, F.col(key).cast("string"),
                F.col("__start_version").cast("string"))))
    # rows is BOUNDED (this call's events + the affected open
    # intervals) with non-trivial lineage (per-commit feed reads, the
    # open-interval join, the stitch window); merge_versioned persists
    # its update batch internally, so the stitch runs once per call.
    if not dim_exists:
        version = V.write_versioned(
            rows, dim_path, _op="scd2-init",
            extra_meta={"scd2_src_version": head})
    else:
        version = V.merge_versioned(
            spark, dim_path, rows, "_sk", file_reuse=True,
            extra_meta={"scd2_src_version": head})
    V.advance_cursor(cursor_path, head)
    return version
