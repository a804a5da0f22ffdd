"""Time-series regularization (functions/timeseries.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from filters_spark.functions import timeseries as ts


def _dt(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def sparse(spark):
    # user 1: observations on days 1, 2, 5 (gap 3-4);
    # user 2: single day (no gaps, degenerate spine)
    return spark.createDataFrame(
        [
            (1, _dt(1, 9), 10.0),
            (1, _dt(1, 12), 2.0),   # same bucket as above → sums
            (1, _dt(2), 5.0),
            (1, _dt(5), 7.0),
            (2, _dt(3), 1.0),
        ],
        "user_id bigint, ts timestamp, value double",
    )


class TestSpine:
    def test_inclusive_bounds_and_step(self, sparse):
        sp = ts.time_spine(sparse, "user_id", "ts", "1 day")
        got = sorted((r["user_id"], r["ts"].day) for r in sp.collect())
        assert got == [(1, 1), (1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]

    def test_rejects_unknown_unit(self, sparse):
        with pytest.raises(ValueError, match="spine step"):
            ts.time_spine(sparse, "user_id", "ts", "1 fortnight")


class TestGapfill:
    def test_gap_rows_flagged_and_filled(self, sparse):
        out = ts.gapfill(sparse, "user_id", "ts", "1 day",
                         agg={"v": F.sum("value")})
        rows = {(r["user_id"], r["ts"].day): (r["v"], r["is_gap"])
                for r in out.collect()}
        assert rows[(1, 1)] == (12.0, False)   # two events summed
        assert rows[(1, 2)] == (5.0, False)
        assert rows[(1, 3)] == (5.0, True)     # gap carries day-2 value
        assert rows[(1, 4)] == (5.0, True)
        assert rows[(1, 5)] == (7.0, False)    # observation overrides fill
        assert rows[(2, 3)] == (1.0, False)

    def test_no_fill_leaves_gaps_null(self, sparse):
        out = ts.gapfill(sparse, "user_id", "ts", "1 day",
                         agg={"v": F.sum("value")}, fill=False)
        gaps = out.where(F.col("is_gap")).collect()
        assert all(r["v"] is None for r in gaps) and len(gaps) == 2


class TestForwardFill:
    def test_leading_nulls_stay_null(self, spark):
        df = spark.createDataFrame(
            [(1, 1, None), (1, 2, 5.0), (1, 3, None)],
            "k bigint, t bigint, v double",
        )
        out = {r["t"]: r["v"]
               for r in ts.forward_fill(df, "k", "t", ["v"]).collect()}
        assert out == {1: None, 2: 5.0, 3: 5.0}


class TestMultiUnitStep:
    def test_two_day_buckets_land_on_spine(self, sparse):
        # Whatever the epoch-aligned '2 day' grid is, EVERY aggregated
        # bucket must appear in the joined output (none dropped by the
        # spine join — the bug multi-unit steps used to have).
        out = ts.gapfill(
            sparse, key="user_id", ts_col="ts", step="2 day",
            agg={"v": F.sum("value")}, fill=False,
        ).collect()
        non_gap = {(r.user_id, r.ts) for r in out if not r.is_gap}
        # raw buckets computed independently
        from pyspark.sql import functions as SF
        raw = (
            sparse.select("user_id", SF.window("ts", "2 day")["start"].alias("b"))
            .distinct()
            .collect()
        )
        assert {(r.user_id, r.b) for r in raw} == non_gap
        # total observed value is conserved (nothing silently vanished)
        assert sum(r.v for r in out if r.v is not None) == 25.0

    def test_twelve_hour_step(self, sparse):
        out = ts.gapfill(
            sparse, key="user_id", ts_col="ts", step="12 hour",
            agg={"v": F.sum("value")}, fill=False,
        ).collect()
        vals = [r.v for r in out if r.v is not None]
        assert sum(vals) == 25.0
        # user 1 day-1 09:00 and 12:00 land in different 12h buckets
        u1 = sorted(r.ts for r in out if r.user_id == 1 and not r.is_gap)
        assert u1[0].hour == 0 and u1[1].hour == 12

    def test_rejects_multi_month(self):
        with pytest.raises(ValueError, match="calendar-ambiguous"):
            ts._step_parts("2 month")

    def test_rejects_zero_count(self):
        with pytest.raises(ValueError, match=">= 1"):
            ts._step_parts("0 day")


class TestContinuousRollup:
    """maintain_continuous_rollup: incremental ≡ full recompute
    across inserts/updates/deletes/bucket-moves, tombstoning, and
    crash-replay idempotency (the arithmetic is hash-gated by
    rel_continuous_rollup)."""

    def _src(self, spark, rows):
        return spark.createDataFrame(
            rows, "k bigint, ts timestamp, grp string, v bigint")

    def _maintain(self, spark, src, dst, cur):
        from filters_spark.functions.timeseries import (
            maintain_continuous_rollup,
        )
        return maintain_continuous_rollup(
            spark, src, dst, "k", "ts", "day",
            [("sum", "v", "v_sum"), ("max", "v", "v_max")],
            cur, group_cols=("grp",))

    def _full(self, spark, src):
        from filters_spark.sources import versioned as V
        return {
            (str(r["b"]), r["grp"]): (r["n"], r["s"], r["m"])
            for r in (V.read_version(spark, src)
                      .groupBy(F.date_trunc("day", "ts").alias("b"), "grp")
                      .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                           F.max("v").alias("m")).collect())
        }

    def _rolled(self, spark, dst):
        from filters_spark.sources import versioned as V
        return {
            (str(r["bucket"]), r["grp"]): (r["n_rows"], r["v_sum"],
                                           r["v_max"])
            for r in V.read_version(spark, dst)
            .where(F.col("n_rows") > 0).collect()
        }

    def test_lifecycle_matches_full_recompute(self, spark, tmp_path):
        import datetime as dt

        from filters_spark.sources import versioned as V

        src, dst, cur = (str(tmp_path / p) for p in ("s", "d", "c"))
        t = lambda day, h=0: dt.datetime(2024, 3, day, h)  # noqa: E731
        V.write_versioned(self._src(spark, [
            (1, t(1), "a", 10), (2, t(1), "b", 20),
            (3, t(2), "a", 30), (4, t(2, 5), "a", 40)]), src)
        assert self._maintain(spark, src, dst, cur) == 1   # bootstrap
        assert self._rolled(spark, dst) == self._full(spark, src)
        # update (v bump), bucket MOVE (day 2 -> day 3), delete day-1
        # 'b' entirely, insert into a fresh day
        V.merge_versioned(spark, src, self._src(spark, [
            (3, t(3), "a", 31),          # moves bucket 2 -> 3
            (1, t(1), "a", 11),          # in-place update
            (5, t(4), "b", 50)]), "k")   # new bucket
        V.write_versioned(
            V.read_version(spark, src).where(F.col("k") != 2), src)
        assert self._maintain(spark, src, dst, cur) is not None
        assert self._rolled(spark, dst) == self._full(spark, src)
        # tombstone really recorded for the emptied (day-1, b) bucket
        tomb = (V.read_version(spark, dst)
                .where(F.col("n_rows") == 0).collect())
        assert any(r["grp"] == "b" for r in tomb)
        # caught up: no-op
        assert self._maintain(spark, src, dst, cur) is None

    def test_crash_replay_idempotent(self, spark, tmp_path):
        import datetime as dt

        from filters_spark.sources import versioned as V

        src, dst, cur = (str(tmp_path / p) for p in ("s", "d", "c"))
        t = dt.datetime(2024, 3, 1)
        V.write_versioned(self._src(spark, [(1, t, "a", 10)]), src)
        self._maintain(spark, src, dst, cur)
        V.merge_versioned(spark, src,
                          self._src(spark, [(2, t, "a", 20)]), "k")
        # simulate the crash: maintenance ran but the ack was lost —
        # rewind the cursor to the pre-maintenance position
        before = V.read_cursor(cur)
        self._maintain(spark, src, dst, cur)
        import os
        os.remove(cur)
        V.advance_cursor(cur, before)
        # replay: same span consumed again, result unchanged
        self._maintain(spark, src, dst, cur)
        assert self._rolled(spark, dst) == self._full(spark, src)

    def test_bad_agg_fn(self, spark, tmp_path):
        from filters_spark.functions.timeseries import (
            maintain_continuous_rollup,
        )
        from filters_spark.sources import versioned as V

        src = str(tmp_path / "s")
        V.write_versioned(self._src(spark, []), src)
        with pytest.raises(ValueError, match="unsupported"):
            maintain_continuous_rollup(
                spark, src, str(tmp_path / "d"), "k", "ts", "day",
                [("median", "v", "x")], str(tmp_path / "c"))


class TestRollupNullGroups:
    def test_null_group_values_stay_distinct(self, spark, tmp_path):
        """concat_ws drops NULL elements AND their separator, so
        (NULL, 'z') and ('z', NULL) would collide on a naive
        surrogate key — the rollup must keep them as separate rows."""
        import datetime as dt

        from filters_spark.functions.timeseries import (
            maintain_continuous_rollup,
        )
        from filters_spark.sources import versioned as V

        src, dst, cur = (str(tmp_path / p) for p in ("s", "d", "c"))
        t = dt.datetime(2024, 3, 1)
        df = spark.createDataFrame(
            [(1, t, None, "z", 10), (2, t, "z", None, 20)],
            "k bigint, ts timestamp, g1 string, g2 string, v bigint")
        V.write_versioned(df, src)
        maintain_continuous_rollup(
            spark, src, dst, "k", "ts", "day",
            [("sum", "v", "v_sum")], cur, group_cols=("g1", "g2"))
        rows = V.read_version(spark, dst).collect()
        assert len(rows) == 2
        got = {(r["g1"], r["g2"]): r["v_sum"] for r in rows}
        assert got == {(None, "z"): 10, ("z", None): 20}


class TestWindowFunnel:
    """windowFunnel DP (r11): ordered chains, window-from-anchor,
    re-anchoring, same-event non-chaining."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "u bigint, ts timestamp, e string")

    def _run(self, spark, rows, window="10 hour"):
        df = self._df(spark, rows)
        out = ts.window_funnel(
            df, "u", "ts",
            [F.col("e").contains("a"), F.col("e").contains("b"),
             F.col("e").contains("c")], window=window)
        return {r["u"]: r["funnel_level"] for r in out.collect()}

    def test_hand_cases(self, spark):
        t0 = datetime.datetime(2024, 1, 1)

        def T(h):
            return t0 + datetime.timedelta(hours=h)
        rows = [
            (1, T(0), "a"), (1, T(1), "b"), (1, T(2), "c"),   # full
            (2, T(1), "b"), (2, T(3), "a"),                   # order!
            (3, T(0), "a"), (3, T(1), "b"), (3, T(50), "c"),  # expiry
            # stale anchor, fresh re-anchor completes
            (4, T(0), "a"), (4, T(40), "a"), (4, T(41), "b"),
            (4, T(42), "c"),
            (5, T(0), "z"),                                   # absent
            (6, T(0), "ab"),        # one event can't chain itself
            (7, T(0), "a"), (7, T(1), "bc"),                  # 2 max
            (8, T(0), "b"),         # events but no step-1 -> level 0
        ]
        got = self._run(spark, rows)
        assert got == {1: 3, 2: 1, 3: 2, 4: 3, 6: 1, 7: 2, 8: 0}

    def test_no_window_and_partition_invariance(self, spark):
        t0 = datetime.datetime(2024, 1, 1)

        def T(h):
            return t0 + datetime.timedelta(hours=h)
        rows = [(3, T(0), "a"), (3, T(1), "b"), (3, T(5000), "c")]
        got = self._run(spark, rows, window=None)
        assert got == {3: 3}
        df = self._df(spark, rows).repartition(13)
        out = ts.window_funnel(
            df, "u", "ts",
            [F.col("e").contains("a"), F.col("e").contains("b"),
             F.col("e").contains("c")])
        assert {r["u"]: r["funnel_level"]
                for r in out.collect()} == {3: 3}

    def test_guards(self, spark):
        df = self._df(spark, [])
        with pytest.raises(ValueError, match="non-empty"):
            ts.window_funnel(df, "u", "ts", [])
        with pytest.raises(ValueError, match="fixed"):
            ts.window_funnel(df, "u", "ts", [F.lit(True)],
                             window="1 month")
