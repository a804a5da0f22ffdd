"""As-of join, salted join, sinks."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.plans.joins import asof_join, salted_join
from filters_spark.schema import ERRORS_COL
from filters_spark.sources import sinks


@pytest.fixture(scope="module")
def trades_quotes(spark):
    T = dt.datetime
    trades = spark.createDataFrame(
        [(1, "A", T(2024, 1, 1, 10, 0, 0)),
         (2, "A", T(2024, 1, 1, 10, 5, 0)),
         (3, "B", T(2024, 1, 1, 9, 0, 0)),   # before any B quote
         (4, "C", T(2024, 1, 1, 12, 0, 0))], # no C quotes at all
        "trade_id bigint, sym string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", T(2024, 1, 1, 9, 59, 0), 100.0),
         ("A", T(2024, 1, 1, 10, 0, 0), 101.0),   # equal ts → <= match
         ("A", T(2024, 1, 1, 10, 4, 0), 102.0),
         ("B", T(2024, 1, 1, 9, 30, 0), 50.0)],
        "sym string, qt timestamp, px double",
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, "t", "qt", "sym", "sym")
        px = {r["trade_id"]: r["px_r"] for r in out.collect()}
        assert px == {1: 101.0, 2: 102.0, 3: None, 4: None}

    def test_forward(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, "t", "qt", "sym", "sym", direction="forward")
        px = {r["trade_id"]: r["px_r"] for r in out.collect()}
        assert px == {1: 101.0, 2: None, 3: 50.0, 4: None}

    def test_left_rows_preserved(self, trades_quotes):
        trades, quotes = trades_quotes
        out = asof_join(trades, quotes, "t", "qt", "sym", "sym")
        assert out.count() == trades.count()
        assert set(trades.columns) <= set(out.columns)

    def test_duplicate_time_ties_deterministic(self, spark):
        T = dt.datetime
        trades = spark.createDataFrame(
            [(1, "A", T(2024, 1, 1, 10, 0, 0))],
            "trade_id bigint, sym string, t timestamp",
        )
        # three right rows at the identical (key, time): the match must
        # always be the max-sorting payload, not shuffle-order-dependent
        quotes = spark.createDataFrame(
            [("A", T(2024, 1, 1, 10, 0, 0), px) for px in (7.0, 3.0, 9.0)],
            "sym string, qt timestamp, px double",
        ).repartition(8)
        for _ in range(3):
            out = asof_join(trades, quotes, "t", "qt", "sym", "sym")
            assert out.collect()[0]["px_r"] == 9.0


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        left = spark.range(0, 1000).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("v")
        )
        right = spark.createDataFrame(
            [(i, f"r{i}") for i in range(10)], "k bigint, name string"
        )
        plain = left.join(right, "k").select("k", "v", "name")
        salted = salted_join(left, right, "k", n_salts=8).select("k", "v", "name")
        assert plain.count() == salted.count() == 1000
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    def test_left_join_keeps_unmatched_left(self, spark):
        left = spark.createDataFrame([(1, "x"), (99, "y")], "k bigint, v string")
        right = spark.createDataFrame([(1, "r1")], "k bigint, name string")
        out = salted_join(left, right, "k", n_salts=4, how="left").collect()
        assert len(out) == 2

    def test_right_and_full_rejected(self, spark):
        left = spark.createDataFrame([(1, "x")], "k bigint, v string")
        right = spark.createDataFrame([(2, "r")], "k bigint, name string")
        for how in ("right", "full", "outer", "full_outer", "right_outer"):
            with pytest.raises(ValueError, match="salted_join does not support"):
                salted_join(left, right, "k", how=how)


class TestSinks:
    def test_clean_dead_letter_metrics(self, spark):
        tmp = tempfile.mkdtemp(prefix="fs_sinks_")
        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, None)], "id bigint, v double"
        )
        res = fs.ValidationSchema({"v": fs.Min(0)}).validate(df)
        sinks.write_clean(res, f"{tmp}/clean")
        sinks.write_dead_letter(res, f"{tmp}/dead")
        sinks.write_error_metrics(res, f"{tmp}/metrics")
        clean = spark.read.parquet(f"{tmp}/clean")
        dead = spark.read.parquet(f"{tmp}/dead")
        metrics = spark.read.parquet(f"{tmp}/metrics")
        assert sorted(r["id"] for r in clean.collect()) == [1, 3]  # NULL passes
        assert [r["id"] for r in dead.collect()] == [2]
        assert dead.head()["_first_code"] == "too_small"  # partition col readable
        m = metrics.head()
        assert (m["field"], m["code"], m["count"]) == ("v", "too_small", 1)
        shutil.rmtree(tmp, ignore_errors=True)

    def test_bucketed_write_roundtrip(self, spark):
        import uuid as _uuid
        table = f"t_bucketed_{_uuid.uuid4().hex[:8]}"
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        sinks.write_bucketed(df, table, "k", n_buckets=4)
        back = spark.table(table)
        assert back.count() == 100
        spark.sql(f"DROP TABLE {table}")


class TestBucketedJoinElision:
    def test_bucketed_tables_join_without_exchange(self, spark):
        """The 100 TB pattern: pay the shuffle once at write (bucketBy),
        then joins on the bucket key read co-located buckets with no
        Exchange on either side."""
        import uuid as _uuid

        suffix = _uuid.uuid4().hex[:8]
        ta, tb = f"t_orders_b_{suffix}", f"t_lineitem_b_{suffix}"
        from pyspark.sql import functions as F
        o = spark.range(0, 1000).select(
            F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
        )
        l = spark.range(0, 4000).select(
            (F.col("id") % 1000).alias("l_orderkey"), F.col("id").alias("l_item")
        )
        sinks.write_bucketed(o, ta, "o_orderkey", n_buckets=8)
        sinks.write_bucketed(l, tb, "l_orderkey", n_buckets=8)
        try:
            joined = spark.table(ta).join(
                spark.table(tb),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
            # the crucial assertion: no shuffle needed for either side
            assert "Exchange hashpartitioning" not in plan, plan[:2000]
            assert joined.count() == 4000
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {ta}")
            spark.sql(f"DROP TABLE IF EXISTS {tb}")


class TestUpsert:
    def test_update_insert_keep(self, spark):
        from filters_spark.plans.joins import upsert

        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
            "k bigint, v string, x double",
        )
        updates = spark.createDataFrame(
            [(2, "B", None), (4, "d", 40.0)],  # update k=2 (NULL wins!), insert k=4
            "k bigint, v string, x double",
        )
        out = {r["k"]: (r["v"], r["x"])
               for r in upsert(base, updates, "k").collect()}
        assert out == {1: ("a", 10.0), 2: ("B", None), 3: ("c", None),
                       4: ("d", 40.0)}

    def test_schema_mismatch_rejected(self, spark):
        from filters_spark.plans.joins import upsert

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        upd = spark.createDataFrame([(1,)], "k bigint")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="identical schemas"):
            upsert(base, upd, "k")


class TestUpsertGuards:
    def test_null_merge_key_rejected(self, spark):
        # guard is folded into the plan: build is lazy (no job), the
        # raise_error arm fires when the merge actually executes
        from filters_spark.plans.joins import upsert

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        upd = spark.createDataFrame([(None, "x")], "k bigint, v string")
        merged = upsert(base, upd, "k")  # must NOT raise or launch a job
        import pytest as _pytest
        with _pytest.raises(Exception, match="NULL 'k' merge key"):
            merged.collect()

    def test_null_merge_key_optout(self, spark):
        from filters_spark.plans.joins import upsert

        base = spark.createDataFrame([(1, "a")], "k bigint, v string")
        upd = spark.createDataFrame([(None, "x")], "k bigint, v string")
        out = upsert(base, upd, "k", validate_keys=False).collect()
        assert len(out) == 2  # NULL-key update inserts as its own row

    def test_type_mismatch_rejected(self, spark):
        from filters_spark.plans.joins import upsert

        base = spark.createDataFrame([(1, 1.0)], "k bigint, x double")
        upd = spark.createDataFrame([(1, "s")], "k bigint, x string")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="identical schemas"):
            upsert(base, upd, "k")


class TestPartitionPruning:
    def test_partitioned_write_prunes_at_read(self, spark):
        """Partitioned clean sink → a reader filtering on the
        partition column scans ONLY matching directories: the filter
        appears as a PartitionFilter (metadata-level pruning), not a
        data filter, and unreferenced partitions contribute no files."""
        tmp = tempfile.mkdtemp(prefix="fs_ppart_")
        df = spark.createDataFrame(
            [(i, float(i % 5), f"d{i % 3}") for i in range(60)],
            "id bigint, v double, day string",
        )
        res = fs.ValidationSchema({"v": fs.Min(0)}).validate(df)
        sinks.write_clean(res, f"{tmp}/clean", partition_by=["day"])

        back = spark.read.parquet(f"{tmp}/clean").where(F.col("day") == "d1")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the day predicate must be a partition filter, not a row filter
        import re
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
        assert "day" in pf
        assert back.count() == 20
        # physical layout: one directory per partition value
        import os
        dirs = sorted(d for d in os.listdir(f"{tmp}/clean") if d.startswith("day="))
        assert dirs == ["day=d0", "day=d1", "day=d2"]
        shutil.rmtree(tmp, ignore_errors=True)


class TestCompactedWrite:
    def test_file_count_tracks_target_size(self, spark):
        tmp = tempfile.mkdtemp(prefix="fs_compact_")
        df = spark.range(0, 1000).select(
            "id", F.lpad(F.lit("x"), 100, "x").alias("pad")
        )
        # ~104 bytes/row stringified × 1000 rows ≈ 104 kB → ~10 files
        # (compression_ratio=1 isolates the size arithmetic from the
        # on-disk calibration factor)
        n = sinks.write_compacted(df, f"{tmp}/out",
                                  target_bytes_per_file=10_000,
                                  sample_fraction=1.0,
                                  compression_ratio=1.0)
        import os
        files = [f for f in os.listdir(f"{tmp}/out") if f.endswith(".parquet")]
        assert n == len(files) and 8 <= n <= 13
        back = spark.read.parquet(f"{tmp}/out")
        assert back.count() == 1000
        shutil.rmtree(tmp, ignore_errors=True)

    def test_empty_frame_writes_single_file(self, spark):
        tmp = tempfile.mkdtemp(prefix="fs_compact0_")
        df = spark.range(0, 0).select("id")
        assert sinks.write_compacted(df, f"{tmp}/out",
                                     sample_fraction=1.0) == 1
        assert spark.read.parquet(f"{tmp}/out").count() == 0
        shutil.rmtree(tmp, ignore_errors=True)


class TestDeadLetterReplay:
    def test_relaxed_schema_recovers_rows(self, spark):
        tmp = tempfile.mkdtemp(prefix="fs_replay_")
        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, -7.0), (4, None)],
            "id bigint, v double",
        )
        strict = fs.ValidationSchema({"v": fs.Min(0)})
        res = strict.validate(df)
        sinks.write_dead_letter(res, f"{tmp}/dead")

        relaxed = fs.ValidationSchema({"v": fs.Min(-5)})
        replay = sinks.replay_dead_letter(spark, f"{tmp}/dead", relaxed)
        recovered = sorted(r["id"] for r in replay.clean.collect())
        still_bad = sorted(r["id"] for r in replay.rejected.collect())
        assert recovered == [2]     # -1 passes the relaxed bound
        assert still_bad == [3]     # -7 still fails
        # recovered rows carry no stale error payload
        assert ERRORS_COL not in replay.clean.columns
        shutil.rmtree(tmp, ignore_errors=True)


class TestZorder:
    def _morton(self, xs, cols_vals, bits=4):
        """Pure-python oracle: linear bucket + bit interleave."""
        n = len(cols_vals)
        los = [min(v) for v in cols_vals]
        his = [max(v) for v in cols_vals]
        out = []
        for idx in range(len(cols_vals[0])):
            key = 0
            for i, vals in enumerate(cols_vals):
                span = his[i] - los[i]
                if span <= 0 or vals[idx] is None:
                    b = 0
                else:
                    b = min((1 << bits) - 1,
                            int((vals[idx] - los[i]) / span * (1 << bits)))
                for bit in range(bits):
                    key += ((b >> bit) & 1) << (bit * n + i)
            out.append(key)
        return out

    def test_key_matches_python_morton(self, spark):
        from filters_spark.functions import layout
        xs = [0.0, 1.0, 5.0, 9.0, 10.0]
        ys = [10, 50, 20, 90, 100]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y bigint")
        key, stats = layout.zorder_key(df, ["x", "y"], bits=4)
        got = [r["k"] for r in
               df.crossJoin(F.broadcast(stats)).select(key.alias("k"))
               .collect()]
        assert got == self._morton(None, [xs, ys], bits=4)

    def test_zorder_files_tight_on_both_columns(self, spark, tmp_path):
        """The point of Z-ordering: every output file covers a narrow
        range of EVERY keyed column, so parquet min/max prunes files
        for predicates on either column.  A plain x-sort leaves y
        spanning the full range in every file."""
        import random
        rnd = random.Random(5)
        rows = [(rnd.uniform(0, 1000), rnd.uniform(0, 1000))
                for _ in range(20_000)]
        df = spark.createDataFrame(rows, "x double, y double")
        from filters_spark.functions import layout
        zp = str(tmp_path / "z")
        xp = str(tmp_path / "x")
        layout.write_zordered(df, zp, ["x", "y"], bits=6, n_files=16)
        (df.repartitionByRange(16, "x").sortWithinPartitions("x")
         .write.parquet(xp))

        def mean_span(path, col):
            d = spark.read.parquet(path).withColumn(
                "_f", F.input_file_name())
            spans = (d.groupBy("_f")
                     .agg((F.max(col) - F.min(col)).alias("s")).collect())
            return sum(r["s"] for r in spans) / len(spans)

        # x-sorted: x tight, y spans ~full range.  z-ordered: BOTH
        # dimensions substantially tighter than the full 0-1000 range.
        assert mean_span(xp, "y") > 900
        assert mean_span(zp, "x") < 600
        assert mean_span(zp, "y") < 600
        # and clustering actually prunes: a 2-d box predicate touches
        # a strict subset of the z-ordered files
        zread = spark.read.parquet(zp)
        total_files = zread.select(F.input_file_name()).distinct().count()
        hit_files = (zread.where((F.col("x") < 100) & (F.col("y") < 100))
                     .select(F.input_file_name()).distinct().count())
        assert hit_files < total_files / 2, (hit_files, total_files)


class TestHilbert:
    @staticmethod
    def _xy2d(order, x, y):
        """Classic public-domain Hilbert xy2d loop (Wikipedia) — the
        ground truth the baked FSM LUTs must reproduce."""
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    @classmethod
    def _fsm(cls, bits, x, y):
        from filters_spark.functions.layout import (_HILBERT_DLUT,
                                                    _HILBERT_SLUT)
        st = 0
        d = 0
        for lvl in range(bits - 1, -1, -1):
            q = (((x >> lvl) & 1) << 1) | ((y >> lvl) & 1)
            idx = (st * 4 + q) * 2
            d = (d << 2) | ((_HILBERT_DLUT >> idx) & 3)
            st = (_HILBERT_SLUT >> idx) & 3
        return d

    def test_luts_reproduce_classic_curve_exhaustively(self):
        """The baked 4-state LUTs ARE the classic curve: exhaustive
        over every 64×64 cell (and a coarser order as a regression
        against order-dependence bugs)."""
        for bits in (2, 6):
            n = 1 << bits
            for x in range(n):
                for y in range(n):
                    assert self._fsm(bits, x, y) == self._xy2d(bits, x, y)

    def test_consecutive_keys_grid_adjacent(self):
        """The property Z-order lacks: walking the key order never
        jumps — every step moves one cell in exactly one axis."""
        bits = 5
        n = 1 << bits
        inv = {self._fsm(bits, x, y): (x, y)
               for x in range(n) for y in range(n)}
        assert len(inv) == n * n  # bijective
        for d in range(n * n - 1):
            (x0, y0), (x1, y1) = inv[d], inv[d + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1

    def test_spark_key_matches_fsm(self, spark):
        """The codegen expression (floor-div power-of-4 LUT probes)
        equals the integer FSM on an exhaustive bucket grid."""
        from filters_spark.functions import layout
        bits = 4
        n = 1 << bits
        rows = [(float(x), float(y)) for x in range(n) for y in range(n)]
        df = spark.createDataFrame(rows, "x double, y double")
        key, stats = layout.hilbert_key(df, ["x", "y"], bits=bits)
        got = {(int(r["x"]), int(r["y"])): r["k"] for r in
               df.crossJoin(F.broadcast(stats))
               .select("x", "y", key.alias("k")).collect()}
        top = n - 1
        for x in range(n):
            for y in range(n):
                bx = min(top, int(x / (n - 1) * n))
                by = min(top, int(y / (n - 1) * n))
                assert got[(x, y)] == self._fsm(bits, bx, by)

    def test_hilbert_files_tight_and_beat_morton_locality(self, spark,
                                                          tmp_path):
        """write_hilbert clusters BOTH columns like write_zordered,
        and the curve's no-jump property shows up as per-file spans
        at least as tight as Morton's on the same data/bits/files."""
        import random
        rnd = random.Random(7)
        rows = [(rnd.uniform(0, 1000), rnd.uniform(0, 1000))
                for _ in range(20_000)]
        df = spark.createDataFrame(rows, "x double, y double")
        from filters_spark.functions import layout
        hp = str(tmp_path / "h")
        zp = str(tmp_path / "z")
        layout.write_hilbert(df, hp, ["x", "y"], bits=6, n_files=16)
        layout.write_zordered(df, zp, ["x", "y"], bits=6, n_files=16)

        def mean_span(path, col):
            d = spark.read.parquet(path).withColumn(
                "_f", F.input_file_name())
            spans = (d.groupBy("_f")
                     .agg((F.max(col) - F.min(col)).alias("s")).collect())
            return sum(r["s"] for r in spans) / len(spans)

        hx, hy = mean_span(hp, "x"), mean_span(hp, "y")
        zx, zy = mean_span(zp, "x"), mean_span(zp, "y")
        assert hx < 600 and hy < 600
        # locality: the Hilbert walk never jumps, so its combined
        # span can't be materially worse than Morton's (allow 5%
        # slack for range-split boundary noise)
        assert hx + hy <= (zx + zy) * 1.05, (hx, hy, zx, zy)
        # and a 2-d box predicate prunes files
        hread = spark.read.parquet(hp)
        total = hread.select(F.input_file_name()).distinct().count()
        hit = (hread.where((F.col("x") < 100) & (F.col("y") < 100))
               .select(F.input_file_name()).distinct().count())
        assert hit < total / 2, (hit, total)

    def test_two_column_requirement(self, spark):
        from filters_spark.functions import layout
        df = spark.createDataFrame([(1.0, 2.0, 3.0)],
                                   "x double, y double, z double")
        import pytest
        with pytest.raises(ValueError):
            layout.hilbert_key(df, ["x", "y", "z"])
        with pytest.raises(ValueError):
            layout.hilbert_key(df, ["x", "y"], bits=32)
