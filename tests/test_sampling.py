"""Deterministic hash sampling (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from filters_spark.functions import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "key")


class TestThreshold:
    def test_known_values(self):
        assert sampling.rate_to_hex_threshold(0.25) == "40000000"
        assert sampling.rate_to_hex_threshold(0.5) == "80000000"
        assert sampling.rate_to_hex_threshold(0.0) == "00000000"
        # 1.0 must keep even the md5 'ffffffff…' corner
        assert sampling.rate_to_hex_threshold(1.0) > "ffffffff"

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            sampling.rate_to_hex_threshold(1.5)


class TestHashKeep:
    def test_rate_within_binomial_noise(self, ids):
        n = ids.where(sampling.hash_keep(F.col("key"), 0.2)).count()
        # 10k draws at p=0.2: sd = sqrt(10000*.2*.8) = 40; ±5sd
        assert abs(n - 2000) < 200

    def test_deterministic_and_nested(self, ids):
        a = ids.where(sampling.hash_keep(F.col("key"), 0.1))
        b = ids.where(sampling.hash_keep(F.col("key"), 0.3))
        # same predicate → same rows run-to-run
        assert a.collect() == a.collect()
        # thresholds nest: the 10% sample is a subset of the 30% one
        assert a.join(b, "key", "left_anti").count() == 0


class TestStratified:
    def test_per_stratum_rates(self, spark):
        df = spark.range(0, 4000).select(
            F.col("id").alias("key"),
            F.when(F.col("id") % 2 == 0, "big").otherwise("small").alias("s"),
        )
        out = sampling.stratified_sample(df, "key", "s",
                                         rates={"big": 0.1}, default_rate=0.9)
        got = {r["s"]: r["n"] for r in
               out.groupBy("s").agg(F.count("*").alias("n")).collect()}
        assert abs(got["big"] - 200) < 90      # 2000 * 0.1, ±~6sd
        assert abs(got["small"] - 1800) < 90   # 2000 * 0.9


class TestHashBucket:
    def test_range_and_split_stability(self, ids):
        b = ids.select("key", sampling.hash_bucket(F.col("key"), 10).alias("b"))
        lo, hi = b.agg(F.min("b"), F.max("b")).head()
        assert lo == 0 and hi == 9
        # an 80% train split re-derived later selects the same rows
        train1 = b.where(F.col("b") < 8).select("key")
        train2 = ids.where(sampling.hash_bucket(F.col("key"), 10) < 8)
        assert train1.count() == train2.count()
        assert train1.join(train2, "key", "left_anti").count() == 0


class TestNullKeys:
    def test_null_key_kept_at_full_rate(self, spark):
        from filters_spark.functions import sampling as smp

        df = spark.createDataFrame([(None,), ("a",), ("b",)], "k string")
        kept = df.where(smp.hash_keep(F.col("k"), 1.0)).count()
        assert kept == 3  # NULL key must not silently shrink the corpus

    def test_null_key_gets_a_bucket(self, spark):
        from filters_spark.functions import sampling as smp

        df = spark.createDataFrame([(None,), ("a",)], "k string")
        rows = df.select(smp.hash_bucket(F.col("k"), 10).alias("b")).collect()
        assert all(r.b is not None and 0 <= r.b < 10 for r in rows)

    def test_null_key_uniform_in_range(self, spark):
        from filters_spark.functions import sampling as smp

        df = spark.createDataFrame([(None,)], "k string")
        [r] = df.select(smp.hash_uniform(F.col("k")).alias("u")).collect()
        assert r.u is not None and 0.0 <= r.u < 1.0

    def test_null_keys_deterministic(self, spark):
        from filters_spark.functions import sampling as smp

        df = spark.createDataFrame([(None,), (None,)], "k string")
        rows = df.select(smp.hash_bucket(F.col("k"), 64).alias("b")).collect()
        assert rows[0].b == rows[1].b  # one pseudo-key, one bucket


class TestHashReservoir:
    def test_k_per_group_and_stability(self, spark):
        from filters_spark.functions import sampling

        rows = [(i, "g1" if i % 2 else "g2") for i in range(200)]
        df = spark.createDataFrame(rows, "id bigint, g string")
        out = sampling.hash_reservoir(df, ["g"], "id", 5)
        got = sorted((r["g"], r["id"]) for r in out.collect())
        assert len(got) == 10
        again = sorted((r["g"], r["id"])
                       for r in sampling.hash_reservoir(df, ["g"], "id", 5).collect())
        assert got == again
        # reservoir invariant: adding rows can only displace, never
        # change the relative choice among survivors
        bigger = spark.createDataFrame(rows + [(1000, "g1")], "id bigint, g string")
        got2 = {r["id"] for r in
                sampling.hash_reservoir(bigger, ["g"], "id", 5).collect()}
        old = {i for g, i in got}
        assert len(old - got2) <= 1


class TestMixtureMissingDomain:
    def test_unachievable_mixture_returns_empty(self, spark):
        """A targeted domain with zero observed rows makes the target
        mixture unachievable — the result must be EMPTY, not a
        silently mis-mixed single-domain corpus."""
        from filters_spark.functions import sampling
        df = spark.createDataFrame([(i, "a") for i in range(50)],
                                   "k bigint, dom string")
        out = sampling.domain_mixture_sample(
            df, "k", "dom", {"a": 0.5, "b": 0.5})
        assert out.count() == 0

    def test_nonpositive_target_rejected(self, spark):
        import pytest as _pytest
        from filters_spark.functions import sampling
        df = spark.createDataFrame([(1, "a")], "k bigint, dom string")
        with _pytest.raises(ValueError, match="must be > 0"):
            sampling.domain_mixture_sample(df, "k", "dom", {"a": 0.0})


class TestCountMin:
    def _py_cms(self, values, depth, width):
        import hashlib
        from collections import Counter
        table = Counter()
        for v in values:
            for r in range(depth):
                h = hashlib.md5(f"{r}|{v}".encode()).hexdigest()
                table[(r, int(h[:8], 16) % width)] += 1
        def est(v):
            return min(table.get(
                (r, int(hashlib.md5(f"{r}|{v}".encode()).hexdigest()[:8],
                        16) % width), 0) for r in range(depth))
        return est

    def test_estimates_match_python_and_never_undercount(self, spark):
        from filters_spark.functions import sketch
        from collections import Counter
        vals = [i % 7 for i in range(200)] + [99] * 50
        df = spark.createDataFrame([(v,) for v in vals], "k int")
        table = sketch.cms_table(df, "k", depth=4, width=64)
        items = df.select("k").distinct()
        got = {r["k"]: r["est"] for r in
               sketch.cms_estimate(table, items, "k",
                                   depth=4, width=64).collect()}
        py = self._py_cms(vals, 4, 64)
        exact = Counter(vals)
        for v in set(vals):
            assert got[v] == py(v), v              # engine == python oracle
            assert got[v] >= exact[v], v           # never undercounts

    def test_unseen_item_estimates_bounded(self, spark):
        from filters_spark.functions import sketch
        df = spark.createDataFrame([(1,)] * 10, "k int")
        table = sketch.cms_table(df, "k", depth=4, width=1024)
        items = spark.createDataFrame([(123456,)], "k int")
        est = sketch.cms_estimate(table, items, "k",
                                  depth=4, width=1024).head()["est"]
        assert 0 <= est <= 10   # collisions possible, never negative

    def test_table_bounded_by_depth_times_width(self, spark):
        from filters_spark.functions import sketch
        df = spark.createDataFrame([(i,) for i in range(5000)], "k bigint")
        table = sketch.cms_table(df, "k", depth=3, width=32)
        assert table.count() <= 3 * 32   # state bounded, not |distinct|

    def test_merge_equals_concat(self, spark):
        from filters_spark.functions import sketch
        a = spark.createDataFrame([(i % 5,) for i in range(100)], "k int")
        b = spark.createDataFrame([(i % 9,) for i in range(80)], "k int")
        ta = sketch.cms_table(a, "k", depth=3, width=32)
        tb = sketch.cms_table(b, "k", depth=3, width=32)
        merged = sketch.cms_merge(ta, tb)
        whole = sketch.cms_table(a.unionByName(b), "k", depth=3, width=32)
        items = a.unionByName(b).select("k").distinct()
        em = {r["k"]: r["est"] for r in sketch.cms_estimate(
            merged, items, "k", depth=3, width=32).collect()}
        ew = {r["k"]: r["est"] for r in sketch.cms_estimate(
            whole, items, "k", depth=3, width=32).collect()}
        assert em == ew   # linear merge == rebuild from scratch


class TestStratifiedFixedN:
    def test_exact_n_and_deterministic(self, spark):
        from filters_spark.functions import sampling
        rows = [(i, f"s{i % 3}") for i in range(90)]
        df = spark.createDataFrame(rows, "k bigint, g string")
        a = sampling.stratified_fixed_n(df, "k", "g", 10)
        counts = {r["g"]: r["n"] for r in
                  a.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"s0": 10, "s1": 10, "s2": 10}
        # deterministic across repartitioning
        b = sampling.stratified_fixed_n(df.repartition(7), "k", "g", 10)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_matches_python_md5_order(self, spark):
        import hashlib
        from filters_spark.functions import sampling
        rows = [(i, "g") for i in range(40)]
        df = spark.createDataFrame(rows, "k bigint, g string")
        got = sorted(r["k"] for r in
                     sampling.stratified_fixed_n(df, "k", "g", 5).collect())
        exp = sorted(sorted(range(40),
                            key=lambda k: (hashlib.md5(str(k).encode())
                                           .hexdigest(), k))[:5])
        assert got == exp

    def test_small_stratum_returns_all(self, spark):
        from filters_spark.functions import sampling
        df = spark.createDataFrame([(1, "g"), (2, "g")], "k bigint, g string")
        assert sampling.stratified_fixed_n(df, "k", "g", 10).count() == 2

    def test_two_phase_identical_to_single_window(self, spark):
        """The salted two-phase plan (scale shape) must select the
        EXACT same rows as the salt=1 single-window plan — the
        provable-identity contract of the phase-1 local top-n."""
        from filters_spark.functions import sampling
        rows = [(i, f"s{i % 4}") for i in range(500)]
        df = spark.createDataFrame(rows, "k bigint, g string")
        for n in (1, 7, 60, 200):
            one = sorted(map(tuple,
                sampling.stratified_fixed_n(df, "k", "g", n, salt=1)
                .collect()))
            two = sorted(map(tuple,
                sampling.stratified_fixed_n(df, "k", "g", n, salt=32)
                .collect()))
            assert one == two, f"n={n}"

    def test_two_phase_no_whole_stratum_window(self, spark):
        """Phase 1 must partition by (stratum, salt), never by the
        stratum alone over the raw input — the 100 TB single-task
        hazard (VERDICT r4 'scale-killers found: one')."""
        from filters_spark.functions import sampling
        df = spark.createDataFrame([(1, "g")], "k bigint, g string")
        plan = (sampling.stratified_fixed_n(df, "k", "g", 5)
                ._jdf.queryExecution().optimizedPlan().toString())
        # two windows: the first (innermost) keyed by (g, _salt)
        assert "_salt" in plan


class TestHyperLogLog:
    def test_estimate_within_hll_error_bound(self, spark):
        """10k distinct keys, p=8 (m=256): standard error
        1.04/sqrt(256) = 6.5%; assert within 4 sigma (26%)."""
        from filters_spark.functions import sketch
        df = spark.range(10_000).select(
            F.concat(F.lit("key"), F.col("id")).alias("k"))
        est = sketch.hll_estimate(sketch.hll_table(df, "k")) \
            .head()["est_distinct"]
        assert abs(est - 10_000) / 10_000 < 0.26

    def test_small_range_linear_counting_is_tight(self, spark):
        from filters_spark.functions import sketch
        df = spark.range(50).select(F.col("id").cast("string").alias("k"))
        est = sketch.hll_estimate(sketch.hll_table(df, "k")) \
            .head()["est_distinct"]
        # linear counting regime: near-exact at 50 << m
        assert abs(est - 50) <= 5

    def test_duplicates_do_not_move_the_estimate(self, spark):
        from filters_spark.functions import sketch
        base = spark.range(1000).select(
            F.col("id").cast("string").alias("k"))
        dup = base.unionAll(base).unionAll(base)
        e1 = sketch.hll_estimate(sketch.hll_table(base, "k")).head()[0]
        e3 = sketch.hll_estimate(sketch.hll_table(dup, "k")).head()[0]
        assert e1 == e3

    def test_merge_equals_union_sketch(self, spark):
        """hll_merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the
        shard-then-merge contract, exact on the bucket table."""
        from filters_spark.functions import sketch
        a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
        b = spark.range(2000, 5000).select(
            F.col("id").cast("string").alias("k"))
        merged = sorted(map(tuple, sketch.hll_merge(
            sketch.hll_table(a, "k"), sketch.hll_table(b, "k")).collect()))
        direct = sorted(map(tuple,
                            sketch.hll_table(a.unionAll(b), "k").collect()))
        assert merged == direct

    def test_grouped_table_matches_per_group(self, spark):
        from filters_spark.functions import sketch
        df = spark.range(600).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 97).cast("string").alias("k"))
        grouped = sketch.hll_table(df, "k", by=["g"])
        for g in ("0", "1", "2"):
            per = sorted((r["bucket"], r["max_rho"]) for r in
                         sketch.hll_table(df.where(F.col("g") == g),
                                          "k").collect())
            sub = sorted((r["bucket"], r["max_rho"]) for r in
                         grouped.where(F.col("g") == g)
                         .select("bucket", "max_rho").collect())
            assert per == sub
        ests = sketch.hll_estimate(grouped, by=["g"]).collect()
        assert len(ests) == 3 and all(r["est_distinct"] > 0 for r in ests)


class TestBloomFilter:
    def test_no_false_negatives_ever(self, spark):
        from filters_spark.functions import sketch
        keys = spark.range(500).select(F.col("id").alias("k"))
        bits = sketch.bloom_bits(keys, "k", n_bits=4096, k=5)
        got = sketch.bloom_contains(bits, keys, "k", n_bits=4096, k=5)
        assert got.where(~F.col("maybe_member")).count() == 0

    def test_absent_keys_mostly_rejected(self, spark):
        from filters_spark.functions import sketch
        keys = spark.range(200).select(F.col("id").alias("k"))
        bits = sketch.bloom_bits(keys, "k", n_bits=8192, k=5)
        absent = spark.range(100000, 101000).select(F.col("id").alias("k"))
        fp = (sketch.bloom_contains(bits, absent, "k", n_bits=8192, k=5)
              .where(F.col("maybe_member")).count())
        # fill ratio ~0.11 -> FP rate (0.115)^5 ~ 2e-5; allow slack
        assert fp <= 5

    def test_merge_equals_union_filter(self, spark):
        from filters_spark.functions import sketch
        a = spark.range(0, 300).select(F.col("id").alias("k"))
        b = spark.range(200, 500).select(F.col("id").alias("k"))
        merged = sorted(r["bit"] for r in sketch.bloom_merge(
            sketch.bloom_bits(a, "k", 4096, 5),
            sketch.bloom_bits(b, "k", 4096, 5)).collect())
        direct = sorted(r["bit"] for r in
                        sketch.bloom_bits(a.unionAll(b), "k", 4096, 5)
                        .collect())
        assert merged == direct


class TestHdrQuantiles:
    def test_bucket_math_exact(self, spark):
        from filters_spark.functions import sketch
        # v < 16: exact buckets (shift 0, lb = v); v = 100:
        # bit_length 7 -> shift 3, top 12, lb 96
        df = spark.createDataFrame([(5,), (15,), (100,)], "x bigint")
        rows = {r["lb"]: r for r in sketch.hdr_table(df, "x").collect()}
        assert rows[5]["shift"] == 0 and rows[5]["n"] == 1
        assert rows[15]["shift"] == 0
        assert rows[96]["shift"] == 3 and rows[96]["top"] == 12

    def test_quantiles_and_bound(self, spark):
        from filters_spark.functions import sketch
        df = spark.range(1, 1001).select(F.col("id").alias("x"))
        tbl = sketch.hdr_table(df, "x")
        qs = [(1, 2), (9, 10)]
        est = {(r["q_num"], r["q_den"]): r["est"]
               for r in sketch.hdr_quantiles(tbl, qs).collect()}
        # exact medians: 500 and 900; lb <= exact < lb * (1 + 1/8)
        for q, exact in [((1, 2), 500), ((9, 10), 900)]:
            lb = est[q]
            assert lb <= exact and (exact - lb) * 8 <= lb

    def test_merge_equals_union(self, spark):
        from filters_spark.functions import sketch
        a = spark.range(1, 500).select(F.col("id").alias("x"))
        b = spark.range(300, 900).select(F.col("id").alias("x"))
        merged = sorted(map(tuple, sketch.hdr_merge(
            sketch.hdr_table(a, "x"), sketch.hdr_table(b, "x")).collect()))
        direct = sorted(map(tuple,
                            sketch.hdr_table(a.unionAll(b), "x").collect()))
        assert merged == direct

    def test_non_positive_raises(self, spark):
        from filters_spark.functions import sketch
        df = spark.createDataFrame([(0,)], "x bigint")
        with pytest.raises(Exception, match="non-positive"):
            sketch.hdr_table(df, "x").collect()


class TestTemperatureMixture:
    def test_sqrt_rates_and_determinism(self, spark):
        from filters_spark.functions import sampling
        # a: 100 rows (smallest -> rate 1.0, ALL kept);
        # b: 400 rows -> rate sqrt(100/400) = 0.5
        df = spark.range(500).select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 100, "a").otherwise("b").alias("dom"))
        out = sampling.temperature_mixture_sample(df, "k", "dom")
        counts = {r["dom"]: r["n"] for r in
                  out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
        assert counts["a"] == 100
        assert 120 < counts["b"] < 280  # ~200 expected, hash-determined
        again = sampling.temperature_mixture_sample(df, "k", "dom")
        assert sorted(map(tuple, out.collect())) == \
            sorted(map(tuple, again.collect()))

    def test_alpha_one_is_identity_rates(self, spark):
        from filters_spark.functions import sampling
        # alpha=1: w=n, rate = (n/n)*min(n/n) = 1 for every domain
        df = spark.range(300).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("dom"))
        out = sampling.temperature_mixture_sample(df, "k", "dom", alpha=1.0)
        assert out.count() == 300

    def test_grouped_quantiles(self, spark):
        from filters_spark.functions import sketch
        # group a: 1..100 (median 50); group b: 1000..1999 (median ~1500)
        df = spark.range(1, 101).select(F.lit("a").alias("g"), F.col("id").alias("x")) \
            .unionAll(spark.range(1000, 2000).select(F.lit("b").alias("g"),
                                                     F.col("id").alias("x")))
        tbl = sketch.hdr_table(df, "x", by=["g"])
        est = {(r["g"], r["q_num"], r["q_den"]): r["est"]
               for r in sketch.hdr_quantiles(tbl, [(1, 2)], by=["g"]).collect()}
        for g, exact in [("a", 50), ("b", 1500)]:
            lb = est[(g, 1, 2)]
            assert lb <= exact and (exact - lb) * 8 <= lb


class TestPpsSystematic:
    def _mk(self, spark, weights):
        return spark.createDataFrame(
            [(i, w) for i, w in enumerate(weights)], "key long, w long")

    def test_exact_n_when_weights_small(self, spark):
        # every weight < W/n → exactly n rows, each hit once
        df = self._mk(spark, [5] * 400)  # W=2000, W/n=20 > 5
        out = sampling.pps_systematic_sample(df, "key", "w", n=100)
        rows = out.collect()
        assert len(rows) == 100
        assert all(r["n_hits"] == 1 for r in rows)

    def test_total_hits_is_n_and_mega_weight_absorbs(self, spark):
        # one row holds half the mass → ~n/2 points land inside it
        df = self._mk(spark, [1000] + [10] * 100)  # W=2000
        out = sampling.pps_systematic_sample(df, "key", "w", n=50)
        got = {r["key"]: r["n_hits"] for r in out.collect()}
        assert sum(got.values()) == 50
        assert got[0] == 25  # exactly W_0/W * n: 1000/2000 * 50

    def test_inclusion_proportional_to_weight(self, spark):
        # heavy stratum (w=9) vs light (w=1): expected 9:1 hit ratio
        df = self._mk(spark, [9, 1] * 500)
        out = sampling.pps_systematic_sample(df, "key", "w", n=200)
        hits = out.withColumn("_heavy", (F.col("key") % 2 == 0)) \
            .groupBy("_heavy").agg(F.sum("n_hits").alias("h")).collect()
        got = {r["_heavy"]: r["h"] for r in hits}
        # 9/10 of the axis is heavy mass; the per-class totals sit
        # within a few points of 180/20 (hash interleaving decides
        # which class absorbs each boundary point, so the split is
        # deterministic but not the exact expectation)
        assert got[True] + got[False] == 200
        assert abs(got[True] - 180) <= 5

    def test_deterministic_under_repartition(self, spark):
        df = self._mk(spark, list(range(1, 301)))
        a = sampling.pps_systematic_sample(df, "key", "w", n=40)
        b = sampling.pps_systematic_sample(
            df.repartition(13), "key", "w", n=40)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))

    def test_bucket_count_invariance(self, spark):
        # the two-phase split is an implementation detail: any bucket
        # count must select the same rows (the axis order is global)
        df = self._mk(spark, [3, 7, 11] * 100)
        a = sampling.pps_systematic_sample(df, "key", "w", n=30, buckets=1)
        b = sampling.pps_systematic_sample(df, "key", "w", n=30, buckets=256)
        c = sampling.pps_systematic_sample(df, "key", "w", n=30, buckets=7)
        ra = sorted(map(tuple, a.collect()))
        assert ra == sorted(map(tuple, b.collect()))
        assert ra == sorted(map(tuple, c.collect()))

    def test_zero_weights_drop_and_all_zero_empty(self, spark):
        df = self._mk(spark, [0, 5, 0, 5])
        out = sampling.pps_systematic_sample(df, "key", "w", n=4)
        assert {r["key"] for r in out.collect()} == {1, 3}
        empty = sampling.pps_systematic_sample(
            self._mk(spark, [0, 0]), "key", "w", n=3)
        assert empty.count() == 0

    def test_negative_weight_raises(self, spark):
        df = self._mk(spark, [5, -1, 5])
        with pytest.raises(Exception, match="negative weight"):
            sampling.pps_systematic_sample(df, "key", "w", n=2).collect()

    def test_fractional_weight_type_rejected(self, spark):
        df = spark.createDataFrame([(1, 0.5)], "key long, w double")
        with pytest.raises(TypeError, match="integral weight"):
            sampling.pps_systematic_sample(df, "key", "w", n=1)


class TestBloomSemiJoin:
    def test_matches_exact_semi_join(self, spark):
        from filters_spark.functions import sketch
        big = spark.range(50_000).selectExpr("id", "id % 1000 as k")
        small = spark.range(20).selectExpr("id * 53 as k")
        exact = sorted(r["id"] for r in big.join(
            small.select("k").distinct(), "k", "left_semi").collect())
        got = sorted(r["id"] for r in sketch.bloom_semi_join(
            big, small, "k").collect())
        assert got == exact

    def test_superset_and_fpp_bound(self, spark):
        """confirm=False returns every true member plus a bounded
        false-positive fringe; a deliberately TINY filter must still
        never drop a member."""
        from filters_spark.functions import sketch
        big = spark.range(20_000).selectExpr("id", "id as k")
        small = spark.range(200).selectExpr("id * 97 as k")
        true_keys = {i * 97 for i in range(200) if i * 97 < 20_000}
        maybe = {r["k"] for r in sketch.bloom_semi_join(
            big, small, "k", n_bits=1 << 12, k=3,
            confirm=False).collect()}
        assert true_keys <= maybe            # no false negatives, ever
        fpp = (len(maybe) - len(true_keys)) / (20_000 - len(true_keys))
        assert fpp < 0.05, fpp               # (1-e^{-kn/m})^k ~ 1.7%

    def test_null_keys_and_empty_small_side(self, spark):
        from filters_spark.functions import sketch
        big = spark.createDataFrame(
            [(1, 5), (2, None), (3, 7)], "id bigint, k bigint")
        small = spark.createDataFrame([(5,)], "k bigint")
        got = sorted(r["id"] for r in sketch.bloom_semi_join(
            big, small, "k").collect())
        assert got == [1]                    # NULL key never survives
        empty = spark.createDataFrame([], "k bigint")
        assert sketch.bloom_semi_join(big, empty, "k").count() == 0


class TestTokenBudgetSample:
    def test_maximal_prefix_and_closed_list(self, spark):
        from filters_spark.functions.sampling import token_budget_sample
        from filters_spark.functions.text import token_count
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, "a" if i < 20 else "b", "w " * (i % 5 + 1))
             for i in range(40)],
            "doc_id bigint, dom string, text string").withColumn(
            "_tok", token_count(F.col("text")))
        out = token_budget_sample(df, "doc_id", "dom",
                                  {"a": 20})          # 'b' omitted
        rows = out.collect()
        assert {r["dom"] for r in rows} == {"a"}
        total = sum(r["_tok"] for r in rows)
        assert total <= 20
        # maximal prefix: adding the NEXT doc in hash order would
        # exceed the budget
        import hashlib
        sel = {r["doc_id"] for r in rows}
        ordered = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i)
            for i in range(20))
        toks = {r["doc_id"]: r["_tok"] for r in df.where(
            F.col("dom") == "a").collect()}
        cum = 0
        for _, i in ordered:
            cum += toks[i]
            if cum <= 20:
                assert i in sel
            else:
                assert i not in sel
        # deterministic across reruns
        again = {r["doc_id"] for r in token_budget_sample(
            df, "doc_id", "dom", {"a": 20}).collect()}
        assert again == sel

    def test_zero_and_tiny_budgets(self, spark):
        from filters_spark.functions.sampling import token_budget_sample
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "a", 5), (2, "a", 5)],
            "doc_id bigint, dom string, _tok bigint")
        assert token_budget_sample(df, "doc_id", "dom",
                                   {"a": 0}).count() == 0
        assert token_budget_sample(df, "doc_id", "dom",
                                   {"a": 4}).count() == 0
        assert token_budget_sample(df, "doc_id", "dom",
                                   {"a": 5}).count() == 1
        import pytest as _pt
        with _pt.raises(ValueError, match="budget"):
            token_budget_sample(df, "doc_id", "dom", {"a": -1})

    def test_bucketed_identical_to_single_window(self, spark):
        # the r10 two-phase plan must be PROVABLY identical to the
        # single-window form — not seam-tolerant: the composed
        # (bucket-offset + local prefix) is the same integer as the
        # global running sum for every row, for every bucket count
        from filters_spark.functions.sampling import token_budget_sample
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, "heavy" if i % 10 else "light", (i * 7919) % 13 + 1)
             for i in range(600)],
            "doc_id bigint, dom string, _tok bigint")
        budgets = {"heavy": 900, "light": 40}
        base = sorted(r["doc_id"] for r in token_budget_sample(
            df, "doc_id", "dom", budgets, buckets=1).collect())
        assert base  # non-degenerate: something is kept
        for b in (2, 7, 64, 256):
            got = sorted(r["doc_id"] for r in token_budget_sample(
                df, "doc_id", "dom", budgets, buckets=b).collect())
            assert got == base, f"buckets={b} diverged"
        import pytest as _pt
        with _pt.raises(ValueError, match="buckets"):
            token_budget_sample(df, "doc_id", "dom", budgets, buckets=0)
        with _pt.raises(ValueError, match="buckets"):
            token_budget_sample(df, "doc_id", "dom", budgets,
                                buckets=257)

    def test_bucketed_null_token_parity(self, spark):
        # NULL token counts: skipped by the running sum on both plans
        from filters_spark.functions.sampling import token_budget_sample

        df = spark.createDataFrame(
            [(1, "a", None), (2, "a", 5), (3, "a", None), (4, "a", 7),
             (5, "a", 3)],
            "doc_id bigint, dom string, _tok bigint")
        base = sorted(r["doc_id"] for r in token_budget_sample(
            df, "doc_id", "dom", {"a": 10}, buckets=1).collect())
        got = sorted(r["doc_id"] for r in token_budget_sample(
            df, "doc_id", "dom", {"a": 10}, buckets=16).collect())
        assert got == base


class TestTopFractionByGroup:
    def test_hand_computed(self, spark):
        from filters_spark.functions import sampling
        # group a: scores 10..1 (n=10, floor(.25*10)=2 -> t=9, keep 2)
        # group b: n=3, floor = 0 -> keep nothing
        rows = [("a", i, 100 + i) for i in range(1, 11)] + \
               [("b", i, 200 + i) for i in range(1, 4)]
        df = spark.createDataFrame(rows, "g string, s bigint, id bigint")
        kept = sampling.top_fraction_by_group(df, "s", "g", 0.25)
        got = sorted((r["g"], r["s"]) for r in kept.collect())
        assert got == [("a", 9), ("a", 10)]
        assert kept.collect()[0]["_threshold"] == 9

    def test_threshold_tie_rule(self, spark):
        from filters_spark.functions import sampling
        # ties at the boundary: scores [5,5,5,1] frac=0.5 ->
        # floor = 2, but score 5 has ctop 3 > 2 -> only scores with
        # ctop <= 2 qualify: none except... min over empty = NULL ->
        # nothing kept (ties either all qualify or none do)
        df = spark.createDataFrame(
            [("a", 5), ("a", 5), ("a", 5), ("a", 1)], "g string, s bigint")
        kept = sampling.top_fraction_by_group(df, "s", "g", 0.5)
        assert kept.count() == 0
        # whereas frac=0.75 -> floor 3 -> all three 5s kept
        kept2 = sampling.top_fraction_by_group(df, "s", "g", 0.75)
        assert sorted(r["s"] for r in kept2.collect()) == [5, 5, 5]

    def test_null_scores_and_partition_invariance(self, spark):
        from filters_spark.functions import sampling
        rows = [("a", i) for i in range(1, 101)]
        df = spark.createDataFrame(rows, "g string, s bigint")
        df = df.unionByName(spark.createDataFrame(
            [("a", None)], "g string, s bigint"))
        k1 = sorted(r["s"] for r in sampling.top_fraction_by_group(
            df, "s", "g", 0.25).collect())
        k2 = sorted(r["s"] for r in sampling.top_fraction_by_group(
            df.repartition(13), "s", "g", 0.25).collect())
        assert k1 == k2 == list(range(76, 101))

    def test_null_group_is_its_own_group(self, spark):
        """r10 ADVICE: a NULL domain is a real group — its rows must
        be selected within it, not silently dropped by a null-unsafe
        join."""
        from filters_spark.functions import sampling
        rows = ([("a", i) for i in range(1, 11)]
                + [(None, i) for i in range(1, 11)])
        df = spark.createDataFrame(rows, "g string, s bigint")
        kept = sampling.top_fraction_by_group(df, "s", "g", 0.25)
        got = sorted([(r["g"], r["s"]) for r in kept.collect()],
                     key=lambda t: (t[0] or "", t[1]))
        assert got == [(None, 9), (None, 10), ("a", 9), ("a", 10)]
