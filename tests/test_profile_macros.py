"""Profiling, macro recipes, extension registry, arrow cosine engine."""

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.functions import profile, similarity
from tests.conftest import assert_errors, assert_passes


class TestProfile:
    def test_one_pass_profile(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b")], "k bigint, s string"
        )
        p = {r["column"]: r for r in profile.profile(df, exact_distinct=True).collect()}
        assert p["k"]["n_rows"] == 3
        assert p["k"]["n_nulls"] == 0
        assert p["k"]["n_distinct"] == 2
        assert p["s"]["n_nulls"] == 1
        assert p["s"]["min"] == "a" and p["s"]["max"] == "b"

    def test_null_report(self, spark):
        df = spark.createDataFrame([(1, None), (2, "x")], "k bigint, s string")
        r = {x["column"]: x["null_frac"] for x in profile.null_report(df).collect()}
        assert r == {"k": 0.0, "s": 0.5}

    def test_single_job(self, spark):
        """Profile must be ONE aggregate pass, not a job per column."""
        df = spark.createDataFrame([(1, "a")], "k bigint, s string")
        plan = profile.profile(df)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 1


class TestMacros:
    def test_email_happy(self, spark):
        assert_passes(spark, fs.ext.email, "  John.Doe@Example.COM ",
                      "john.doe@example.com")

    def test_email_bad(self, spark):
        assert_errors(spark, fs.ext.email, "not-an-email", "not_email")

    def test_url(self, spark):
        assert_passes(spark, fs.ext.url, "https://x.org/a?b=1", "https://x.org/a?b=1")
        assert_errors(spark, fs.ext.url, "ftp://x.org", "not_url")

    def test_slug(self, spark):
        assert_passes(spark, fs.ext.slug, "My-Post", "my-post")
        assert_errors(spark, fs.ext.slug, "no spaces!", "not_slug")

    def test_registry_lists_and_composes(self, spark):
        assert "email" in fs.ext.names()
        chain = fs.Required("chars") | fs.ext.email
        assert_errors(spark, chain, None, "empty")

    def test_unknown_extension_raises(self):
        with pytest.raises(AttributeError, match="no extension validator"):
            fs.ext.nope


class TestArrowCosine:
    def test_arrow_matches_expr_topk_sets(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        vecs = rng.randn(40, 16).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)],
            "vec_id bigint, embedding array<float>",
        )
        q = df.where(F.col("vec_id") < 3)
        a = similarity.cosine_topk(df, q, k=5, engine="expr")
        b = similarity.cosine_topk(df, q, k=5, engine="arrow")
        sa = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in a.collect()}
        sb = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in b.collect()}
        assert sa == sb  # same neighbors, same ranks (scores may differ in ulps)


class TestIvf:
    def test_ivf_exact_when_probing_all_cells(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        vecs = rng.randn(30, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]], i % 3) for i in range(30)],
            "vec_id bigint, embedding array<float>, label int",
        )
        q = df.where(F.col("vec_id") == 0)
        exact = similarity.cosine_topk(df, q, k=5)
        ivf = similarity.ivf_topk(df, q, k=5, nprobe=3, cell_col="label")
        se = [(r["neighbor_id"], r["rank"]) for r in
              sorted(exact.collect(), key=lambda r: r["rank"])]
        si = [(r["neighbor_id"], r["rank"]) for r in
              sorted(ivf.collect(), key=lambda r: r["rank"])]
        assert se == si  # probing every cell == exact

    def test_ivf_partial_probe_subset_of_exact_space(self, spark):
        import numpy as np

        rng = np.random.RandomState(4)
        vecs = rng.randn(40, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]], i % 4) for i in range(40)],
            "vec_id bigint, embedding array<float>, label int",
        )
        q = df.where(F.col("vec_id") == 1)
        out = similarity.ivf_topk(df, q, k=5, nprobe=2, cell_col="label")
        rows = out.collect()
        assert 0 < len(rows) <= 5
        assert all(r["query_id"] == 1 for r in rows)

class TestIvfIndex:
    def test_index_probe_matches_inmemory_and_prunes(self, spark, tmp_path):
        """materialize_ivf_index + ivf_topk_from_index must return the
        same (query, neighbor, rank) sets as the in-memory ivf_topk
        over the same cells, read ONLY the probed cells' partitions
        (PartitionFilters in the scan), and never grow the cache on
        re-execution (the query set rides the bounded scoped-persist
        LRU; the index side is never persisted)."""
        import numpy as np

        rng = np.random.RandomState(7)
        vecs = rng.randn(60, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]], i % 5) for i in range(60)],
            "vec_id bigint, embedding array<float>, label int",
        )
        path = str(tmp_path / "ivf")
        similarity.materialize_ivf_index(df, path, cell_col="label")
        q = df.where(F.col("vec_id").isin(0, 1))
        mem = similarity.ivf_topk(df, q, k=5, nprobe=2, cell_col="label")
        idx = similarity.ivf_topk_from_index(spark, path, q, k=5, nprobe=2)
        sm = {(r["query_id"], r["neighbor_id"], r["rank"])
              for r in mem.collect()}
        si = {(r["query_id"], r["neighbor_id"], r["rank"])
              for r in idx.collect()}
        assert sm == si
        # pruned read: the vectors scan must touch ONLY the probed
        # cells' directories (the probe reads explicit cell paths, so
        # input files are a strict subset of the index)
        fresh = similarity.ivf_topk_from_index(spark, path, q, k=5,
                                               nprobe=2)
        probed_dirs = {f.rsplit("/", 1)[0] for f in fresh.inputFiles()
                       if "/vectors/" in f}
        all_dirs = {f.rsplit("/", 1)[0]
                    for f in spark.read.parquet(f"{path}/vectors")
                    .inputFiles()}
        assert probed_dirs and probed_dirs < all_dirs, (probed_dirs,
                                                        all_dirs)
        # no leaked cache
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        idx.count()
        assert jsc.getPersistentRDDs().size() == before

class TestExpectations:
    def test_each_check_detects_violations(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame(
            [(1, "O", 10.0, 100), (1, "F", -5.0, 200),   # dup key, neg price
             (2, None, 30.0, 999), (3, "X", 40.0, None)],  # null, bad status, null fk
            "k bigint, status string, price double, cust bigint")
        dim = spark.createDataFrame([(100,), (200,)], "c bigint")
        rep = {r["expectation"]: (r["passed"], r["observed"])
               for r in ex.report(
                   ex.expect_unique(df, ["k"]),
                   ex.expect_non_null(df, "status"),
                   ex.expect_values_in(df, "status", ["O", "F"]),
                   ex.expect_range(df, "price", lo=0.0),
                   ex.expect_foreign_key(df, "cust", dim, "c"),
                   ex.expect_row_count_between(df, 1, 3),
               ).collect()}
        assert rep["unique(k)"] == (False, 1)
        assert rep["non_null(status)"] == (False, 1)
        assert rep["values_in(status)"] == (False, 1)   # 'X'; NULL not counted
        assert rep["range(price)"] == (False, 1)
        assert rep["fk(cust)"] == (False, 1)            # 999; NULL fk exempt
        assert rep["row_count[1,3]"] == (False, 4)

    def test_all_pass_on_clean_table(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame(
            [(1, "O", 10.0), (2, "F", 20.0)], "k bigint, s string, p double")
        rep = ex.report(
            ex.expect_unique(df, ["k"]),
            ex.expect_non_null(df, "s"),
            ex.expect_values_in(df, "s", ["O", "F"]),
            ex.expect_range(df, "p", lo=0.0, hi=100.0),
            ex.expect_row_count_between(df, 1, 10),
        )
        assert all(r["passed"] for r in rep.collect())

    def test_null_tuples_compare_equal_in_unique(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame([(None, 1), (None, 1), (None, 2)],
                                   "a int, b int")
        r = ex.expect_unique(df, ["a", "b"]).head()
        assert (r["passed"], r["observed"]) == (False, 1)  # (NULL,1) twice

    def test_fk_without_broadcast_hint(self, spark):
        """broadcast_dim=False must produce identical results (AQE
        picks the strategy instead of a forced broadcast — the
        fact-sized-dim escape hatch)."""
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame([(100,), (999,), (None,)], "cust bigint")
        dim = spark.createDataFrame([(100,), (200,)], "c bigint")
        a = ex.expect_foreign_key(df, "cust", dim, "c").head()
        b = ex.expect_foreign_key(df, "cust", dim, "c",
                                  broadcast_dim=False).head()
        assert (a["passed"], a["observed"]) == (b["passed"], b["observed"]) \
            == (False, 1)

    def test_freshness_wall_clock_free(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame(
            [("2024-01-01 00:00:00",), ("2024-01-03 00:00:00",)],
            "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
        fresh = ex.expect_freshness(df, "ts", 48, "2024-01-04 00:00:00").head()
        assert (fresh["passed"], fresh["observed"]) == (True, 24)
        stale = ex.expect_freshness(df, "ts", 12, "2024-01-04 00:00:00").head()
        assert (stale["passed"], stale["observed"]) == (False, 24)
        empty = ex.expect_freshness(df.where(F.lit(False)), "ts", 12,
                                    "2024-01-04 00:00:00").head()
        assert (empty["passed"], empty["observed"]) == (False, 13)

    def test_distribution_contract_exact_integers(self, spark):
        from filters_spark.functions import expectations as ex
        rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
        df = spark.createDataFrame(rows, "g string")
        # exact match: TV = 0
        r = ex.expect_distribution(df, "g",
                                   {"a": 0.5, "b": 0.3, "c": 0.2},
                                   tolerance=0.01).head()
        assert (r["passed"], r["observed"]) == (True, 0)
        # shifted target: TV = 0.1 > 5% tolerance -> fail; observed is
        # an exact integer (sum |n*1e6 - p_micro*N| = 2*TV*N*1e6)
        r2 = ex.expect_distribution(df, "g",
                                    {"a": 0.4, "b": 0.4, "c": 0.2},
                                    tolerance=0.05).head()
        assert r2["passed"] is False
        assert r2["observed"] == 20_000_000  # |50-40|+|30-40| in micro*N
        assert r2["threshold"] == 10_000_000
        # novel category counts at full weight
        r3 = ex.expect_distribution(df, "g", {"a": 0.5, "b": 0.5},
                                    tolerance=0.05).head()
        assert r3["passed"] is False

    def test_distribution_bool_categories_one_canonical_repr(self, spark):
        """Python str(True)='True' vs Spark cast 'true' must NOT
        double-count: a conforming bool column passes (the ADVICE r4
        phantom-zero-row hazard)."""
        from filters_spark.functions import expectations as ex
        rows = [(True,)] * 70 + [(False,)] * 30
        df = spark.createDataFrame(rows, "flag boolean")
        r = ex.expect_distribution(df, "flag", {True: 0.7, False: 0.3},
                                   tolerance=0.01).head()
        assert (r["passed"], r["observed"]) == (True, 0)
        shifted = ex.expect_distribution(df, "flag",
                                         {True: 0.5, False: 0.5},
                                         tolerance=0.05).head()
        assert shifted["passed"] is False
        assert shifted["observed"] == 40_000_000  # 2*TV(0.2)*100*1e6

    def test_distribution_high_cardinality_no_global_window(self, spark):
        """A near-unique column must degrade to an ordinary aggregate
        (every distinct value novel at weight 1/N -> TV ~ 1) and the
        plan must carry NO window over a global partition."""
        from filters_spark.functions import expectations as ex
        df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
        out = ex.expect_distribution(df, "k", {"only": 1.0}, tolerance=0.1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        r = out.head()
        assert r["passed"] is False
        # every row novel (p=0, weight 1) + expected 'only' absent
        # (p=1e6 * N): sum = 5000*1e6 + 1e6*5000 = 2*N*1e6 (TV = 1)
        assert r["observed"] == 2 * 5000 * 1_000_000


class TestExpectSchema:
    def test_match_mismatch_and_extra(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame([(1, "x")], "a bigint, b string")
        ok = ex.expect_schema(df, "a bigint, b string").head()
        assert (ok["passed"], ok["observed"]) == (True, 0)
        widened = ex.expect_schema(df, "a int, b string").head()
        assert (widened["passed"], widened["observed"]) == (False, 1)
        # order-insensitive; extra columns rejected unless allowed
        reorder = ex.expect_schema(df, "b string, a bigint").head()
        assert reorder["passed"] is True
        extra = ex.expect_schema(df, "a bigint").head()
        assert (extra["passed"], extra["observed"]) == (False, 1)
        allowed = ex.expect_schema(df, "a bigint", allow_extra=True).head()
        assert allowed["passed"] is True
        missing = ex.expect_schema(df, "a bigint, b string, c date").head()
        assert (missing["passed"], missing["observed"]) == (False, 1)

    def test_composes_into_report_with_zero_jobs(self, spark):
        from filters_spark.functions import expectations as ex
        df = spark.createDataFrame([(1,)], "a bigint")
        rep = ex.report(ex.expect_schema(df, "a bigint"),
                        ex.expect_non_null(df, "a"))
        got = {r["expectation"]: r["passed"] for r in rep.collect()}
        assert got == {"schema": True, "non_null(a)": True}


class TestTableDiff:
    def test_multiset_diff_without_keys(self, spark):
        from filters_spark.functions import profile
        a = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "x"), (2, "y")], "k bigint, v string")
        b = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "k bigint, v string")
        got = {(r["status"], r["n"]) for r in
               profile.table_diff(a, b).collect()}
        assert got == {("removed", 2), ("added", 1)}

    def test_keyed_diff_classifies_changes(self, spark):
        from filters_spark.functions import profile
        a = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "k bigint, v string")
        b = spark.createDataFrame(
            [(1, "x"), (2, "CHANGED"), (4, "w")], "k bigint, v string")
        got = {}
        for r in profile.table_diff(a, b, key_cols=["k"]).collect():
            got[r["status"]] = got.get(r["status"], 0) + r["n"]
        assert got == {"removed": 1, "changed": 1, "added": 1}

    def test_null_vs_literal_null_string_distinct(self, spark):
        """A NULL cell and the string 'null' must not collide (the
        sentinel discipline concat_ws-skipping encodings lack)."""
        from filters_spark.functions import profile
        a = spark.createDataFrame([(1, None)], "k bigint, v string")
        b = spark.createDataFrame([(1, "null")], "k bigint, v string")
        assert profile.table_diff(a, b).count() == 2  # one removed, one added

    def test_schema_mismatch_raises(self, spark):
        import pytest as _pt
        from filters_spark.functions import profile
        a = spark.createDataFrame([(1,)], "k bigint")
        b = spark.createDataFrame([(1,)], "k int")
        with _pt.raises(ValueError, match="schemas differ"):
            profile.table_diff(a, b)

    def test_identical_tables_empty_diff(self, spark):
        from filters_spark.functions import profile
        a = spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                                  "k bigint, v string")
        assert profile.table_diff(a, a).count() == 0
        assert profile.table_diff(a, a, key_cols=["k"]).count() == 0


class TestObserveContract:
    """Single-pass contract metrics (expectations.observe_contract):
    the observation rides the job's own scan — no second pass."""

    def test_metrics_match_separate_aggregate(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions.expectations import observe_contract

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        checks = {
            "n": F.count(F.lit(1)),
            "null_qty": F.sum(
                F.when(F.col("l_quantity").isNull(), 1).otherwise(0)),
            "neg_price": F.sum(
                F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)),
            "max_disc": F.max("l_discount"),
        }
        obs_df, obs = observe_contract(li, checks)
        n_rows = obs_df.count()          # the pipeline's real action
        got = obs.get
        want = li.agg(*[c.alias(k) for k, c in checks.items()]).head()
        assert got["n"] == n_rows == want["n"]
        assert got["null_qty"] == want["null_qty"]
        assert got["neg_price"] == want["neg_price"]
        assert got["max_disc"] == want["max_disc"]

    def test_metrics_reflect_processed_rows_only(self, spark):
        """Attach AFTER a filter: the observation sees the filtered
        stream, the documented 'rows the action processed' contract."""
        from pyspark.sql import functions as F

        from filters_spark.functions.expectations import observe_contract

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        flt = li.where(F.col("l_discount") >= 0.05)
        obs_df, obs = observe_contract(
            flt, {"n": F.count(F.lit(1))}, name="filtered")
        expect = flt.count()
        obs_df.write.format("noop").mode("overwrite").save()
        assert obs.get["n"] == expect

    def test_rides_validation_pipeline(self, spark):
        """Compose with the validator surface: one action produces
        both the clean split AND its contract metrics."""
        import filters_spark as fs
        from pyspark.sql import functions as F

        from filters_spark.functions.expectations import observe_contract

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        res = fs.ValidationSchema({
            "l_discount": fs.Min(0) | fs.Max(0.05),
        }).validate(li)
        obs_df, obs = observe_contract(
            res.clean, {"n_clean": F.count(F.lit(1)),
                        "max_disc": F.max("l_discount")})
        n = obs_df.count()
        assert obs.get["n_clean"] == n
        assert obs.get["max_disc"] <= 0.05


class TestMadOutliers:
    def test_hand_computed(self, spark):
        # vals: median 3.5 (even interp), devs [2.5,1.5,1.5,0.5,0.5,
        # 3.5,6.5,96.5] -> MAD median = 2.0; k=3 -> threshold 6.0:
        # outliers are 10 (dev 6.5) and 100 (dev 96.5)
        vals = [1, 2, 2, 3, 4, 7, 10, 100]
        df = spark.createDataFrame([(v,) for v in vals], "x bigint")
        got = profile.mad_outliers(df, "x", k=3.0)
        rows = {r["x"]: r for r in got.collect()}
        assert rows[1]["_med"] == 3.5 and rows[1]["_mad"] == 2.0
        assert {v for v, r in rows.items() if r["is_outlier"]} \
            == {10, 100}

    def test_grouped_and_zero_mad(self, spark):
        rows = [("a", v) for v in [1, 2, 2, 3, 4, 7, 10, 100]] + \
               [("b", 5)] * 6 + [("b", 9)]
        df = spark.createDataFrame(rows, "g string, x bigint")
        got = profile.mad_outliers(df, "x", by=["g"], k=3.0)
        by_g = {}
        for r in got.collect():
            by_g.setdefault(r["g"], []).append(r)
        # group b: median 5, MAD 0 -> every deviating row flags (the
        # documented majority-constant caveat), constants don't
        b = {r["x"]: r["is_outlier"] for r in by_g["b"]}
        assert b == {5: False, 9: True}
        a_out = {r["x"] for r in by_g["a"] if r["is_outlier"]}
        assert a_out == {10, 100}

    def test_nulls_never_flag(self, spark):
        df = spark.createDataFrame(
            [(1,), (2,), (3,), (None,)], "x bigint")
        got = {r["x"]: r["is_outlier"]
               for r in profile.mad_outliers(df, "x").collect()}
        assert got[None] is None
        assert got[2] is False

    def test_empty(self, spark):
        df = spark.createDataFrame([], "g string, x bigint")
        assert profile.mad_outliers(df, "x", by=["g"]).count() == 0

    def test_null_group_rows_preserved(self, spark):
        """r10 ADVICE: rows whose group column is NULL must form
        their own group, not vanish through a null-unsafe join."""
        rows = ([("a", v) for v in [1, 2, 3]]
                + [(None, v) for v in [5, 5, 5, 5, 5, 5, 9]])
        df = spark.createDataFrame(rows, "g string, x bigint")
        got = profile.mad_outliers(df, "x", by=["g"], k=3.0)
        assert got.count() == len(rows)
        nullg = {r["x"]: r["is_outlier"] for r in got.collect()
                 if r["g"] is None}
        assert nullg == {5: False, 9: True}


class TestMultiProbe:
    def test_recall_gain_and_probe1_identity(self, spark):
        from filters_spark.functions import similarity
        from filters_spark.sources import load_table
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
        q = emb.where(F.col("vec_id") < 10)
        brute = {(r["query_id"], r["neighbor_id"]) for r in
                 similarity.cosine_topk(emb, q, k=10).collect()}
        single = {(r["query_id"], r["neighbor_id"]) for r in
                  similarity.lsh_topk(emb, q, k=10, n_planes=6,
                                      probes=1).collect()}
        multi = {(r["query_id"], r["neighbor_id"]) for r in
                 similarity.lsh_topk(emb, q, k=10, n_planes=6,
                                     probes=4).collect()}
        # multi-probe candidates are a superset: recall never drops
        assert len(multi & brute) >= len(single & brute)
        # and on this corpus the gain is real (measured 5 -> 16)
        assert len(multi & brute) >= len(single & brute) + 5

    def test_probe_guard(self, spark):
        from filters_spark.functions import similarity
        df = spark.createDataFrame([(1, [1.0, 0.0])],
                                   "vec_id bigint, embedding array<double>")
        with pytest.raises(ValueError, match="probes"):
            similarity.lsh_topk(df, df, n_planes=4, probes=6)


class TestWinsorize:
    def test_hand_computed(self, spark):
        # med 3.5, MAD 2.0, k=3 -> fences [-2.5, 9.5]: 10 -> 9.5,
        # 100 -> 9.5; everything else passes through
        vals = [1, 2, 2, 3, 4, 7, 10, 100]
        df = spark.createDataFrame([(v,) for v in vals], "x bigint")
        got = {r["x"]: r["x_winsorized"] for r in
               profile.winsorize(df, "x", k=3.0).collect()}
        assert got[10] == 9.5 and got[100] == 9.5
        assert got[1] == 1.0 and got[7] == 7.0

    def test_zero_mad_clamps_to_median_and_nulls(self, spark):
        df = spark.createDataFrame(
            [("b", 5)] * 6 + [("b", 9), ("b", None)],
            "g string, x bigint")
        got = {r["x"]: r["x_winsorized"] for r in
               profile.winsorize(df, "x", by=["g"], k=3.0).collect()}
        assert got[9] == 5.0 and got[5] == 5.0
        assert got[None] is None

    def test_row_count_preserved(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)],
                                   "x bigint")
        assert profile.winsorize(df, "x").count() == 100

    def test_null_group_rows_preserved(self, spark):
        rows = [("a", 1), ("a", 2), (None, 5), (None, 5), (None, 50)]
        df = spark.createDataFrame(rows, "g string, x bigint")
        got = profile.winsorize(df, "x", by=["g"], k=3.0)
        assert got.count() == len(rows)
        nullg = sorted(r["x_winsorized"] for r in got.collect()
                       if r["g"] is None)
        assert nullg == [5.0, 5.0, 5.0]       # MAD 0 clamps to median
