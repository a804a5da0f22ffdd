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
