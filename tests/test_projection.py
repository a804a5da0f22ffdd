"""Embedding projections (functions.projection): JL random
projection, exact distributed covariance, and the driver-side PCA
half — the invariants a DuckDB oracle cannot express (eigenvector
properties) pinned here, the covariance half hash-gated by
prof_covariance."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from filters_spark.functions import projection as P


@pytest.fixture(scope="module")
def vectors(spark):
    """60 deterministic 12-dim vectors with correlated structure
    (dims 0/1 strongly correlated, dim 2 anti-correlated) so PCA has
    a non-degenerate answer to find."""
    rows = []
    for i in range(60):
        base = math.sin(i * 0.7)
        vec = [base + 0.01 * ((i * 7 + d) % 5 - 2) for d in (0, 1)]
        vec.append(-base + 0.02 * (i % 3 - 1))
        vec.extend(0.1 * math.cos(i * 0.3 + d) for d in range(3, 12))
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_matrix(df):
    rows = df.orderBy("vec_id").select("embedding").collect()
    return np.array([list(r[0]) for r in rows], dtype="float64")


def _np_micro(X):
    # round-half-away-from-zero, the engines' shared quantization
    return np.where(X >= 0, np.floor(X * 1e6 + 0.5),
                    -np.floor(-X * 1e6 + 0.5)).astype("int64")


class TestRandomProjection:
    def test_matches_numpy_replay_exactly(self, spark, vectors):
        out = P.random_projection(vectors, out_dim=5, seed=3, dim=12)
        got = {r["vec_id"]: list(r["projected_q"])
               for r in out.select("vec_id", "projected_q").collect()}
        S = np.array([[P.rp_sign(3, j, i) for i in range(12)]
                      for j in range(5)], dtype="int64")
        Q = _np_micro(_np_matrix(vectors))
        for vid, q in enumerate(Q):
            assert got[vid] == list(S @ q)

    def test_linearity_exact(self, spark):
        """proj(a) + proj(b) == proj(a+b) when inputs are already
        micro-exact — integer arithmetic has no accumulation error."""
        a = [0.25, -0.5, 0.125, 1.0]
        b = [0.5, 0.25, -1.0, 0.125]
        df = spark.createDataFrame(
            [(0, a), (1, b), (2, [x + y for x, y in zip(a, b)])],
            "vec_id long, embedding array<float>")
        rows = {r["vec_id"]: list(r["projected_q"])
                for r in P.random_projection(df, out_dim=4, seed=1, dim=4)
                .select("vec_id", "projected_q").collect()}
        assert [x + y for x, y in zip(rows[0], rows[1])] == rows[2]

    def test_zero_shuffle_plan(self, spark, vectors):
        out = P.random_projection(vectors, out_dim=5, seed=0, dim=12)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_float_view_is_micro_over_1e6(self, spark, vectors):
        r = (P.random_projection(vectors, out_dim=3, seed=0, dim=12)
             .select("projected_q", "projected").first())
        assert list(r["projected"]) == [q / 1e6 for q in r["projected_q"]]

    def test_distance_preservation_trend(self, spark, vectors):
        """JL sanity (statistical, not exact): projected squared
        distances correlate strongly with true squared distances."""
        out = P.random_projection(vectors, out_dim=8, seed=0, dim=12)
        X = _np_matrix(vectors)
        Prows = out.orderBy("vec_id").select("projected").collect()
        Y = np.array([list(r[0]) for r in Prows])
        dx, dy = [], []
        for i in range(0, 40, 3):
            for j in range(i + 1, 40, 7):
                dx.append(((X[i] - X[j]) ** 2).sum())
                dy.append(((Y[i] - Y[j]) ** 2).sum())
        assert np.corrcoef(dx, dy)[0, 1] > 0.8

    def test_sign_matrix_is_balanced(self):
        """The md5-derived matrix is roughly half +1 (a degenerate
        all-ones matrix would collapse every output dim to the same
        projection)."""
        signs = [P.rp_sign(0, j, i) for j in range(8) for i in range(64)]
        pos = sum(1 for s in signs if s > 0)
        assert 0.35 * len(signs) < pos < 0.65 * len(signs)


class TestCovariancePairs:
    def test_expr_matches_numpy_exactly(self, spark, vectors):
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        Q = _np_micro(_np_matrix(vectors))
        G = Q.T @ Q
        S = Q.sum(axis=0)
        n = Q.shape[0]
        rows = cov.collect()
        assert len(rows) == 12 * 13 // 2
        for r in rows:
            i, j = r["i"], r["j"]
            assert i <= j
            assert r["n"] == n
            assert int(r["sxy"]) == G[i, j]
            assert int(r["sxi"]) == S[i]
            assert int(r["sxj"]) == S[j]
            assert int(r["cov_num"]) == n * G[i, j] - S[i] * S[j]

    def test_arrow_engine_identical(self, spark, vectors):
        key = lambda r: (r["i"], r["j"])  # noqa: E731
        canon = lambda rs: {  # noqa: E731
            key(r): (r["n"], int(r["sxy"]), int(r["sxi"]),
                     int(r["sxj"]), int(r["cov_num"])) for r in rs}
        e = canon(P.covariance_pairs(vectors, dim=12, engine="expr").collect())
        a = canon(P.covariance_pairs(
            vectors.repartition(5), dim=12, engine="arrow").collect())
        assert e == a

    def test_partitioning_invariance(self, spark, vectors):
        canon = lambda rs: sorted(  # noqa: E731
            (r["i"], r["j"], int(r["cov_num"])) for r in rs)
        one = canon(P.covariance_pairs(
            vectors.coalesce(1), dim=12, engine="expr").collect())
        many = canon(P.covariance_pairs(
            vectors.repartition(7), dim=12, engine="expr").collect())
        assert one == many

    def test_bad_engine_raises(self, spark, vectors):
        with pytest.raises(ValueError, match="engine"):
            P.covariance_pairs(vectors, dim=12, engine="pandas")

    def test_null_vectors_dropped_identically(self, spark, vectors):
        """A NULL embedding row must vanish from n AND the sums in
        BOTH engines (r5 ADVICE: expr counted it in n, arrow turned
        it into int64 garbage) — result equals the clean frame's."""
        withnull = vectors.unionByName(spark.createDataFrame(
            [(999, None)], vectors.schema))
        canon = lambda rs: {  # noqa: E731
            (r["i"], r["j"]): (r["n"], int(r["sxy"]), int(r["cov_num"]))
            for r in rs}
        clean = canon(P.covariance_pairs(
            vectors, dim=12, engine="expr").collect())
        for eng in ("expr", "arrow"):
            got = canon(P.covariance_pairs(
                withnull, dim=12, engine=eng).collect())
            assert got == clean

    def test_nan_component_raises_arrow(self, spark, vectors):
        """A null COMPONENT inside a non-null vector is refused by the
        arrow engine rather than silently corrupting the Gram sums."""
        bad = vectors.unionByName(spark.createDataFrame(
            [(999, [None] + [0.0] * 11)],
            "vec_id long, embedding array<float>"))
        with pytest.raises(Exception, match="[Nn]a[Nn]"):
            P.covariance_pairs(bad, dim=12, engine="arrow").collect()


class TestPCA:
    def test_components_orthonormal_descending(self, spark, vectors):
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        comps, eig = P.pca_components(cov, dim=12, k=4)
        C = np.array(comps)
        assert np.allclose(C @ C.T, np.eye(4), atol=1e-9)
        assert eig == sorted(eig, reverse=True)
        assert eig[-1] >= -1e-12  # covariance is PSD

    def test_sign_convention_deterministic(self, spark, vectors):
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        comps, _ = P.pca_components(cov, dim=12, k=4)
        for comp in comps:
            arr = np.array(comp)
            assert arr[int(np.argmax(np.abs(arr)))] > 0

    def test_first_component_captures_planted_structure(self, spark, vectors):
        """Dims 0/1/2 carry the dominant correlated signal; the top
        axis must live there, with 0 and 1 aligned and 2 opposed."""
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        comps, eig = P.pca_components(cov, dim=12, k=2)
        c0 = np.array(comps[0])
        assert (np.abs(c0[:3]) ** 2).sum() > 0.9
        assert c0[0] * c0[1] > 0 and c0[0] * c0[2] < 0
        assert eig[0] > 3 * eig[1]

    def test_projected_variance_matches_eigenvalues(self, spark, vectors):
        """Variance of centered data along each axis equals its
        eigenvalue (the PCA identity, population form)."""
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        comps, eig = P.pca_components(cov, dim=12, k=3)
        X = _np_matrix(vectors)
        Y = (X - X.mean(axis=0)) @ np.array(comps).T
        got = (Y ** 2).mean(axis=0)
        # quantization perturbs at the 1e-6 level; tolerance well above
        assert np.allclose(got, eig, rtol=1e-3, atol=1e-9)

    def test_project_plan_is_pure_map(self, spark, vectors):
        cov = P.covariance_pairs(vectors, dim=12, engine="expr")
        comps, _ = P.pca_components(cov, dim=12, k=3)
        out = P.pca_project(vectors, comps)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert len(out.first()["pca"]) == 3

    def test_grouped_frame_refused(self, spark, vectors):
        """pca_components on a covariance_pairs(by=...) frame would
        silently overwrite C cells across groups (r5 ADVICE) — it
        must raise and point at pca_components_by."""
        grouped = P.covariance_pairs(
            vectors.withColumn("g", F.col("vec_id") % 2),
            dim=4, engine="expr", by=["g"])
        with pytest.raises(ValueError, match="pca_components_by"):
            P.pca_components(grouped, dim=4, k=2)

    def test_empty_input_raises(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>")
        cov = P.covariance_pairs(empty, dim=4, engine="expr")
        with pytest.raises(ValueError, match="no rows"):
            P.pca_components(cov, dim=4, k=2)


class TestHashingVectorize:
    """Feature-hashing vectorizer (text.hashing_vectorize) — the
    no-model featurizer feeding the similarity stack."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(0, "apple banana apple"),
             (1, "banana cherry"),
             (2, "apple apple apple apple"),
             (3, ""),
             (4, "  "),  # empty tokens only
             ],
            "doc_id long, text string")

    def _hashlib_bucket_sign(self, tok, dim):
        import hashlib
        h = hashlib.md5(tok.encode()).hexdigest()
        return int(h[:8], 16) % dim, 1 if int(h[8], 16) % 2 == 0 else -1

    def test_matches_hashlib_replay(self, spark, docs):
        from filters_spark.functions import text as T
        got = {(r["doc_id"], r["bucket"]): r["weight"]
               for r in T.hashing_vectorize(docs, dim=16).collect()}
        exp = {}
        for did, txt in [(0, "apple banana apple"), (1, "banana cherry"),
                         (2, "apple apple apple apple")]:
            for tok in txt.split(" "):
                if not tok:
                    continue
                b, s = self._hashlib_bucket_sign(tok, 16)
                exp[(did, b)] = exp.get((did, b), 0) + s
        exp = {k: v for k, v in exp.items() if v != 0}
        assert got == exp

    def test_unsigned_counts(self, spark, docs):
        from filters_spark.functions import text as T
        got = {(r["doc_id"], r["bucket"]): r["weight"]
               for r in T.hashing_vectorize(docs, dim=16, signed=False)
               .collect()}
        assert sum(v for (d, _), v in got.items() if d == 2) == 4
        assert all(v > 0 for v in got.values())

    def test_empty_docs_absent(self, spark, docs):
        from filters_spark.functions import text as T
        ids = {r["doc_id"]
               for r in T.hashing_vectorize(docs, dim=16).collect()}
        assert 3 not in ids and 4 not in ids

    def test_dense_consistent_with_sparse(self, spark, docs):
        from filters_spark.functions import text as T
        dense = {r["doc_id"]: list(r["embedding"])
                 for r in T.hashing_vectors_dense(docs, dim=16).collect()}
        sparse = {}
        for r in T.hashing_vectorize(docs, dim=16).collect():
            sparse.setdefault(r["doc_id"], [0.0] * 16)
            sparse[r["doc_id"]][r["bucket"]] = float(r["weight"])
        assert dense == sparse
        assert all(len(v) == 16 for v in dense.values())

    def test_feeds_similarity_stack(self, spark, docs):
        """Dense hashed vectors compose with cosine: identical texts
        score 1.0, disjoint-vocabulary texts score 0.0."""
        from filters_spark.functions import text as T
        from filters_spark.functions import similarity as S
        pair = spark.createDataFrame(
            [(10, "apple banana"), (11, "apple banana"),
             (12, "cherry date")],
            "doc_id long, text string")
        dense = T.hashing_vectors_dense(pair, dim=32)
        a, b, c = [np.array(r["embedding"]) for r in
                   dense.orderBy("doc_id").collect()]
        cos = lambda x, y: float(  # noqa: E731
            x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
        assert cos(a, b) == pytest.approx(1.0)
        assert cos(a, c) == pytest.approx(0.0, abs=1e-12)


class TestCovarianceMerge:
    def test_merge_equals_whole(self, spark, vectors):
        """cov(A) ⊕ cov(B) == cov(A ∪ B) exactly — the O(delta)
        incremental-maintenance property."""
        a = vectors.where(F.col("vec_id") < 40)
        b = vectors.where(F.col("vec_id") >= 40)
        canon = lambda rs: {  # noqa: E731
            (r["i"], r["j"]): (r["n"], int(r["sxy"]), int(r["sxi"]),
                               int(r["sxj"]), int(r["cov_num"]))
            for r in rs}
        merged = canon(P.covariance_merge(
            P.covariance_pairs(a, dim=12, engine="expr"),
            P.covariance_pairs(b, dim=12, engine="arrow"),
        ).collect())
        whole = canon(P.covariance_pairs(
            vectors, dim=12, engine="expr").collect())
        assert merged == whole

    def test_merge_empty_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            P.covariance_merge()


class TestGroupedCovariance:
    def test_grouped_engines_identical_and_exact(self, spark, vectors):
        """by= slices: both engines agree per group, and each group's
        stats equal the ungrouped stats over that group's rows."""
        g = vectors.withColumn("grp", (F.col("vec_id") % 3).cast("int"))
        canon = lambda rs: {  # noqa: E731
            (r["grp"], r["i"], r["j"]):
            (r["n"], int(r["sxy"]), int(r["cov_num"])) for r in rs}
        e = canon(P.covariance_pairs(
            g, dim=12, engine="expr", by=["grp"]).collect())
        a = canon(P.covariance_pairs(
            g.repartition(5), dim=12, engine="arrow", by=["grp"]).collect())
        assert e == a
        assert len(e) == 3 * 12 * 13 // 2
        for grp in range(3):
            solo = P.covariance_pairs(
                g.where(F.col("grp") == grp), dim=12, engine="expr")
            for r in solo.collect():
                assert e[(grp, r["i"], r["j"])] == (
                    r["n"], int(r["sxy"]), int(r["cov_num"]))

    def test_grouped_merge(self, spark, vectors):
        """covariance_merge(by=) reassembles per-group stats from
        row-disjoint parts exactly."""
        g = vectors.withColumn("grp", (F.col("vec_id") % 2).cast("int"))
        a = g.where(F.col("vec_id") < 30)
        b = g.where(F.col("vec_id") >= 30)
        canon = lambda rs: {  # noqa: E731
            (r["grp"], r["i"], r["j"]):
            (r["n"], int(r["cov_num"])) for r in rs}
        merged = canon(P.covariance_merge(
            P.covariance_pairs(a, dim=12, engine="expr", by=["grp"]),
            P.covariance_pairs(b, dim=12, engine="arrow", by=["grp"]),
            by=["grp"]).collect())
        whole = canon(P.covariance_pairs(
            g, dim=12, engine="expr", by=["grp"]).collect())
        assert merged == whole


class TestGroupedPCA:
    def test_per_group_matches_solo(self, spark, vectors):
        g = vectors.withColumn("grp", (F.col("vec_id") % 2).cast("int"))
        cov = P.covariance_pairs(g, dim=12, engine="expr", by=["grp"])
        per = P.pca_components_by(cov, dim=12, k=2, by=["grp"])
        assert set(per) == {(0,), (1,)}
        for grp in (0, 1):
            solo_cov = P.covariance_pairs(
                g.where(F.col("grp") == grp), dim=12, engine="expr")
            comps, eig = P.pca_components(solo_cov, dim=12, k=2)
            assert per[(grp,)][0] == comps
            assert per[(grp,)][1] == eig


class TestRidgeFit:
    def _frame(self, spark, n=400, d=6, seed=3, noise=0.0):
        import numpy as np
        rng = np.random.RandomState(seed)
        X = np.round(rng.uniform(-2, 2, (n, d)), 6)
        w = np.array([1.5, -2.0, 0.25, 0.0, 3.0, -1.0][:d])
        y = X @ w + 0.75 + (noise and rng.normal(0, noise, n))
        rows = [(x.tolist(), float(v)) for x, v in zip(X, y)]
        return (spark.createDataFrame(
            rows, "embedding array<double>, label double"), w, 0.75)

    def test_exact_recovery_both_engines(self, spark):
        import numpy as np

        from filters_spark.functions import projection as P
        df, w_true, b_true = self._frame(spark)
        for eng in ("expr", "arrow"):
            fit = P.ridge_fit(df, reg=0.0, engine=eng)
            got = np.array(fit["weights"])
            # micro-quantization bounds the error at ~1e-6 relative
            assert np.abs(got - w_true).max() < 1e-5, eng
            assert abs(fit["intercept"] - b_true) < 1e-5, eng
            assert fit["n"] == 400

    def test_shrinkage_and_no_intercept(self, spark):
        import numpy as np

        from filters_spark.functions import projection as P
        df, w_true, _ = self._frame(spark)
        loose = P.ridge_fit(df, reg=0.0)
        tight = P.ridge_fit(df, reg=500.0)
        assert (np.linalg.norm(tight["weights"])
                < np.linalg.norm(loose["weights"]))
        ni = P.ridge_fit(df, reg=0.0, fit_intercept=False)
        assert ni["intercept"] == 0.0

    def test_matches_numpy_closed_form(self, spark):
        import numpy as np

        from filters_spark.functions import projection as P
        df, _, _ = self._frame(spark, noise=0.3)
        rows = df.collect()
        X = np.array([r["embedding"] for r in rows])
        y = np.array([r["label"] for r in rows])
        lam = 7.0
        Xa = np.hstack([X, np.ones((len(X), 1))])
        A = Xa.T @ Xa + lam * np.diag([1.0] * X.shape[1] + [0.0])
        ref = np.linalg.solve(A, Xa.T @ y)
        fit = P.ridge_fit(df, reg=lam)
        assert np.abs(np.array(fit["weights"]) - ref[:-1]).max() < 1e-4
        assert abs(fit["intercept"] - ref[-1]) < 1e-4

    def test_null_rows_dropped_and_empty_raises(self, spark):
        import pytest as _pt

        from filters_spark.functions import projection as P
        df = spark.createDataFrame(
            [([1.0, 2.0], 1.0), (None, 2.0), ([3.0, 4.0], None),
             ([0.5, 0.5], 0.5)],
            "embedding array<double>, label double")
        fit = P.ridge_fit(df, reg=1.0)
        assert fit["n"] == 2
        empty = spark.createDataFrame(
            [], "embedding array<double>, label double")
        with _pt.raises(ValueError, match="no non-null"):
            P.ridge_fit(empty, dim=2)

    def test_fit_then_score_roundtrip(self, spark):
        """Train -> batch-inference composition: linear_score with
        the fitted weights reproduces the labels on noiseless data."""
        from pyspark.sql import functions as F

        from filters_spark.functions import projection as P
        from filters_spark.functions import similarity as S
        df, _, _ = self._frame(spark)
        fit = P.ridge_fit(df, reg=0.0)
        scored = df.select(
            (S.linear_score(F.col("embedding"), fit["weights"],
                            fit["intercept"])
             - F.col("label")).alias("err"))
        mx = scored.agg(F.max(F.abs("err"))).first()[0]
        assert mx < 1e-4


class TestLogisticFit:
    def _data(self, spark, n=1500, seed=11):
        import numpy as np
        rng = np.random.RandomState(seed)
        X = np.round(rng.uniform(-2, 2, (n, 4)), 6)
        w = np.array([1.2, -0.8, 0.5, 2.0])
        p = 1 / (1 + np.exp(-(X @ w + -0.3)))
        y = (rng.uniform(size=n) < p).astype(float)
        df = spark.createDataFrame(
            [(x.tolist(), float(v)) for x, v in zip(X, y)],
            "embedding array<double>, label double")
        return df, X, y

    def _numpy_irls(self, X, y, reg):
        import numpy as np
        n, d = X.shape
        Xa = np.hstack([X, np.ones((n, 1))])
        beta = np.zeros(d + 1)
        for _ in range(60):
            eta = Xa @ beta
            p = 1 / (1 + np.exp(-eta))
            w = np.maximum(p * (1 - p), 1e-6)
            z = eta + (y - p) / w
            A = (Xa * w[:, None]).T @ Xa + reg * np.diag([1.0] * d + [0.0])
            nb = np.linalg.solve(A, (Xa * w[:, None]).T @ z)
            if np.abs(nb - beta).max() < 1e-10:
                return nb
            beta = nb
        return beta

    def test_matches_numpy_irls(self, spark):
        import numpy as np

        from filters_spark.functions import projection as P
        df, X, y = self._data(spark)
        fit = P.logistic_fit(df, reg=0.001, iters=12)
        ref = self._numpy_irls(X, y, 0.001)
        assert np.abs(np.array(fit["weights"]) - ref[:4]).max() < 1e-4
        assert abs(fit["intercept"] - ref[4]) < 1e-4
        assert fit["n"] == len(X)

    def test_classifies_and_regularizes(self, spark):
        import numpy as np

        from filters_spark.functions import projection as P
        df, X, y = self._data(spark)
        fit = P.logistic_fit(df, reg=0.001, iters=12)
        p = 1 / (1 + np.exp(-(X @ np.array(fit["weights"])
                              + fit["intercept"])))
        acc = ((p > 0.5) == (y > 0.5)).mean()
        # labels are Bernoulli draws from the true model, so accuracy
        # is capped by the Bayes rate of this weight vector (~0.84)
        assert acc > 0.80, acc
        # heavy ridge shrinks the separating direction
        tight = P.logistic_fit(df, reg=200.0, iters=12)
        assert (np.linalg.norm(tight["weights"])
                < np.linalg.norm(fit["weights"]))

    def test_separable_data_stays_finite(self, spark):
        """Perfect separation sends the MLE to infinity; the w-floor
        + ridge keep the solve finite and the classifier exact."""
        import numpy as np

        from filters_spark.functions import projection as P
        X = np.array([[float(i % 7) - 3.0] for i in range(200)])
        y = (X[:, 0] > 0).astype(float)
        df = spark.createDataFrame(
            [(x.tolist(), float(v)) for x, v in zip(X, y)],
            "embedding array<double>, label double")
        fit = P.logistic_fit(df, reg=0.1, iters=10)
        assert np.isfinite(fit["weights"]).all()
        p = 1 / (1 + np.exp(-(X @ np.array(fit["weights"])
                              + fit["intercept"])))
        assert (((p > 0.5) == (y > 0.5)) | (X[:, 0] == 0)).all()


class TestQualityClassifier:
    """Pin the baked coefficients of the trained quality filter
    (queries._QCLS_W/_QCLS_B) to a live refit through the engine:
    text.train_quality_classifier -> classifier_features ->
    projection.logistic_fit on the planted QUALITY_SEED.  Literal
    inputs + exact DECIMAL Gram sums + fixed iteration count make the
    fit deterministic, so the bake must reproduce to rounding."""

    def test_bake_matches_refit(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import _QCLS_B, _QCLS_W

        fit = T.train_quality_classifier(spark)
        assert fit["n"] == len(T.QUALITY_SEED)
        assert fit["iters"] == 8
        for baked, refit in zip(_QCLS_W, fit["weights"]):
            assert abs(baked - refit) < 1e-4
        assert abs(_QCLS_B - fit["intercept"]) < 1e-4

    def test_seed_perfectly_separated(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import _QCLS_B, _QCLS_W

        df = spark.createDataFrame(T.QUALITY_SEED, "text string, label int")
        scored = df.select(
            "label",
            T.quality_logit(F.col("text"), _QCLS_W, _QCLS_B).alias("logit"))
        rows = scored.collect()
        assert all((r["logit"] >= 0) == (r["label"] == 1) for r in rows)
        # decision margin: no seed doc sits inside (-1, 1) — the bake
        # rounding (6dp) cannot flip any training decision
        assert all(abs(r["logit"]) > 1.0 for r in rows)

    def test_logit_dim_guard(self, spark):
        from filters_spark.functions import text as T

        with pytest.raises(ValueError, match="expected 4 weights"):
            T.quality_logit(F.lit("x"), [1.0, 2.0], 0.0)


class TestHashedQualityClassifier:
    """Pin the hashed-feature (fastText-shape) head's baked micro
    coefficients (queries._FTQ_W_MICRO/_FTQ_B_MICRO) to a live refit,
    and the integer-exact scoring contract."""

    def test_bake_matches_refit(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import _FTQ_B_MICRO, _FTQ_W_MICRO

        fit = T.train_hashed_quality_classifier(spark)
        assert fit["iters"] == 8
        assert fit["weights_micro"] == _FTQ_W_MICRO
        assert fit["bias_micro"] == _FTQ_B_MICRO

    def test_seed_separated_with_micro_margin(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import _FTQ_B_MICRO, _FTQ_W_MICRO

        df = spark.createDataFrame(
            [(i, t, y) for i, (t, y) in enumerate(T.QUALITY_SEED)],
            "sid long, text string, label int")
        sc = T.hashed_quality_logit_micro(
            df, _FTQ_W_MICRO, _FTQ_B_MICRO, id_col="sid",
            text_col="text")
        rows = sc.join(df.select("sid", "label"), "sid").collect()
        assert len(rows) == len(T.QUALITY_SEED)
        assert all((r["logit_micro"] >= 0) == (r["label"] == 1)
                   for r in rows)
        # micro-rounding of the bake (≤ dim+1 half-units ≈ 17) is 5
        # orders under the decision margin
        assert min(abs(r["logit_micro"]) for r in rows) > 1_000_000

    def test_token_level_equals_vector_dot(self, spark):
        # Σ_t s_t·w[b(t)] must equal the dense-vector integer dot —
        # the algebraic identity the docstring claims
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import _FTQ_B_MICRO, _FTQ_W_MICRO

        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(T.QUALITY_SEED)],
            "sid long, text string")
        tok = {r["sid"]: r["logit_micro"]
               for r in T.hashed_quality_logit_micro(
                   df, _FTQ_W_MICRO, _FTQ_B_MICRO, id_col="sid",
                   text_col="text").collect()}
        dense = T.hashing_vectors_dense(df, "sid", "text", dim=32,
                                        out_col="v").collect()
        for r in dense:
            dot = sum(int(c) * w for c, w in zip(r["v"], _FTQ_W_MICRO))
            assert tok[r["sid"]] == dot + _FTQ_B_MICRO


class TestLangId:
    """Pin the baked LID head (queries._LID_W_MICRO/_LID_B_MICRO) to
    a live refit through the engine (text.train_lang_id: hashed
    char-bigram features -> 5 one-vs-rest IRLS heads), plus the
    held-out generalization the gate relies on and the decision
    margins that make the micro-unit bake rounding provably unable to
    flip any prediction."""

    def test_bake_matches_refit(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import (_LID_B_MICRO,
                                                 _LID_W_MICRO)

        m = T.train_lang_id(spark)
        assert m["langs"] == sorted(_LID_W_MICRO)
        assert m["weights_micro"] == _LID_W_MICRO
        assert m["bias_micro"] == _LID_B_MICRO

    def test_train_and_heldout_predictions(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import (_LID_B_MICRO,
                                                 _LID_SNIPPETS,
                                                 _LID_W_MICRO)

        both = [(t, lg) for t, lg in T.LANG_ID_SEED] \
            + [(t, lg) for lg, t in _LID_SNIPPETS]
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(both)],
            "doc_id long, text string")
        scored = {r["doc_id"]: r for r in T.lang_id_scores(
            df, _LID_W_MICRO, _LID_B_MICRO).collect()}
        langs = sorted(_LID_W_MICRO)
        for i, (t, want) in enumerate(both):
            r = scored[i]
            assert r["lang_pred"] == want, (t, r["lang_pred"])
            # decision margin: best beats every other head by far
            # more than the bake rounding bound (<= 0.5 micro per
            # n-gram occurrence, so ~len(t) micro per head pair)
            others = [r[f"logit_{lg}"] for lg in langs if lg != want]
            assert r[f"logit_{want}"] - max(others) > 4 * len(t)

    def test_short_and_empty_text(self, spark):
        from filters_spark.functions import text as T
        from filters_spark.plans.queries import (_LID_B_MICRO,
                                                 _LID_W_MICRO)

        df = spark.createDataFrame(
            [(1, ""), (2, "a"), (3, None), (4, "ab")],
            "doc_id long, text string")
        out = {r["doc_id"]: r["lang_pred"] for r in T.lang_id_scores(
            df, _LID_W_MICRO, _LID_B_MICRO).collect()}
        # < n chars (or null): no n-grams -> absent by contract
        assert set(out) == {4}


class TestOpq:
    def test_rotation_orthogonal_and_balanced(self, spark):
        import numpy as np
        from filters_spark.functions import projection
        from filters_spark.sources import load_table
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001") \
            .select("vec_id", F.slice("embedding", 1, 16)
                    .alias("embedding"))
        R = projection.opq_rotation(emb, m=4, dim=16)
        M = np.array(R)
        assert M.shape == (16, 16)
        # orthogonal up to the 9-dp literal rounding
        assert np.abs(M @ M.T - np.eye(16)).max() < 1e-6
        # balanced allocation: every subspace holds exactly dim/m axes
        # (structural — the row list is subspace-major by contract)
        assert len(R) == 16

    def test_bake_equals_refit(self, spark):
        """The _OPQ_R16 literals in the gate ARE what the engine
        trains on the gate's own corpus (the LID bake discipline)."""
        import numpy as np
        from filters_spark.functions import projection
        from filters_spark.plans.queries import _OPQ_R16
        from filters_spark.sources import load_table
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.01") \
            .select("vec_id", F.slice("embedding", 1, 16)
                    .alias("embedding"))
        R = projection.opq_rotation(emb, m=2, dim=16)
        assert np.allclose(np.array(R), np.array(_OPQ_R16), atol=1e-9)

    def test_rotation_preserves_distances(self, spark):
        """Orthogonal rotation preserves L2 — ADC over rotated
        vectors approximates the SAME metric (the OPQ soundness
        property)."""
        import numpy as np
        from filters_spark.plans.queries import _OPQ_R16
        rng = np.random.RandomState(3)
        M = np.array(_OPQ_R16)
        a, b = rng.randn(16), rng.randn(16)
        d0 = float(np.sum((a - b) ** 2))
        d1 = float(np.sum((M @ a - M @ b) ** 2))
        assert abs(d0 - d1) < 1e-6 * max(d0, 1.0)

    def test_opq_quantization_error_vs_plain(self, spark):
        """Parametric OPQ's objective: rotated-PQ reconstruction
        error should not exceed plain PQ's by more than noise (and
        typically improves it when dimensions correlate)."""
        import numpy as np
        from filters_spark.functions import projection, similarity
        from filters_spark.sources import load_table
        emb = load_table(spark, "embeddings", "/root/testdata/sf0.001") \
            .select("vec_id", F.slice("embedding", 1, 16)
                    .alias("embedding"))

        def err(frame):
            books = similarity.pq_train(frame, m=2, k=8, iters=1,
                                        dim=16)
            codes = similarity.pq_encode(frame, books)
            j = frame.select("vec_id", "embedding").join(
                codes.select("vec_id", "codes"), "vec_id")
            total = 0.0
            rows = j.select("embedding", "codes").collect()
            for r in rows:
                v = np.array(r["embedding"], dtype="float64")
                rec = np.concatenate([
                    np.array(books[s][r["codes"][s]])
                    for s in range(2)])
                total += float(np.sum((v - rec) ** 2))
            return total

        plain = err(emb)
        R = projection.opq_rotation(emb, m=2, dim=16)
        rot = projection.pca_project(
            emb, R, vec_col="embedding", out_col="rv").select(
            "vec_id", F.col("rv").alias("embedding"))
        rotated = err(rot)
        assert rotated <= plain * 1.10, (rotated, plain)


class TestLangSegments:
    def test_mixture_rollup(self, spark):
        from filters_spark.functions import text
        from filters_spark.plans.queries import (_LID_B_MICRO,
                                                 _LID_W_MICRO,
                                                 _LID_SNIPPETS)
        snips = dict()
        for lg, t in _LID_SNIPPETS:
            snips.setdefault(lg, t)
        rows = [
            (1, snips["en"] + "\n" + snips["de"]),           # mixed
            (2, snips["en"] + "\n" + snips["en"]),           # pure
            (3, snips["fr"] + "\n" + snips["de"] + "\n"
                + snips["fr"]),                              # fr wins
            (4, snips["zh"]),                                # single
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in text.lang_segments(
            df, _LID_W_MICRO, _LID_B_MICRO).collect()}
        assert got[1]["is_mixed"] and got[1]["n_langs"] == 2
        # 1-1 tie breaks to the lexicographically first language
        assert got[1]["dominant_lang"] == "de"
        assert not got[2]["is_mixed"] and got[2]["dominant_lang"] == "en"
        assert got[2]["dominant_segments"] == 2
        assert got[3]["dominant_lang"] == "fr"
        assert got[3]["dominant_segments"] == 2
        assert got[3]["n_segments"] == 3 and got[3]["n_langs"] == 2
        assert got[4]["n_segments"] == 1 and not got[4]["is_mixed"]

    def test_empty_segments_skipped(self, spark):
        from filters_spark.functions import text
        from filters_spark.plans.queries import (_LID_B_MICRO,
                                                 _LID_W_MICRO,
                                                 _LID_SNIPPETS)
        t = _LID_SNIPPETS[3][1]          # an english snippet
        df = spark.createDataFrame(
            [(1, "\n\n" + t + "\n\n\n" + t + "\n")],
            "doc_id bigint, text string")
        got = text.lang_segments(df, _LID_W_MICRO,
                                 _LID_B_MICRO).collect()[0]
        assert got["n_segments"] == 2 and got["dominant_lang"] == "en"
