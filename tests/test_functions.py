"""North-star pipeline operators: dedup, similarity, text analysis
(verified against small in-memory oracles computed in Python)."""

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from filters_spark.functions import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "a"),
        (1, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 0
        (2, "completely different words entirely here now", "a"),
        (3, "the quick brown fox jumps over the lazy dog", "b"),  # exact dup of 0
        (4, "one two three four five six seven eight nine", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, src string")


class TestExactDedup:
    def test_content_dedup_keeps_first(self, spark, docs):
        out = dedup.exact_dedup(docs, [], ["doc_id"], content_col="text")
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [0, 1, 2, 4]  # doc 3 is the duplicate, doc 0 kept

    def test_key_dedup_deterministic(self, spark, docs):
        out = dedup.exact_dedup(docs, ["src"], [F.col("doc_id").desc()])
        kept = {r["src"]: r["doc_id"] for r in out.collect()}
        assert kept == {"a": 2, "b": 4}


class TestShinglesAndMinhash:
    def test_word_shingles(self, spark):
        df = spark.createDataFrame([("a b c d",)], "t string")
        [row] = df.select(dedup.word_shingles(F.col("t"), 3).alias("s")).collect()
        assert row["s"] == ["a b c", "b c d"]

    def test_signature_matches_python_oracle(self, spark):
        df = spark.createDataFrame([("a b c d",)], "t string")
        [row] = df.select(
            dedup.minhash_signature(dedup.word_shingles(F.col("t"), 3), 4).alias("sig")
        ).collect()
        shingles = ["a b c", "b c d"]
        expected = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in shingles)
            for i in range(4)
        ]
        assert row["sig"] == expected

    def test_identical_docs_share_all_bands(self, spark, docs):
        prepped = docs.select(
            "doc_id", dedup.word_shingles(F.col("text"), 3).alias("sh")
        ).withColumn(
            "bands", dedup.minhash_bands(dedup.minhash_signature(F.col("sh"), 8), 4, 2)
        )
        cands = dedup.lsh_candidate_pairs(prepped, "doc_id", "bands")
        pairs = {(r["a_id"], r["b_id"]) for r in cands.collect()}
        assert (0, 3) in pairs  # exact dups always collide


class TestStarBuckets:
    def _prepped(self, spark):
        rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10, 16)]
        rows += [(20, "one two three four five six"), (21, "one two three four five six")]
        rows += [(30, "lone wolf document nothing shared here")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return df.select(
            "doc_id", dedup.word_shingles(F.col("text"), 3).alias("sh")
        ).withColumn(
            "bands", dedup.minhash_bands(dedup.minhash_signature(F.col("sh"), 8), 4, 2)
        )

    def test_star_cap_replaces_quadratic_bucket(self, spark):
        prepped = self._prepped(spark)
        full = {(r["a_id"], r["b_id"])
                for r in dedup.lsh_candidate_pairs(prepped, "doc_id", "bands").collect()}
        star = {(r["a_id"], r["b_id"])
                for r in dedup.lsh_candidate_pairs(
                    prepped, "doc_id", "bands", star_buckets_over=3).collect()}
        # 6-dup bucket: C(6,2)=15 pairs uncapped vs 5 star edges to the min
        assert {(a, b) for a, b in full if a >= 10 and b <= 15} == {
            (a, b) for a in range(10, 16) for b in range(a + 1, 16)
        }
        assert {(a, b) for a, b in star if a >= 10 and b <= 15} == {
            (10, b) for b in range(11, 16)
        }
        # small buckets keep the exact all-pairs behavior
        assert (20, 21) in star and (20, 21) in full

    def test_star_cap_preserves_components(self, spark):
        prepped = self._prepped(spark)
        star = dedup.lsh_candidate_pairs(prepped, "doc_id", "bands",
                                         star_buckets_over=3)
        comp = {r["node"]: r["comp"]
                for r in dedup.connected_components(star).collect()}
        assert {comp[i] for i in range(10, 16)} == {10}
        assert comp[20] == comp[21] == 20

    def test_stats_reports_rounds(self, spark):
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id bigint, b_id bigint")
        s1, s2 = {}, {}
        dedup.connected_components(pairs, stats=s1).collect()
        dedup.connected_components_star(pairs, stats=s2).collect()
        assert s1["rounds"] >= 1 and s2["rounds"] >= 1


class TestMinhashPipeline:
    def test_finds_near_and_exact_dups(self, spark, docs):
        out = dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_k=3, n_hashes=8, n_bands=4,
            threshold=0.5,
        )
        got = {(r["a_id"], r["b_id"]): r["jaccard"] for r in out.collect()}
        assert got[(0, 3)] == 1.0
        if (0, 1) in got:  # LSH may or may not surface the 0.5-ish pair
            assert 0.4 < got[(0, 1)] < 1.0

    def test_xx64_engine_matches_on_exact_dups(self, spark, docs):
        # different hash family -> candidate sets may differ on
        # borderline pairs, but exact dups share every band in BOTH
        # families and jaccard values are hash-invariant
        out = dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_k=3, n_hashes=8, n_bands=4,
            threshold=0.5, hash_fn="xx64",
        )
        got = {(r["a_id"], r["b_id"]): r["jaccard"] for r in out.collect()}
        assert got[(0, 3)] == 1.0
        assert all(j >= 0.5 for j in got.values())


class TestJaccardExact:
    def test_values_match_python(self, spark, docs):
        out = dedup.jaccard_pairs(
            docs.select("doc_id", "src", F.split("text", " ").alias("toks")),
            "doc_id", "toks", block_col="src", threshold=0.0,
        )
        got = {(r["a_id"], r["b_id"]): round(r["jaccard"], 6) for r in out.collect()}
        texts = {0: "the quick brown fox jumps over the lazy dog",
                 1: "the quick brown fox jumps over the lazy cat",
                 2: "completely different words entirely here now"}
        for a, b in [(0, 1), (0, 2), (1, 2)]:
            sa, sb = set(texts[a].split()), set(texts[b].split())
            assert got[(a, b)] == round(len(sa & sb) / len(sa | sb), 6)


class TestCrossGuard:
    """Unblocked O(n²) fallbacks refuse big inputs (r5 VERDICT wrong
    #3): above CROSS_GUARD_ROWS with no block_col the call raises;
    allow_cross=True or a block_col keeps working."""

    def _big(self, spark, monkeypatch):
        import pytest as _pt

        monkeypatch.setattr(dedup, "CROSS_GUARD_ROWS", 10)
        return _pt, spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.array(F.lit("a"), F.concat(F.lit("w"), F.col("id")))
            .alias("toks"),
            F.array(F.col("id").cast("float"), F.lit(1.0).cast("float"))
            .alias("embedding"))

    def test_jaccard_pairs_guarded(self, spark, monkeypatch):
        _pt, df = self._big(spark, monkeypatch)
        with _pt.raises(ValueError, match="block_col"):
            dedup.jaccard_pairs(df, "doc_id", "toks")
        assert dedup.jaccard_pairs(
            df, "doc_id", "toks", threshold=0.0,
            allow_cross=True).count() > 0

    def test_embedding_dup_pairs_guarded(self, spark, monkeypatch):
        _pt, df = self._big(spark, monkeypatch)
        with _pt.raises(ValueError, match="O\\(n"):
            dedup.embedding_dup_pairs(df, "doc_id", "embedding")
        # blocked path untouched by the guard
        blocked = dedup.embedding_dup_pairs(
            df.withColumn("blk", F.col("doc_id") % 5),
            "doc_id", "embedding", threshold=0.0, block_col="blk")
        assert blocked.count() > 0

    def test_knn_graph_guarded(self, spark, monkeypatch):
        _pt, df = self._big(spark, monkeypatch)
        with _pt.raises(ValueError, match="knn_graph"):
            similarity.knn_graph(df, k=1, id_col="doc_id")
        assert similarity.knn_graph(
            df, k=1, id_col="doc_id", allow_cross=True).count() > 0

    def test_small_input_passes_without_flag(self, spark):
        df = spark.range(5).select(
            F.col("id").alias("doc_id"),
            F.array(F.lit("a")).alias("toks"))
        assert dedup.jaccard_pairs(
            df, "doc_id", "toks", threshold=0.0).count() > 0

    def test_lsh_bucket_width_guarded(self, spark, monkeypatch):
        """r10 VERDICT #6: an LSH-bucketed pair join with expected
        bucket width above CROSS_GUARD_ROWS is Σ|bucket|² ~ O(n²) —
        hard_negatives (self mode) must refuse; allow_wide, tighter
        planes, or anchors mode keep working."""
        import pytest as _pt

        monkeypatch.setattr(dedup, "CROSS_GUARD_ROWS", 2)
        df = spark.range(40).select(
            F.col("id").alias("vec_id"),
            F.array(F.col("id").cast("float"), F.lit(1.0).cast("float"))
            .alias("embedding"),
            (F.col("id") % 2).alias("label"))
        # 40 rows / 2^1 buckets = 20 expected >> guard 2 -> refuse
        with _pt.raises(ValueError, match="bucket width"):
            similarity.hard_negatives(df, k=1, n_planes=1)
        assert similarity.hard_negatives(
            df, k=1, n_planes=1, allow_wide=True).count() > 0
        # anchors mode: pair work is anchors-bounded, no guard
        assert similarity.hard_negatives(
            df, k=1, n_planes=1,
            anchors=df.where(F.col("vec_id") < 3)).count() > 0
        # corpus-scale queries trigger the vectors-side width guard
        with _pt.raises(ValueError, match="lsh_topk"):
            similarity.lsh_topk(df, df, k=1, n_planes=1)
        assert similarity.lsh_topk(
            df, df, k=1, n_planes=1, allow_wide=True).count() > 0
        # small query sets never guarded
        assert similarity.lsh_topk(
            df, df.where(F.col("vec_id") < 2), k=1,
            n_planes=1).count() > 0


class TestSimhash:
    def test_exact_dups_same_signature(self, spark, docs):
        sigs = {
            r["doc_id"]: r["sig"]
            for r in docs.select(
                "doc_id", dedup.simhash(F.col("text")).alias("sig")
            ).collect()
        }
        assert sigs[0] == sigs[3]
        assert sigs[0] != sigs[4]

    def test_dup_pairs(self, spark, docs):
        out = dedup.simhash_dup_pairs(docs, "doc_id", "text", max_hamming=3)
        pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in out.collect()}
        assert pairs[(0, 3)] == 0


class TestCosine:
    def test_topk_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        vecs = rng.randn(20, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(20)],
            "vec_id bigint, embedding array<float>",
        )
        out = similarity.cosine_topk(df, df.where(F.col("vec_id") == 0), k=5)
        got = [(r["neighbor_id"], round(r["score"], 5)) for r in
               sorted(out.collect(), key=lambda r: r["rank"])]
        v = vecs.astype("float64")
        q = v[0]
        scores = v @ q / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
        order = sorted(
            [(i, round(float(s), 5)) for i, s in enumerate(scores) if i != 0],
            key=lambda t: (-t[1], t[0]),
        )[:5]
        assert got == order

    def test_embedding_dup_pairs(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id bigint, embedding array<float>",
        )
        out = dedup.embedding_dup_pairs(df, "vec_id", "embedding", threshold=0.99)
        pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
        assert pairs == {(0, 1)}  # colinear vectors, cosine 1.0

    def test_lsh_topk_recall_on_identical(self, spark):
        # identical vectors always share a bucket → rank-1 hit
        df = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)]
            + [(9, [-1.0, -2.0, -3.0, 4.0])],
            "vec_id bigint, embedding array<float>",
        )
        out = similarity.lsh_topk(df, df.where(F.col("vec_id") == 0), k=3, n_planes=4)
        rows = out.collect()
        assert any(r["neighbor_id"] in {1, 2, 3, 4} and r["rank"] == 1 for r in rows)


class TestText:
    def test_token_count_and_awl(self, spark):
        df = spark.createDataFrame([("ab cde f",)], "t string")
        [r] = df.select(
            text.token_count(F.col("t")).alias("n"),
            text.avg_word_len(F.col("t")).alias("awl"),
        ).collect()
        assert r["n"] == 3
        assert abs(r["awl"] - 2.0) < 1e-9

    def test_quality_score_bands(self, spark):
        good = "this is a reasonably long sentence with normal words " * 2
        bad = "!!! ??? ***"
        df = spark.createDataFrame([(good,), (bad,)], "t string")
        rows = df.select(text.quality_score(F.col("t")).alias("q")).collect()
        assert rows[0]["q"] > rows[1]["q"]

    def test_gopher_flags_planted(self, spark):
        good = "the quick brown fox jumps over of lazy dogs while keeping calm " * 5
        docs = {
            "good": good.strip(),
            "short": "the of tiny doc here now",
            "longwords": " ".join(["ab"] * 60),
            "symbols": "the of " + "word # " * 20 + "end",
            "bullets": "\n".join(f"- item {i}" for i in range(10)),
            "ellipsis": "wait...\nmore...\nhuh...\nyes no",
            "numeric": " ".join(["123"] * 60),
        }
        df = spark.createDataFrame(list(docs.items()), "k string, t string")
        flags = text.gopher_flags(F.col("t"))
        rows = {r["k"]: r for r in df.select(
            "k", *[v.alias(k) for k, v in flags.items()]).collect()}
        assert sum(rows["good"][f] for f in flags) == 0
        assert rows["short"]["word_count"] == 1
        assert rows["longwords"]["word_len"] == 1
        assert rows["symbols"]["symbol_ratio"] == 1
        assert rows["bullets"]["bullet_lines"] == 1
        assert rows["ellipsis"]["ellipsis_lines"] == 1
        assert rows["numeric"]["alpha_words"] == 1
        assert rows["numeric"]["stopwords"] == 1
        assert rows["good"]["stopwords"] == 0

    def test_gopher_stopwords_tunable(self, spark):
        # a corpus-adapted list flips the stopword verdict; other
        # rules are untouched
        df = spark.createDataFrame([("foo bar baz qux quux",)], "t string")
        default = text.gopher_flags(F.col("t"))
        tuned = text.gopher_flags(F.col("t"), stopwords=("foo", "bar"))
        [r] = df.select(default["stopwords"].alias("d"),
                        tuned["stopwords"].alias("t2"),
                        default["symbol_ratio"].alias("s1"),
                        tuned["symbol_ratio"].alias("s2")).collect()
        assert r["d"] == 1 and r["t2"] == 0
        assert r["s1"] == r["s2"] == 0

    def test_bigram_lm_scores_exact(self, spark):
        # corpus: V={a,b,c}; bigram counts (a,b)=3 (b,a)=1 (b,c)=1;
        # first-element counts a=3 b=2 -> p(b|a)=4/6, p(a|b)=p(c|b)=2/5
        import math
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string")
        rows = {r["doc_id"]: r for r in text.bigram_lm_scores(df).collect()}
        ce1 = (2 * math.log(3 / 2) + math.log(5 / 2)) / 3
        ce2 = (math.log(3 / 2) + math.log(5 / 2)) / 2
        assert rows[1]["n_bigrams"] == 3
        assert rows[2]["n_bigrams"] == 2
        assert abs(rows[1]["ce"] - ce1) < 1e-12
        assert abs(rows[2]["ce"] - ce2) < 1e-12

    def test_fingerprint_normalizes(self, spark):
        df = spark.createDataFrame([("  Hello   World ", "hello world")], "a string, b string")
        [r] = df.select(
            (text.fingerprint(F.col("a")) == text.fingerprint(F.col("b"))).alias("same")
        ).collect()
        assert r["same"]

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [("the cat sat on the mat and it is happy",),
             ("el gato es un animal que vive en la casa",),
             ("der hund ist ein tier und das ist gut",),
             ("xyzzy plugh qwerty",)],
            "t string",
        )
        rows = df.select(text.lang_id(F.col("t")).alias("lang")).collect()
        assert [r["lang"] for r in rows] == ["en", "es", "de", "und"]

    def test_word_tokens_regex(self, spark):
        df = spark.createDataFrame([("Hello, world42!",)], "t string")
        [r] = df.select(text.word_tokens_regex(F.col("t")).alias("w")).collect()
        assert r["w"] == ["hello", ",", "world", "42", "!"]

    def test_tokens_separator_is_literal(self, spark):
        # regex metacharacters as separators must split literally —
        # sep='.' or '|' previously exploded into per-char splits
        df = spark.createDataFrame([("a.b.c", "x|y|z", "p--q--r")],
                                   "dots string, pipes string, dashes string")
        [r] = df.select(
            text.tokens(F.col("dots"), sep=".").alias("d"),
            text.tokens(F.col("pipes"), sep="|").alias("p"),
            text.tokens(F.col("dashes"), sep="--").alias("m"),
            text.avg_word_len(F.col("dashes"), sep="--").alias("awl"),
        ).collect()
        assert r["d"] == ["a", "b", "c"]
        assert r["p"] == ["x", "y", "z"]
        assert r["m"] == ["p", "q", "r"]
        assert abs(r["awl"] - 1.0) < 1e-9  # multi-char sep exact length math


class TestConnectedComponents:
    def test_chain_and_island_components(self, spark):
        # chain 1-2-3-4 (diameter 3, needs >1 round), island 10-11,
        # and a triangle 20-21-22 with a redundant edge
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "a_id bigint, b_id bigint",
        )
        out = {r["node"]: r["comp"]
               for r in dedup.connected_components(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20}

    def test_single_edge(self, spark):
        pairs = spark.createDataFrame([(7, 5)], "a_id bigint, b_id bigint")
        out = {r["node"]: r["comp"]
               for r in dedup.connected_components(pairs).collect()}
        assert out == {5: 5, 7: 5}


class TestRollingFingerprint:
    def test_matches_pure_python_replica(self, spark):
        rows = [(1, "a b c d"), (2, "d c b a"), (3, "a b")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: (r["fingerprint"], r["n_grams"])
               for r in text.rolling_fingerprint(df, k=3).collect()}

        M, B = (1 << 31) - 1, 1_000_003

        def h(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % M

        def fp(txt, k=3):
            hs = [h(t) for t in txt.split(" ")]
            grams = [
                sum(hs[i + j] * pow(B, k - 1 - j, M) % M for j in range(k)) % M
                for i in range(len(hs) - k + 1)
            ]
            return (min(grams) if grams else min(hs)), len(grams)

        assert out == {i: fp(t) for i, t in rows}
        # order sensitivity: same token set, different fingerprint
        assert out[1][0] != out[2][0]

    def test_short_doc_falls_back_to_token_hash(self, spark):
        df = spark.createDataFrame([(9, "xy")], "doc_id bigint, text string")
        [r] = text.rolling_fingerprint(df, k=3).collect()
        exp = int(hashlib.md5(b"xy").hexdigest()[:8], 16) % ((1 << 31) - 1)
        assert (r["fingerprint"], r["n_grams"]) == (exp, 0)


class TestConnectedComponentsStar:
    def test_equivalent_to_label_propagation(self, spark):
        import random
        random.seed(11)
        edges = [(random.randrange(40), random.randrange(40))
                 for _ in range(35)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
        simple = {r["node"]: r["comp"]
                  for r in dedup.connected_components(df).collect()}
        star = {r["node"]: r["comp"]
                for r in dedup.connected_components_star(df).collect()}
        assert simple == star

    def test_long_chain_needs_log_rounds(self, spark):
        # diameter-60 chain: label propagation would need 60 rounds;
        # star must finish inside 8
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(60)], "a_id bigint, b_id bigint"
        )
        out = {r["node"]: r["comp"]
               for r in dedup.connected_components_star(chain, max_iter=8).collect()}
        assert len(out) == 61 and set(out.values()) == {0}


class TestComponentsEdgeCases:
    def test_self_pair_only_node_kept_by_both(self, spark):
        pairs = spark.createDataFrame(
            [(7, 7), (1, 2)], "a_id bigint, b_id bigint"
        )
        simple = {r["node"]: r["comp"]
                  for r in dedup.connected_components(pairs).collect()}
        star = {r["node"]: r["comp"]
                for r in dedup.connected_components_star(pairs).collect()}
        assert simple == star == {1: 1, 2: 1, 7: 7}

    def test_propagation_raises_when_diameter_exceeds_cap(self, spark):
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "a_id bigint, b_id bigint"
        )
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components(chain, max_iter=3)
        # star handles the same chain inside the same tiny cap
        out = dedup.connected_components_star(chain, max_iter=5)
        assert {r["comp"] for r in out.collect()} == {0}


class TestMojibakeRepair:
    def test_classic_cases_repaired(self, spark):
        from filters_spark.functions.text import fix_mojibake
        rows = [
            (1, "café".encode("utf-8").decode("latin-1")),      # cafÃ©
            (2, "it’s — fine".encode("utf-8").decode("cp1252")),  # â€™ style
            (3, "plain ascii stays"),
            (4, None),
            (5, "naïve Ångström".encode("utf-8").decode("latin-1")),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
        assert out[1]["text"] == "café" and out[1]["was_fixed"]
        assert out[2]["text"] == "it’s — fine" and out[2]["was_fixed"]
        assert out[3]["text"] == "plain ascii stays"
        assert not out[3]["was_fixed"]
        assert out[4]["text"] is None and out[4]["was_fixed"] is None
        assert out[5]["text"] == "naïve Ångström"

    def test_genuine_unicode_left_alone(self, spark):
        """Already-correct non-ASCII must NOT be 'repaired': the
        round trip either fails to decode as UTF-8 or fails the
        shrink requirement."""
        from filters_spark.functions.text import fix_mojibake
        rows = [(1, "café"), (2, "—"), (3, "Ω≈ç"), (4, "日本語")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
        for i, t in ((1, "café"), (2, "—"), (3, "Ω≈ç"), (4, "日本語")):
            assert out[i]["text"] == t, i
            assert not out[i]["was_fixed"], i

    def test_marker_count_expression(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions.text import mojibake_marker_count
        moj = "café and stuff".encode("utf-8").decode("latin-1")
        df = spark.createDataFrame(
            [(moj,), ("clean",)], "text string")
        got = df.select(
            mojibake_marker_count(F.col("text")).alias("m")).collect()
        assert [r["m"] for r in got] == [1, 0]

    def test_out_col_and_require_shrink_off(self, spark):
        from filters_spark.functions.text import fix_mojibake
        moj = "é".encode("utf-8").decode("latin-1")
        df = spark.createDataFrame([(1, moj)], "doc_id bigint, text string")
        out = fix_mojibake(df, out_col="fixed").collect()[0]
        assert out["text"] == moj and out["fixed"] == "é"
        # equal-length repairs only apply with require_shrink=False;
        # 2-char mojibake of a 1-char original always shrinks, so use
        # the policy flag on a clean doc to show it stays safe
        out2 = fix_mojibake(df, require_shrink=False).collect()[0]
        assert out2["text"] == "é"

    def test_marker_gated_split_matches_ungated(self, spark):
        """gate_on_markers runs Python only over the suspicious
        slice; results must be identical to the ungated map
        (the gate is lossless: mojibake always carries a marker)."""
        from filters_spark.functions.text import fix_mojibake
        rows = [
            (1, "café".encode("utf-8").decode("latin-1")),
            (2, "it’s fine".encode("utf-8").decode("cp1252")),
            (3, "plain ascii"),
            (4, None),
            (5, "café"),          # genuine unicode, no marker
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        plain = {r["doc_id"]: (r["text"], r["was_fixed"])
                 for r in fix_mojibake(df).collect()}
        gated = {r["doc_id"]: (r["text"], r["was_fixed"])
                 for r in fix_mojibake(df, gate_on_markers=True).collect()}
        assert gated == plain
        assert len(gated) == 5


class TestStripHtml:
    """text.strip_html — regex HTML text extraction (r8)."""

    def _strip(self, spark, vals):
        from pyspark.sql import functions as F

        from filters_spark.functions.text import strip_html

        df = spark.createDataFrame([(v,) for v in vals], "h string")
        return [r["t"] for r in
                df.select(strip_html(F.col("h")).alias("t")).collect()]

    def test_blocks_tags_entities_whitespace(self, spark):
        html = ('<html><head><style>p {c: 1}</style>'
                '<script>var x = 1 < 2; if (x > 0) {}</script></head>'
                '<body><p class="m">Hello   world</p><!-- note -->'
                '<div>Tom &amp; Jerry &lt;3 &quot;ok&quot; &#39;y&#39;'
                '</div></body></html>')
        [out] = self._strip(spark, [html])
        assert out == "Hello world Tom & Jerry <3 \"ok\" 'y'"

    def test_script_with_closing_like_content(self, spark):
        # the </script> terminator must be the REAL one, non-greedily
        html = '<script>a="x";</script>kept<script>b=2;</script>'
        assert self._strip(spark, [html]) == ["kept"]

    def test_amp_decoded_last(self, spark):
        # &amp;lt; is a literal '&lt;' in the source — must NOT
        # double-decode to '<'
        assert self._strip(spark, ["a &amp;lt; b"]) == ["a &lt; b"]

    def test_plain_text_and_null_untouched(self, spark):
        assert self._strip(spark, ["no markup here", None]) == [
            "no markup here", None]

    def test_multiline_blocks(self, spark):
        html = "<style>\na { b }\n</style>\n<p>\nx\n</p>"
        assert self._strip(spark, [html]) == ["x"]

    def test_no_entity_decode_option(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions.text import strip_html

        df = spark.createDataFrame([("<b>a &amp; b</b>",)], "h string")
        [r] = df.select(strip_html(F.col("h"),
                                   decode_entities=False).alias("t"))             .collect()
        assert r["t"] == "a &amp; b"


def test_punct_ratio_empty_text_is_null_not_error(spark):
    """ANSI mode makes x/0 throw; an empty document must yield NULL
    punct_ratio (and a NULL quality logit -> filtered), never kill
    the job."""
    from filters_spark.functions import text as T
    from filters_spark.plans.queries import _QCLS_B, _QCLS_W

    df = spark.createDataFrame([("",), ("real text here",)], "text string")
    rows = df.select(
        T.punct_ratio(F.col("text")).alias("pr"),
        T.quality_logit(F.col("text"), _QCLS_W, _QCLS_B).alias("lg"),
    ).collect()
    empty, real = rows[0], rows[1]
    assert empty["pr"] is None and empty["lg"] is None
    assert real["pr"] is not None and real["lg"] is not None
