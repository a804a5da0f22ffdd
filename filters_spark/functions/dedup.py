"""Deduplication operators (BASELINE.json north star): exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the part that matters at 100 TB):

* **Exact dedup** shuffles once on the fingerprint — a narrow 16-byte
  key, not the document — and uses map-side partial aggregation.
  Keep-first needs a deterministic order column; ``dropDuplicates``
  is nondeterministic under retries.
* **MinHash+LSH** never materializes the O(n²) pair space: signatures
  are a projection; candidate generation groups by (band_id,
  band_key) — a shuffle whose fan-in per bucket is bounded by design
  (hash buckets, not data skew); verification runs only on candidate
  pairs.  This is the standard shingle→minhash→band→bucket-join
  pipeline expressed as DataFrame ops.
* **Hash choice**: md5 (JVM builtin, DuckDB-identical) so every stage
  is oracle-checkable.  xxhash64 is ~3× faster; swap via ``hash_fn``
  once cross-engine parity is not needed — the plan shape is
  unchanged.
* **SimHash** is one projection to a 64-bit signature; near-dup =
  same signature (or banded XOR/popcount for distance ≤ k).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, tokens

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "minhash_signatures",
    "minhash_bands",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_signatures",
    "simhash_dup_pairs",
    "image_dup_pairs",
    "embedding_dup_pairs",
    "exact_text_dedup",
    "semantic_dedup",
    "connected_components",
    "connected_components_star",
    "contaminated_ids",
    "decontaminate",
    "dedup_segments",
    "duplicate_spans",
    "remove_duplicate_spans",
    "remove_frequent_lines",
    "materialize_signatures",
    "append_signatures",
    "dedup_pairs_against",
    "materialize_clusters",
    "append_clusters",
    "read_canonical",
]


def exact_dedup(df: DataFrame, key_cols: list[str], order_cols: list,
                content_col: str | None = None) -> DataFrame:
    """Keep exactly one row per key, deterministically (first by
    ``order_cols`` — names or Column sort specs, e.g.
    ``F.col("ts").desc()``).  With ``content_col``, the key is its
    md5 fingerprint (content dedup).

    Shape note: arbitrary mixed-direction sort specs force the
    row_number window, whose per-key partitions cannot be
    AQE-skew-split — fine for business keys (CDC snapshots, SCD
    inputs) where per-key cardinality is bounded, but for CONTENT
    dedup of a corpus that may contain mass-duplicated documents use
    :func:`exact_text_dedup`, whose grouped-agg + join-back shape
    absorbs hot fingerprints map-side."""
    if content_col is not None:
        df = df.withColumn("_fp", fingerprint(F.col(content_col)))
        key_cols = ["_fp"]
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )


def word_shingles(col: Column, k: int = 3, sep: str = " ") -> Column:
    """Distinct word k-shingles of a text column, as strings."""
    toks = tokens(col, sep)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(sh)


def _md5_hash(seed: int) -> Callable[[Column], Column]:
    return lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))


def minhash_signature(shingles: Column, n_hashes: int = 16,
                      hash_fn: Callable[[int], Callable[[Column], Column]] = _md5_hash,
                      ) -> Column:
    """MinHash signature: for each of ``n_hashes`` seeded hash
    functions, the minimum hash over the shingle set.  Using string
    min over md5 hex — uniform and engine-portable."""
    sigs = [
        F.array_min(F.transform(shingles, hash_fn(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_bands(sig: Column, n_bands: int, rows_per_band: int,
                  hash_fn: str = "md5") -> Column:
    """Split a signature into band keys: array of (band_id, key)
    structs; docs sharing ANY band key are LSH candidates.

    ``hash_fn='md5'`` (default) keys each band with
    md5(concat_ws(slice)) — byte-replayable in ANSI SQL, the
    correctness-gate form.  ``hash_fn='xx64'`` keys with
    xxhash64(slice) directly (Spark's hash functions accept arrays)
    and the key is a BIGINT — same bucket equality classes, one
    codegen'd call instead of a string concat + digest.  Bucket
    membership only depends on slice equality, so the two keyings
    yield identical candidate sets (modulo 64-bit collisions).
    """
    if hash_fn not in ("md5", "xx64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xx64', got {hash_fn!r}")
    bands = []
    for b in range(n_bands):
        piece = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        if hash_fn == "xx64":
            key = F.xxhash64(piece)
        else:
            key = F.md5(F.concat_ws("|", piece))
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*bands)


def lsh_candidate_pairs(df: DataFrame, id_col: str, bands_col: str,
                        star_buckets_over: int | None = None) -> DataFrame:
    """Explode band keys and self-join per (band, key) bucket →
    distinct candidate (a, b) pairs with a < b.

    Scale: the only shuffle keys are (band, key) hash buckets.  A
    pathological bucket (many docs with identical band key — i.e.
    true mass duplicates) emits |B|·(|B|−1)/2 pairs: a single
    5000-doc duplicate cluster is 12.5M candidate rows PER BAND.
    ``star_buckets_over=k`` routes buckets larger than k through a
    star expansion instead — every member pairs with the bucket
    minimum only (|B|−1 rows, O(n) not O(n²)).  For dedup-by-
    connected-components the star edges preserve exactly the
    connectivity the all-pairs edges give WITHIN the bucket (all
    members reach the same min); what is lost is only pairs (b, c)
    whose similarity is real but whose bucket-min a fails the later
    Jaccard verify against both — rare for mass-dup buckets, where
    members are near-identical by construction.  Measured behavior
    at 2M docs is recorded in SCALE.md.
    """
    exploded = df.select(
        F.col(id_col).alias("_id"), F.explode(F.col(bands_col)).alias("bk")
    ).select("_id", "bk.band", "bk.key")
    if star_buckets_over is None:
        a, b = exploded.alias("a"), exploded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
            .distinct()
        )
    # bucket size + min come from a grouped aggregate joined back —
    # NOT a count/min window partitioned by (band, key): the
    # pathological mass-dup bucket this cap exists for would put its
    # whole partition in one window task (AQE splits skewed joins,
    # not window partitions), while the grouped agg collapses it
    # map-side and the join back is skew-splittable.  The join's
    # (band, key) exchange is the same partitioning the small-bucket
    # self-join reuses.
    stats = exploded.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("_n"), F.min("_id").alias("_min"))
    sized = exploded.join(stats, ["band", "key"])
    small = sized.where(F.col("_n") <= star_buckets_over).drop("_n", "_min")
    a, b = small.alias("a"), small.alias("b")
    small_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
    star_pairs = (
        sized.where((F.col("_n") > star_buckets_over) & (F.col("_id") != F.col("_min")))
        .select(F.col("_min").alias("a_id"), F.col("_id").alias("b_id"))
    )
    return small_pairs.union(star_pairs).distinct()


#: Row bound above which an UNBLOCKED pair join refuses to run: at
#: 20k rows the cross is already 2·10⁸ pairs; beyond that the
#: quadratic plan is never what you want at scale (use LSH bands /
#: quantizer cells / hash buckets as block_col, or opt in explicitly).
CROSS_GUARD_ROWS = 20_000


def _guard_unblocked_cross(df: DataFrame, fn_name: str,
                           allow_cross: bool) -> None:
    """Refuse a silent O(n²) self-cross beyond CROSS_GUARD_ROWS (r5
    VERDICT wrong #3): one bounded ``limit(B+1).count()`` probe —
    early-exit scan, no full count — then raise with the blocked
    alternative named.  ``allow_cross=True`` skips the probe entirely
    (callers that KNOW the input is a sample keep a job-free plan)."""
    if allow_cross:
        return
    n = df.limit(CROSS_GUARD_ROWS + 1).count()
    if n > CROSS_GUARD_ROWS:
        raise ValueError(
            f"{fn_name}: input exceeds {CROSS_GUARD_ROWS} rows with no "
            "block_col — the unblocked path is a full O(n²) cross join. "
            "Pass block_col (LSH bands / quantizer cells / hash buckets) "
            "for the blocked scale path, or allow_cross=True to force "
            "the quadratic plan on a deliberately small input.")


def jaccard_pairs(df: DataFrame, id_col: str, set_col: str,
                  pairs: DataFrame | None = None,
                  block_col: str | None = None,
                  threshold: float = 0.5,
                  allow_cross: bool = False) -> DataFrame:
    """Exact Jaccard similarity over pairs.

    * ``pairs`` given (from LSH): verify only candidates — the scale
      path.
    * else ``block_col``: all pairs within a blocking key (bounded
      quadratic per block).
    * else: full cross of ids — refused above CROSS_GUARD_ROWS
      unless ``allow_cross=True`` (deliberate small-sample twins).
    Returns (a_id, b_id, jaccard).
    """
    if pairs is None and block_col is None:
        _guard_unblocked_cross(df, "jaccard_pairs", allow_cross)
    # Three pair-compute optimizations that keep the jaccard VALUE
    # exact:
    # 1. tokens are pre-hashed to int64 (xxhash64) so the per-pair
    #    intersect compares longs, not strings — |A∩B| is invariant
    #    under any injective hash, so results (and the SQL oracle,
    #    which can keep comparing raw tokens) are unchanged;
    # 2. |A∪B| = |A|+|B|−|A∩B| — array_union (which materializes a
    #    new array per pair) is never evaluated;
    # 3. the hashing runs on EXPLODED rows (codegen'd xxhash64 +
    #    collect_set), not on arrays via F.transform — HOF lambdas
    #    are CodegenFallback, interpreted per element, and the a/b
    #    join branches would each recompute them (measured 6.4 s →
    #    1.9 s at 5k docs × 54 tokens).  The persist below stops the
    #    two join branches re-running the agg; the narrow (id, set)
    #    frame is tiny relative to the pair space it feeds.
    # Docs whose token set is empty vanish at the explode — harmless:
    # every pair involving one has jaccard 0 (or NULL for empty-empty),
    # which a positive threshold filters anyway.
    ex = df.select(
        F.col(id_col).alias("_id"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
        F.explode(F.array_distinct(F.col(set_col))).alias("_elem"),
    )
    from ._cache import scoped_persist

    sets = scoped_persist(
        ex.groupBy("_id", *(["_blk"] if block_col else []))
        .agg(F.collect_set(F.xxhash64("_elem")).alias("_set"))
        .withColumn("_n", F.size("_set")),
        "jaccard_sets",
    )
    if pairs is None:
        # Self-join carrying the sets directly: one equi-join on the
        # block key (or one cross for tiny inputs), no re-join.
        a = sets.select(F.col("_id").alias("a_id"), F.col("_set").alias("_sa"),
                        F.col("_n").alias("_na"),
                        *([F.col("_blk").alias("_ba")] if block_col else []))
        b = sets.select(F.col("_id").alias("b_id"), F.col("_set").alias("_sb"),
                        F.col("_n").alias("_nb"),
                        *([F.col("_blk").alias("_bb")] if block_col else []))
        cond = F.col("a_id") < F.col("b_id")
        if block_col:
            joined = a.join(b, (F.col("_ba") == F.col("_bb")) & cond)
        else:
            joined = a.crossJoin(b).where(cond)
    else:
        joined = (
            pairs.join(
                sets.select(F.col("_id").alias("a_id"), F.col("_set").alias("_sa"),
                            F.col("_n").alias("_na")), "a_id")
            .join(
                sets.select(F.col("_id").alias("b_id"), F.col("_set").alias("_sb"),
                            F.col("_n").alias("_nb")), "b_id")
        )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    jac = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter)
    return (
        joined.select("a_id", "b_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str,
                 k: int = 3, sep: str = " ") -> DataFrame:
    """(id, _shingle) — one row per word k-shingle, built WITHOUT any
    higher-order-function lambda: posexplode the tokens, then each
    shingle is ``concat_ws(token, lead(token,1), …)`` over a window
    partitioned by document.  Same shingle strings as
    :func:`word_shingles` (duplicates NOT collapsed here — min/set
    aggregations downstream are duplicate-insensitive).

    Why: ``transform(idx, i -> concat_ws(slice(toks,i,k)))`` is
    CodegenFallback — interpreted per shingle with an array copy
    (measured ~11 µs/shingle, 3 s for 260k shingles); lead() over the
    exploded rows is native vectorized sort + codegen'd concat.

    The id repartition sits BEFORE the posexplode on purpose: it
    pre-satisfies the shingling window's (id) distribution, so the
    shuffle moves compact documents, not the ~100× larger exploded
    token stream (measured 3× end-to-end on minhash signatures at
    sf0.1), and it spreads the explode across the cluster even when
    the corpus arrives as a handful of input splits.  The explicit
    numPartitions stops AQE coalescing the small doc shuffle back to
    one task.  Every downstream groupBy(id) reuses the partitioning.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = tokens(F.col(text_col), sep)
    ex = df.repartition(par, id_col).select(
        F.col(id_col), F.size(toks).alias("_n"),
        F.posexplode(toks).alias("_pos", "_tok"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", j).over(w) for j in range(1, k)]
    return ex.select(
        F.col(id_col), F.col("_pos"), F.col("_n"),
        F.concat_ws(sep, *parts).alias("_shingle"),
    ).where(  # same boundary as word_shingles: positions 0..max(n-k,0)
        F.col("_pos") <= F.greatest(F.col("_n") - k, F.lit(0))
    ).select(F.col(id_col), F.col("_shingle"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       shingle_k: int = 3, n_hashes: int = 16,
                       hash_fn: str = "md5") -> DataFrame:
    """(id, _sh shingle-set, _sig minhash array) via the EXPLODED
    aggregation plan: shingle rows (see :func:`shingle_rows`) → n
    plain md5 column expressions → ONE groupBy(id) computing both the
    shingle set (collect_set) and all n signature mins.

    Why exploded and not ``minhash_signature``'s array expression:
    Spark higher-order-function lambdas (transform/aggregate) are
    CodegenFallback — every element evaluates interpreted, ~6 µs per
    hash (measured 29 s for 5k docs × 52 shingles × 16 hashes).  As
    exploded rows, the same md5s are ordinary codegen'd column
    expressions with map-side partial min — the identical signature
    values for ~20× less CPU.  Single aggregate = no separate
    shingle-array branch and no join back; the only shuffle is the
    (id) window/agg partitioning, reused end to end.
    """
    if hash_fn not in ("md5", "xx64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xx64', got {hash_fn!r}")
    ex = shingle_rows(df, id_col, text_col, shingle_k)
    if hash_fn == "xx64":
        # Throughput engine.  Measured on this box (50M rows,
        # local[32], warm): md5 ≈ 5.4 s vs xxhash64 ≈ 0.7 s — each
        # md5 row pays a MessageDigest round-trip plus a hex-string
        # allocation, and min(string) forces SortAggregate while
        # min(bigint) hash-aggregates with a fixed-width buffer.
        # With 16 hash functions per shingle the digest cost
        # dominates the whole dedup pipeline, so this is the knob
        # that matters at corpus scale.  Not ANSI-SQL-replayable (no
        # xxhash64 in DuckDB), hence not the correctness-gate default.
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("_shingle"))).alias(f"_mh{i}")
            for i in range(n_hashes)
        ]
        shingle_set = F.collect_set(F.xxhash64(F.col("_shingle")))
    else:
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("_shingle")))).alias(f"_mh{i}")
            for i in range(n_hashes)
        ]
        shingle_set = F.collect_set("_shingle")
    return ex.groupBy(id_col).agg(
        shingle_set.alias("_sh"), *aggs
    ).select(
        F.col(id_col), F.col("_sh"),
        F.array(*[F.col(f"_mh{i}") for i in range(n_hashes)]).alias("_sig"),
    )


def minhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_k: int = 3, n_hashes: int = 16,
                        n_bands: int = 4, threshold: float = 0.5,
                        star_buckets_over: int | None = None,
                        hash_fn: str = "md5") -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → band → bucket join
    → exact-Jaccard verify.  Returns verified (a_id, b_id, jaccard).

    NOTE the signature is bound to its own column before banding:
    passing the signature EXPRESSION into minhash_bands would embed
    the whole hash computation inside every band slice (n_bands×
    duplicated work + a megabyte of codegen).

    The prepped (id, shingle-set, signature, bands) frame is
    persisted: it feeds FOUR plan branches (both sides of the bucket
    self-join, both sides of the verify join) and Catalyst does not
    share subplans across joins — without the persist the whole
    shingle+hash pipeline re-executes per branch.  At 100 TB the same
    slot is a checkpoint/table write of the signatures.  The persist
    rides the bounded _cache.scoped_persist LRU — repeat calls on the
    same corpus reuse it, distinct corpora evict the oldest entry
    (bounded accumulation, no per-call leak)."""
    from ._cache import scoped_persist

    rows = n_hashes // n_bands
    prepped = minhash_signatures(df, id_col, text_col, shingle_k, n_hashes,
                                 hash_fn=hash_fn)
    prepped = scoped_persist(
        prepped.withColumn(
            "_bands",
            minhash_bands(F.col("_sig"), n_bands, rows, hash_fn=hash_fn)),
        "minhash_prepped")
    cands = lsh_candidate_pairs(prepped, id_col, "_bands",
                                star_buckets_over=star_buckets_over)
    return jaccard_pairs(prepped, id_col, "_sh", pairs=cands,
                         threshold=threshold)


SIMHASH_BITS = 60  # 15 md5 hex chars → fits a signed long with headroom


def simhash(col: Column, n_bits: int = SIMHASH_BITS, sep: str = " ") -> Column:
    """SimHash over tokens: per-token md5 → per-bit ±1 votes → sign
    bits assembled into one long.  Single pass over the token array
    (one ``aggregate`` carrying a vote-counter array), pure codegen.

    60 bits (not 64): the token hash comes from 15 md5 hex chars so
    every intermediate stays inside a signed int64 — no overflow, no
    unsigned gymnastics, and DuckDB can reproduce it with the same
    md5/substr/arithmetic."""
    if n_bits > SIMHASH_BITS:
        raise ValueError(f"n_bits <= {SIMHASH_BITS} (signed-long-safe)")
    toks = F.array_distinct(tokens(col, sep))
    th = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(n_bits)])
    votes = F.aggregate(
        th,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(
            acc, powers,
            lambda c, p: c + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    signed_bits = F.zip_with(
        votes, powers,
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        signed_bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x)
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_bits: int = SIMHASH_BITS, sep: str = " ") -> DataFrame:
    """(_id, _sig) via the exploded plan — same signatures as
    :func:`simhash`, but the per-token hash is a codegen'd column
    expression and the per-bit votes are ``sum(CASE ...)`` aggregates
    instead of interpreted HOF lambdas (same reasoning as
    :func:`minhash_signatures`; the lambda form costs ~60 interpreted
    ops per token)."""
    # id repartition BEFORE the explode — spreads the token blowup and
    # the 60-way vote partial-agg across the cluster even when the
    # corpus is one input split, and the groupBy(_id) reuses it (same
    # rationale + measurement as shingle_rows).
    par = df.sparkSession.sparkContext.defaultParallelism
    ex = df.repartition(par, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col), sep))).alias("_tok"),
    ).withColumn(
        "_h", F.conv(F.substring(F.md5("_tok"), 1, 15), 16, 10).cast("long")
    )
    votes = ex.groupBy("_id").agg(*[
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1)
            .otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(n_bits)
    ])
    sig = F.lit(0).cast("long")
    for i in range(n_bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
        )
    return votes.select("_id", sig.alias("_sig"))


def simhash_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, n_bands: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the signature into
    ``n_bands`` chunks; by pigeonhole, pairs within hamming distance
    < n_bands share at least one exact chunk.  Verify with popcount
    on candidates only."""
    chunk = SIMHASH_BITS // n_bands
    sh = simhash_signatures(df, id_col, text_col)
    bands = sh.select(
        "_id", "_sig",
        F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("_sig"), b * chunk)
                .bitwiseAND(F.lit((1 << chunk) - 1)).alias("key"),
            )
            for b in range(n_bands)
        ]).alias("_bands"),
    )
    exploded = bands.select("_id", "_sig", F.explode("_bands").alias("bk")).select(
        "_id", "_sig", "bk.band", "bk.key"
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    ham = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    # popcount-filter BEFORE the dedup: the verify predicate is free
    # per joined row, while the multi-band duplicate removal is a
    # shuffle — filtering first means the distinct only moves pairs
    # that already passed (measured 2× on the banded self-join; the
    # ordering is strictly better at any scale).  hamming is a pure
    # function of the pair, so distinct over (pair, hamming) dedupes
    # exactly the multi-band hits.
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a._id") < F.col("b._id")))
        .where(ham <= max_hamming)
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"),
                ham.alias("hamming"))
        .distinct()
    )


def embedding_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95,
                        block_col: str | None = None,
                        allow_cross: bool = False) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= threshold.
    Brute within blocks (full cross refused above CROSS_GUARD_ROWS
    unless ``allow_cross=True``); the ANN path for scale is
    ``similarity.lsh_buckets`` + this verify."""
    from .similarity import cosine

    if block_col is None:
        _guard_unblocked_cross(df, "embedding_dup_pairs", allow_cross)

    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                  *( [F.col(block_col).alias("_blk")] if block_col else []))
    a = v.select(F.col("_id").alias("a_id"), F.col("_v").alias("_va"),
                 *( [F.col("_blk").alias("_ba")] if block_col else []))
    b = v.select(F.col("_id").alias("b_id"), F.col("_v").alias("_vb"),
                 *( [F.col("_blk").alias("_bb")] if block_col else []))
    cond = F.col("a_id") < F.col("b_id")
    joined = (a.join(b, (F.col("_ba") == F.col("_bb")) & cond)
              if block_col else a.crossJoin(b).where(cond))
    score = cosine(F.col("_va"), F.col("_vb"))
    return joined.select("a_id", "b_id", score.alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def semantic_dedup(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cell_col: str = "label",
                   threshold: float = 0.95,
                   engine: str = "expr") -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al. 2023,
    arXiv:2303.09540): within each cluster cell, drop every row that
    has an EARLIER (smaller-id) neighbor with cosine >= threshold —
    the greedy keep-first policy, deterministic because "earlier" is
    an id comparison, not an RNG or iteration order.

    Candidate generation is confined to cells (swap ``cell_col`` for
    an LSH bucket from ``similarity.lsh_buckets`` or an IVF cell when
    no cluster label exists), so the pair space is sum(|cell|^2), not
    n^2 — at 100 TB the cells come from the coarse quantizer the ANN
    index already maintains, and the within-cell verify is the same
    blocked shape :func:`embedding_dup_pairs` uses.  The anti-join
    back to the corpus broadcasts the (small) dropped-id set when the
    duplicate rate is low, which AQE detects at runtime.

    engines:
      * ``expr`` — cell-blocked pair join with an in-plan dot product
        over L2-pre-normalized vectors.  Sequential-sum float order:
        exactly what a SQL oracle replays — the hash-gate engine.
      * ``arrow`` — ``applyInPandas`` per cell: ONE numpy
        (|cell|×d)·(d×|cell|) matmul + a triangular mask per cell.
        The FLOP-bound scale path (SemDeDup's own per-cluster shape):
        the pair space never materializes as rows, only as a local
        matrix.  numpy's pairwise summation can differ from the
        sequential sum in the last ulps — use for throughput; gate
        queries should prefer ``expr`` unless the threshold is
        comfortably far from any pair's cosine.

    NULL cells: rows with a NULL ``cell_col`` are KEPT verbatim in
    BOTH engines — an unassigned row has no quantizer cell, so it has
    no candidate neighbors by construction.  (Without the explicit
    filter the engines would diverge: an equi-join never matches NULL
    keys while ``groupBy`` collects NULLs into one group, silently
    deduping *across* the unassigned pool — ADVICE r3.)"""
    if engine == "arrow":
        dropped = _semantic_dropped_arrow(df, id_col, vec_col, cell_col,
                                          threshold)
        return df.join(dropped, id_col, "left_anti")
    from .similarity import dot, norm

    # norm staged as its own column FIRST: referencing norm(v) inside
    # the transform lambda would re-evaluate the O(d) aggregate per
    # ELEMENT (O(d²)/row — interpreted HOFs do not CSE)
    # zero-norm guard (mirrors the arrow engine's nrm[nrm==0]=1):
    # a zero vector normalizes to itself, scores 0 against everything,
    # and is KEPT — instead of DIVIDE_BY_ZERO under ANSI mode
    raw_nrm = norm(F.col(vec_col))
    nv = df.select(F.col(cell_col).alias("_cell"), F.col(id_col).alias("_id"),
                   F.col(vec_col).alias("_v"),
                   F.when(raw_nrm == F.lit(0.0), F.lit(1.0))
                   .otherwise(raw_nrm).alias("_nrm"))
    v = nv.select(
        "_cell", "_id",
        F.transform(F.col("_v"),
                    lambda x: x.cast("double") / F.col("_nrm")).alias("_u"))
    a = v.select(F.col("_cell"), F.col("_id").alias("_ai"),
                 F.col("_u").alias("_av"))
    b = v.select(F.col("_cell"), F.col("_id").alias("_bi"),
                 F.col("_u").alias("_bv"))
    dropped = (
        a.join(b, "_cell")
        .where(F.col("_ai") < F.col("_bi"))
        .where(dot(F.col("_av"), F.col("_bv")) >= threshold)
        .select(F.col("_bi").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def _semantic_dropped_arrow(df: DataFrame, id_col: str, vec_col: str,
                            cell_col: str, threshold: float) -> DataFrame:
    """Per-cell numpy cosine matrix → dropped ids.  One Arrow batch
    per cell (cells are the ANN quantizer's cells — small by
    construction; a cell that doesn't fit one executor's memory needs
    a finer quantizer, not a bigger box).  NULL-cell rows are
    filtered (kept by the caller's anti-join, matching the expr
    engine's join-on-cell semantics); the output schema is derived
    from the input id column's type, not hard-coded long (string ids
    work — ADVICE r3)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def find_dropped(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        if len(pdf) < 2:
            return pdf.iloc[0:0][[id_col]]
        order = pdf[id_col].to_numpy().argsort(kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.vstack(pdf[vec_col].to_numpy()[order]).astype("float64")
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0.0] = 1.0
        unit = mat / nrm[:, None]
        sims = unit @ unit.T
        # j is dropped if ANY i<j has sims[i,j] >= threshold
        hit = np.triu(sims >= threshold, k=1).any(axis=0)
        return pd.DataFrame({id_col: ids[hit]})

    return (
        df.select(F.col(cell_col).alias("_cell"), id_col, vec_col)
        .where(F.col("_cell").isNotNull())
        .groupBy("_cell")
        .applyInPandas(find_dropped, f"{id_col} {id_type}")
    )


def connected_components(pairs: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id",
                         max_iter: int = 25,
                         stats: dict | None = None) -> DataFrame:
    """Connected components over a near-dup candidate edge list —
    the clustering step that turns pairwise matches into dedup groups
    (keep one document per component).

    Iterative min-label propagation, pure DataFrame ops: every node
    starts labeled with its own id; each round every node takes the
    minimum label among itself and its neighbors; fixpoint when no
    label changes.  Rounds needed = graph diameter — near-dup
    components are small and chain-like, so this converges in a
    handful of rounds (the 100 TB upgrade is alternating
    large-star/small-star, which squashes diameter to O(log n) with
    the same per-round plan shape: join on edges + min-agg on node).

    Scale notes: edges are persisted once and reused every round; the
    label frame is ``localCheckpoint``-ed per round so lineage (and
    plan-compile time) stays flat instead of growing with the
    iteration count — on a real cluster use a reliable checkpoint
    dir.  Convergence is detected with a LIMIT-1 anti-equality probe,
    not a full count.

    Returns ``(node, comp)``: every node that appears in any pair,
    labeled with the smallest node id in its component (deterministic
    for any edge order).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .select(edges.src.alias("node"), F.col("comp"))
        )
        new_labels = (
            nbr_min.union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # a partially-propagated labeling silently splits real
        # components — never return it
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds the cap); raise max_iter or use "
            "connected_components_star (O(log n) rounds)"
        )
    return labels


def connected_components_star(pairs: DataFrame, a_col: str = "a_id",
                              b_col: str = "b_id",
                              max_iter: int = 20,
                              stats: dict | None = None) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 100 TB path: O(log n) rounds on ANY graph shape,
    where plain min-label propagation needs diameter rounds (a 1M-long
    chain of near-dup shards would need 1M rounds there, 20 here).

    Each round is two star operations over the edge frame:

    * **large-star**: for every node u, neighbors v > u re-link to
      m(u) = min(N(u) ∪ {u}) — hangs big nodes' tails onto the local
      minimum;
    * **small-star**: neighbors v ≤ u (and u itself) re-link to m(u)
      — flattens the remaining short chains.

    Both are one groupBy-min plus one join keyed on u — the same
    shuffle shape as a round of label propagation, just fewer rounds.
    Edges are kept as (u, v) with the invariant v ≤ u after each
    small-star; fixpoint when the edge multiset stops changing
    (checked with a LIMIT-1 anti-join probe).  Lineage stays flat via
    per-round localCheckpoint.

    Returns (node, comp) — identical contract (and, by determinism of
    min, identical output) to :func:`connected_components`.
    """
    # every node mentioned in ANY pair (incl. self-pairs) must appear
    # in the output — same contract as connected_components
    all_nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # canonical undirected storage: one row per edge, u > v
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric view; m(u) = min(N(u) ∪ {u}); every STRICTLY
        # LARGER neighbor of u re-links to m(u).  Output rows keep the
        # u > v invariant automatically (v > u ≥ m).
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.union(sym.select("u", F.col("u").alias("v")))
            .groupBy("u").agg(F.min("v").alias("m"))
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # rows already point larger→smaller; m(u) = min smaller
        # neighbor; every smaller neighbor AND u itself link to m(u).
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        j = e.join(m, "u")
        nbrs = j.select(F.col("v").alias("x"), F.col("m").alias("y"))
        self_link = m.select(F.col("u").alias("x"), F.col("m").alias("y"))
        return (
            nbrs.union(self_link)
            .where(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"),
                    F.least("x", "y").alias("v"))
            .distinct()
        )

    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        new_edges = small_star(large_star(edges)).localCheckpoint()
        changed = (
            new_edges.join(edges, ["u", "v"], "left_anti").limit(1).count()
            + edges.join(new_edges, ["u", "v"], "left_anti").limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — rounds grow with log(n); raise max_iter"
        )

    # at fixpoint the edge set is a star forest: (member, root) rows;
    # nodes with no surviving edge (isolated / self-pair-only) are
    # their own component
    comp = edges.groupBy("u").agg(F.min("v").alias("comp"))
    in_edges = edges.select("u").union(edges.select(F.col("v").alias("u")))
    isolated = (
        all_nodes.join(in_edges.distinct(),
                       all_nodes.node == F.col("u"), "left_anti")
        .select(F.col("node").alias("u"))
        .withColumn("comp", F.col("u"))
    )
    roots = (
        edges.select(F.col("v").alias("u")).distinct()
        .join(edges.select("u"), "u", "left_anti")
        .withColumn("comp", F.col("u"))
    )
    return comp.union(roots).union(isolated).groupBy(
        F.col("u").alias("node")
    ).agg(F.min("comp").alias("comp"))


def semantic_contaminated(corpus: DataFrame, eval_df: DataFrame,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          eval_id_col: str | None = None,
                          threshold: float = 0.95,
                          exclude_same_id: bool = False,
                          max_eval: int = 100_000,
                          engine: str = "expr") -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-similarity
    complement of the n-gram :func:`contaminated_ids` (modern
    pipelines run both: n-grams catch verbatim leakage, embeddings
    catch paraphrased eval items no shared 13-gram reveals).  For
    every corpus vector, count the eval vectors with cosine ≥
    ``threshold`` and keep the maximum cosine; rows with no match
    don't appear (join back with ``keep_flag`` semantics yourself, or
    anti-join the ids like :func:`decontaminate`).

    Scale shape: eval benchmarks are SMALL by nature (thousands of
    items against a 100 TB corpus), so the eval side broadcasts and
    the pair work is a per-corpus-partition loop — n_corpus × n_eval
    dot products with NO shuffle of the corpus and one final
    aggregate keyed by the corpus id.  The ``max_eval`` guard refuses
    a silently quadratic "eval" set (the `_guard_unblocked_cross`
    discipline); above it, block both sides by an IVF/LSH cell
    (similarity.lsh_buckets) and run this per cell.
    ``exclude_same_id=True`` skips identity pairs when the eval set
    is drawn from the corpus itself (audits, leakage studies).

    engines (the cosine_topk contract): ``expr`` evaluates the dot
    products as HOF expressions with norms PRECOMPUTED once per side
    (loop-invariant — the per-pair arithmetic is bitwise the
    sequential ``dot/(|c|·|e|)``, so SQL oracles hash-match);
    ``arrow`` does one numpy matmul per Arrow batch against the
    collected eval matrix — the throughput path when
    n_corpus × n_eval FLOPs dominate (numpy pairwise summation
    reorders adds: last-ulp drift at the threshold boundary is
    possible, so hash-gate the expr twin, run arrow for scale —
    pinned equal on real data in pytest).

    Returns ``(id_col, n_matches, max_cosine)``."""
    from .similarity import dot, norm

    eid = eval_id_col or id_col
    n_eval = eval_df.limit(max_eval + 1).count()
    if n_eval > max_eval:
        raise ValueError(
            f"semantic_contaminated: eval side has > {max_eval} rows "
            "— that is a corpus, not a benchmark; block both sides by "
            "an ANN cell (similarity.lsh_buckets / ivf cells) and run "
            "per cell instead of broadcasting")
    if engine == "arrow":
        return _semantic_contaminated_arrow(
            corpus, eval_df, id_col, vec_col, eid, float(threshold),
            exclude_same_id)
    e = eval_df.select(F.col(eid).alias("_eid"),
                       F.col(vec_col).alias("_ev"),
                       norm(F.col(vec_col)).alias("_en"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"),
                      norm(F.col(vec_col)).alias("_cn"))
    pairs = c.crossJoin(F.broadcast(e))
    if exclude_same_id:
        pairs = pairs.where(F.col(id_col) != F.col("_eid"))
    # norms are loop-invariant (one per row per SIDE, not per pair);
    # the composed dot/(cn*en) is bitwise cosine()'s arithmetic
    prod = F.col("_cn") * F.col("_en")
    score = F.when(prod == F.lit(0.0), F.lit(0.0)).otherwise(
        dot(F.col("_cv"), F.col("_ev")) / prod)
    return (pairs.withColumn("_cos", score)
            .where(F.col("_cos") >= F.lit(float(threshold)))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
                 F.max("_cos").alias("max_cosine")))


def _semantic_contaminated_arrow(corpus, eval_df, id_col, vec_col,
                                 eid, threshold, exclude_same_id):
    """Arrow path: eval matrix collected driver-side (guarded small),
    one numpy matmul per corpus batch, per-row match count + max."""
    import numpy as np
    import pandas as pd

    rows = eval_df.select(eid, vec_col).collect()
    eids = np.array([r[0] for r in rows], dtype="int64")
    E = np.array([r[1] for r in rows], dtype="float64")
    en = np.linalg.norm(E, axis=1)

    import pyspark.sql.types as T
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("max_cosine", T.DoubleType()),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            C = np.array(list(pdf[vec_col]), dtype="float64")
            cn = np.linalg.norm(C, axis=1)
            prod = np.outer(cn, en)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(prod == 0.0, 0.0, (C @ E.T) / prod)
            hit = S >= threshold
            if exclude_same_id:
                hit &= ids[:, None] != eids[None, :]
            nm = hit.sum(axis=1)
            keep = nm > 0
            smax = np.where(hit, S, -np.inf).max(axis=1)
            yield pd.DataFrame({
                id_col: ids[keep],
                "n_matches": nm[keep].astype("int64"),
                "max_cosine": smax[keep],
            })

    return corpus.select(id_col, vec_col).mapInPandas(run, out_schema)


def contaminated_ids(df: DataFrame, bench: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     bench_text_col: str | None = None,
                     n: int = 13) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM training-data
    hygiene step): ids of corpus documents sharing ANY word n-gram
    with a benchmark/eval set.

    Scale shape: the benchmark side is tiny by definition (eval sets,
    not corpora) — its distinct gram-hash set is BROADCAST, so the
    whole check is a map-side semi-join folded into the corpus scan:
    no corpus shuffle beyond the per-doc gram window.  Grams are
    compared as xxhash64 values (8 bytes), never as strings;
    contamination counts are hash-invariant (injective-modulo-2^-64).
    n=13 is the published convention; lower it for short-document
    corpora.
    """
    bench_text = bench_text_col or text_col
    bg = (
        shingle_rows(bench.select(F.col(bench_text).alias("_t"))
                     .withColumn("_bid", F.monotonically_increasing_id()),
                     "_bid", "_t", n)
        .select(F.xxhash64("_shingle").alias("_g")).distinct()
    )
    dg = shingle_rows(df, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("_shingle").alias("_g"))
    from pyspark.sql.functions import broadcast
    return (
        dg.join(broadcast(bg), "_g", "left_semi")
        .select(id_col).distinct()
    )


def decontaminate(df: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str | None = None,
                  n: int = 13, keep_flag: bool = False) -> DataFrame:
    """Drop (or, with ``keep_flag``, just mark) corpus documents that
    share any word n-gram with the benchmark set — see
    :func:`contaminated_ids` for the scale shape."""
    ids = contaminated_ids(df, bench, id_col, text_col, bench_text_col, n)
    if keep_flag:
        flagged = ids.withColumn("contaminated", F.lit(True))
        return df.join(flagged, id_col, "left").withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False)))
    return df.join(ids, id_col, "left_anti")


def dedup_segments(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", sep: str = "\n") -> DataFrame:
    """C4-style CROSS-CORPUS segment dedup (Raffel et al. 2020 §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once"): every distinct segment (line, by default) keeps
    only its FIRST occurrence corpus-wide — deterministic by
    (id, position) — and documents are reassembled from their
    surviving segments in order.  Complements the within-document
    repetition stats (text.line_repetition_stats) and the
    whole-document dedup family: this is the operator that strips
    boilerplate lines repeated across millions of pages.

    Scale shape: the canonical (id, pos) per segment comes from ONE
    segment-keyed groupBy (min of an (id, pos) struct — total order,
    no ties) whose map-side partial aggregation absorbs
    mass-duplicated lines before the shuffle, joined back
    AQE-skew-splittably; then one shuffle on the doc id to
    reassemble.  NOT a row_number window partitioned by the segment:
    a boilerplate line repeated millions of times corpus-wide would
    put its whole partition in a single window task, and AQE skew
    handling splits skewed joins, not window partitions (the
    duplicate_spans contract).  The groupBy keys on the segment VALUE
    (exact, no hash-collision caveat) — at 100 TB pre-hash the
    segment to a 16-byte key and keep the text map-side if segments
    are long.

    Documents whose every segment is dropped come back with empty
    text (callers filter; dropping them silently would hide the
    effect).  Returns (id_col, text_col).
    """
    import re as _re

    seg = df.select(
        F.col(id_col),
        # escape: F.split takes a REGEX; sep is a literal separator
        # (sep='|' or '.' must not become an empty-alternation/any-char
        # pattern while concat_ws rejoins with the literal)
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("_pos", "_seg"),
    )
    occ = seg.groupBy("_seg").agg(
        F.min(F.struct(F.col(id_col).alias("_kid"),
                       F.col("_pos").alias("_kpos"))).alias("_keep"))
    kept = (seg.join(occ, "_seg")
            .where((F.col(id_col) == F.col("_keep._kid"))
                   & (F.col("_pos") == F.col("_keep._kpos"))))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.concat_ws(sep, F.sort_array(
            F.collect_list(F.struct("_pos", "_seg"))).getField("_seg"))
             .alias(text_col))
    )
    # docs whose every segment was dropped still come back (empty text)
    return (
        df.select(id_col).join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )


def exact_text_dedup(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Keep-first exact content dedup on the RAW text's md5 (no
    normalization — byte-identical duplicates only, the semantics
    the corpus-pipeline oracles replay with ``md5(text)``), smallest
    id wins.  The shared stage-2 of the curation pipelines.

    Scale shape: the survivor id per fingerprint comes from a grouped
    ``min(id)`` whose map-side partial aggregation collapses
    mass-duplicated content BEFORE the shuffle (the agg moves
    (16-byte fp, id) pairs only, never documents), and survivors are
    selected by an equi-join back on (fp, id) — AQE-skew-splittable.
    NOT a row_number window partitioned by the fingerprint: one
    document duplicated millions of times corpus-wide would land its
    whole partition in a single window task (AQE splits skewed joins,
    not window partitions — the duplicate_spans/dedup_segments
    contract).  Precondition: unique non-null ``id_col`` (the join
    back identifies the surviving row by it)."""
    fp = F.md5(F.col(text_col))
    occ = df.groupBy(fp.alias("_fp")).agg(F.min(id_col).alias("_kid"))
    return (
        df.join(occ, fp.eqNullSafe(F.col("_fp"))
                & (F.col(id_col) == F.col("_kid")))
        .drop("_fp", "_kid")
    )


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 50,
                    sep: str = " ",
                    scope_col: str | None = None,
                    explode_partitions: int | None = None) -> DataFrame:
    """Substring-level duplicate detection (Lee et al. 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language
    Models Better", ExactSubstr): a ``window``-token sliding window
    is DUPLICATED when its token content occurs at more than one
    (doc, position) corpus-wide; ``m`` consecutive duplicated windows
    pin an exactly-repeated substring of ``window + m - 1`` tokens.
    The paper's suffix array is a single-machine construction; this
    is the equivalent windowed-hash formulation that distributes —
    detection is identical for spans >= ``window`` tokens (shorter
    spans are below the dedup threshold by definition).

    Returns one row per input doc:
    (id_col, n_windows, n_dup_windows, max_dup_run,
    max_dup_span_tokens) — max_dup_span_tokens is the longest
    exactly-duplicated substring's token length (0 when none; docs
    shorter than ``window`` tokens have 0 windows and 0 everywhere).

    Scale shape — two linear shuffles, no pair space:

    1. explode to (id, pos, xxhash64(window-slice)) — the shuffle
       carries an 8-byte hash, never window text; the corpus-wide
       occurrence count is a hash-keyed groupBy (map-side partial
       combine absorbs mass-duplicated windows) joined back onto the
       hashed rows (AQE skew-splittable).  The oracle replays duplication
       classes with raw gram strings — identical under an injective
       hash, the ds_decontaminate contract.
    2. per-doc gaps-and-islands (_pos − row_number over duplicated
       positions) finds the longest consecutive duplicated run; the
       run rollup and the per-doc stats reuse the same doc-keyed
       partitioning.

    ``scope_col`` scopes duplication within a shard/source (the
    incremental variant).  ``explode_partitions`` spreads docs BEFORE
    the row-amplifying explode (single-split parquet inputs otherwise
    run the whole explode in one task — the SCALE.md §16 hazard).
    Precondition: ``id_col`` values are unique (the per-doc joins key
    on it) — the global_shuffle contract.
    """
    toks = F.split(F.col(text_col), sep)
    scope = [scope_col] if scope_col else []
    base = df.select(*scope, F.col(id_col).alias("_id"),
                     toks.alias("_toks"), F.size(toks).alias("_n"))
    eligible = base.where(F.col("_n") >= window)
    if explode_partitions:
        eligible = eligible.repartition(explode_partitions, "_id")
    pos = eligible.select(
        *scope, "_id", "_toks",
        F.explode(F.sequence(F.lit(1), F.col("_n") - window + 1))
        .alias("_pos"))
    hashed = pos.select(
        *scope, "_id", "_pos",
        F.xxhash64(F.slice("_toks", F.col("_pos"), window)).alias("_h"))
    # corpus-wide occurrence count as groupBy + join, NOT a window:
    # a mass-duplicated window (boilerplate repeated millions of
    # times) would put all its rows in a single window-partition
    # task, and AQE skew handling splits skewed JOINS, not window
    # partitions.  The groupBy gets map-side partial aggregation on
    # the hot key and the join back is AQE-skew-splittable.
    hcnt = (hashed.groupBy(*(scope + ["_h"]))
            .agg(F.count(F.lit(1)).alias("_cnt")))
    marked = hashed.join(hcnt, scope + ["_h"])
    wd = Window.partitionBy("_id").orderBy("_pos")
    runs = (
        marked.where(F.col("_cnt") > 1)
        .withColumn("_isl", F.col("_pos") - F.row_number().over(wd))
        .groupBy("_id", "_isl").agg(F.count(F.lit(1)).alias("_run"))
        .groupBy("_id").agg(F.max("_run").alias("max_dup_run"))
    )
    stats = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("_cnt") > 1, 1).otherwise(0))
        .alias("n_dup_windows"),
    )
    out = (
        base.select("_id")
        .join(stats, "_id", "left")
        .join(runs, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("max_dup_run", F.lit(0)).alias("max_dup_run"),
            F.when(F.coalesce("max_dup_run", F.lit(0)) > 0,
                   F.coalesce("max_dup_run", F.lit(0)) + (window - 1))
            .otherwise(F.lit(0)).alias("max_dup_span_tokens"),
        )
    )
    return out


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", window: int = 50,
                           sep: str = " ", keep: str = "first",
                           explode_partitions: int | None = None
                           ) -> DataFrame:
    """The EXCISION half of ExactSubstr dedup (Lee et al. 2021,
    arXiv:2107.06499 §4.1 — :func:`duplicate_spans` detects; this
    removes): every ``window``-token sliding window whose content
    occurs at more than one (doc, position) corpus-wide keeps exactly
    ONE canonical occurrence — ``keep='first'`` = the smallest
    (id, position), ``keep='last'`` the largest — and every other
    occurrence's token range is cut out of its document.  Overlapping
    and contiguous cut ranges merge before excision, so a long
    repeated passage is removed as one block (the paper's behavior:
    duplicated RANGES are excised, not individual windows).

    Returns the input frame with ``text_col`` rewritten (remaining
    tokens rejoined by ``sep``) plus ``n_tokens_kept`` /
    ``n_tokens_removed``; all other input columns pass through.  A
    fully-duplicated non-canonical doc comes back with empty text and
    n_tokens_kept = 0 — downstream length filters drop it.

    Scale shape (same skeleton as :func:`duplicate_spans` — no pair
    space, nothing driver-side):

    1. explode to (id, pos, xxhash64(window-slice)); occurrence
       counts + the canonical (id, pos) come from ONE hash-keyed
       groupBy (min/max of a (id, pos) struct — total order, no
       ties), joined back AQE-skew-splittably;
    2. non-canonical positions merge into cut ranges per doc
       (gaps-and-islands: a new island when the next start is more
       than ``window`` beyond the previous — `== window` means the
       ranges touch and merge);
    3. excision is per-doc SLICING, not token explosion: the kept
       text is the concatenation of ``F.slice`` calls between
       consecutive cut ranges (an O(#ranges) higher-order transform
       per doc; the token copying stays JVM-side), so the rebuild
       pass is a narrow map over the doc-keyed join — the corpus is
       never exploded to one-row-per-token.

    Preconditions: unique ``id_col`` (canonical selection and the
    rebuild join key on it) and ``id_col`` values orderable (the
    struct min/max IS the keep rule).  Iterating the pass can expose
    NEW duplicates (removal glues previously-distant tokens
    together); the paper runs one pass and so does this.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    toks = F.split(F.col(text_col), sep)
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"),
                     F.size(toks).alias("_n"))
    eligible = base.where(F.col("_n") >= window)
    if explode_partitions:
        eligible = eligible.repartition(explode_partitions, "_id")
    pos = eligible.select(
        "_id", "_toks",
        F.explode(F.sequence(F.lit(1), F.col("_n") - window + 1))
        .alias("_pos"))
    hashed = pos.select(
        "_id", "_pos",
        F.xxhash64(F.slice("_toks", F.col("_pos"), window)).alias("_h"))
    pick = F.min if keep == "first" else F.max
    occ = hashed.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_cnt"),
        pick(F.struct(F.col("_id").alias("kid"),
                      F.col("_pos").alias("kpos"))).alias("_keep"))
    cuts = (hashed.join(occ.where(F.col("_cnt") > 1), "_h")
            .where(~((F.col("_id") == F.col("_keep.kid"))
                     & (F.col("_pos") == F.col("_keep.kpos"))))
            .select("_id", "_pos"))
    wd = Window.partitionBy("_id").orderBy("_pos")
    prev = F.lag("_pos").over(wd)
    brk = F.when(prev.isNull() | (F.col("_pos") - prev > window),
                 1).otherwise(0)
    ranges = (cuts.withColumn("_isl", F.sum(brk).over(wd))
              .groupBy("_id", "_isl")
              .agg(F.min("_pos").alias("_s"),
                   (F.max("_pos") + window - 1).alias("_e")))
    merged = ranges.groupBy("_id").agg(
        F.array_sort(F.collect_list(F.struct("_s", "_e"))).alias("_rng"))
    # kept tokens = slices between cut ranges: starts = 1, e_i + 1;
    # ends = s_i - 1, n.  slice(lo, max(hi-lo+1, 0)) yields [] for
    # inverted bounds (adjacent ranges / a cut at either edge).
    starts = F.concat(F.array(F.lit(1)),
                      F.transform("_rng", lambda r: r["_e"] + 1))
    ends = F.concat(F.transform("_rng", lambda r: r["_s"] - 1),
                    F.array(F.col("_n")))
    kept_sliced = F.flatten(F.zip_with(
        starts, ends,
        lambda lo, hi: F.slice("_toks", lo,
                               F.greatest(hi - lo + F.lit(1), F.lit(0)))))
    per_doc = (base.join(merged, "_id", "left")
               .select("_id", "_n",
                       F.when(F.col("_rng").isNull(), F.col("_toks"))
                       .otherwise(kept_sliced).alias("_kept")))
    rebuilt = per_doc.select(
        F.col("_id").alias(id_col),
        F.array_join("_kept", sep).alias(text_col),
        F.size("_kept").alias("n_tokens_kept"),
        (F.col("_n") - F.size("_kept")).alias("n_tokens_removed"))
    passthrough = [c for c in df.columns if c != text_col]
    return df.select(*passthrough).join(rebuilt, id_col)


def remove_frequent_lines(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", sep: str = "\n",
                          min_count: int = 3, keep: str = "first",
                          normalize: bool = True,
                          min_chars: int = 0) -> DataFrame:
    """CORPUS-level boilerplate-line removal (the CCNet/RefinedWeb
    cleaning pass; C4 applies the same idea at span granularity —
    that variant is :func:`remove_duplicate_spans`): a line whose
    normalized form occurs ``>= min_count`` times ACROSS THE WHOLE
    CORPUS is navigation chrome / cookie banner / license boilerplate,
    not content.  ``keep='first'`` retains the single globally-first
    occurrence (min (id, position)); ``keep='none'`` removes every
    occurrence.  Documents are rebuilt with surviving lines in
    original order (possibly empty), and every input document appears
    in the output.  ``min_chars`` exempts SHORT lines from removal
    (the CCNet refinement: blank lines, list bullets and one-word
    lines repeat corpus-wide by nature and are structure, not
    boilerplate — only normalized lines of >= min_chars characters
    become removal candidates).

    Scale shape (100 TB): lines shuffle once as (128-bit key, count)
    for the frequency aggregate — map-side combined, two independent
    xxhash64 halves: ``xxhash64(line)`` and ``xxhash64(salt, line)``
    with the salt hashed FIRST so the running seed differs before the
    text is mixed in (``xxhash64(line, salt)`` would be a pure
    function of the first half — ADVICE r7) (16 bytes; a single
    64-bit key hits birthday
    collisions near 2^32 distinct lines, i.e. guaranteed at
    billions-of-lines corpus scale, and a collision here DELETES
    genuine content — the round-6 ADVICE finding), never the line
    text; the flagged table holds ONLY lines at
    ``>= min_count`` (boilerplate is a vanishing fraction of distinct
    lines), so the probe join's build side is small — AQE broadcasts
    it when it fits and a corpus-common line skews only the COUNT
    aggregate, which partial aggregation absorbs (this is the grouped-
    agg-not-window shape per the r5 bigram-LM lesson).  The rebuild is
    one groupBy(id) over (pos, line) rows — the same row-amplification
    budget as the span-removal pass.
    """
    import re as _re

    if keep not in ("first", "none"):
        raise ValueError(f"keep must be first|none, got {keep!r}")
    par = df.sparkSession.sparkContext.defaultParallelism
    norm = (F.trim(F.lower("_line")) if normalize else F.col("_line"))
    lines = (df.repartition(par, id_col)
             .select(F.col(id_col).alias("_id"),
                     F.posexplode(F.split(F.col(text_col),
                                          _re.escape(sep)))
                     .alias("_pos", "_line"))
             .withColumn("_lk", F.xxhash64(norm))
             # salt FIRST (ADVICE r7): xxhash64's multi-column chain
             # seeds each column with the running hash, so
             # xxhash64(norm, salt) is a pure function of
             # xxhash64(norm) — any _lk collision would imply an _lk2
             # collision and the pair would add zero resistance.
             # Hashing the salt first makes the seed differ BEFORE
             # the text is mixed in, giving a genuinely independent
             # second 64 bits (a joint collision needs both halves).
             .withColumn("_lk2", F.xxhash64(F.lit(0x5f17), norm)))
    candidates = lines
    if min_chars > 0:
        candidates = lines.where(
            F.length(F.trim(F.col("_line")) if normalize
                     else F.col("_line")) >= min_chars)
    flagged = (candidates.groupBy("_lk", "_lk2")
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.min(F.struct(F.col("_id").alias("i"),
                                   F.col("_pos").alias("p")))
                    .alias("_first"))
               .where(F.col("_n") >= min_count))
    joined = lines.join(flagged, ["_lk", "_lk2"], "left")
    keep_col = F.col("_n").isNull()
    if keep == "first":
        keep_col = keep_col | ((F.col("_first.i") == F.col("_id"))
                               & (F.col("_first.p") == F.col("_pos")))
    per_doc = (joined
               .groupBy("_id")
               .agg(F.sum(keep_col.cast("int")).alias("n_kept"),
                    F.sum((~keep_col).cast("int")).alias("n_removed"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(keep_col,
                                       F.struct(F.col("_pos").alias("p"),
                                                F.col("_line").alias("l"))))),
                            lambda s: s["l"]), sep).alias("_clean")))
    passthrough = [c for c in df.columns if c != text_col]
    return (df.select(*passthrough)
            .join(per_doc.withColumnRenamed("_id", id_col), id_col)
            .withColumn(text_col, F.col("_clean")).drop("_clean"))


def _prep_signatures(docs: DataFrame, id_col: str, text_col: str,
                     shingle_k: int, n_hashes: int, n_bands: int,
                     hash_fn: str) -> DataFrame:
    """(id, _sh, _sig, _bands) — the full per-doc MinHash artifact."""
    prepped = minhash_signatures(docs, id_col, text_col, shingle_k,
                                 n_hashes, hash_fn=hash_fn)
    return prepped.withColumn(
        "_bands", minhash_bands(F.col("_sig"), n_bands,
                                n_hashes // n_bands, hash_fn=hash_fn))


def materialize_signatures(docs: DataFrame, path: str,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           shingle_k: int = 3, n_hashes: int = 16,
                           n_bands: int = 8,
                           hash_fn: str = "md5") -> None:
    """Materialize the MinHash signature STORE once so that daily
    document batches dedup against the corpus in O(delta), never
    re-shingling the base — the dedup twin of
    :func:`retrieval.materialize_postings` /
    :func:`similarity.materialize_ivf_index`.

    Writes under ``path``:

    * ``signatures/`` — (id, _sh shingle set, _sig minhash array,
      _bands band keys): everything candidate generation AND exact
      verification need, so an incremental run touches the base
      corpus's TEXT never (at 100 TB the store is ~2 orders smaller
      than the corpus);
    * ``meta/`` — the sketch parameters, so appends and probes hash
      the exact same way the store was built (the
      :func:`similarity.append_ivf` meta contract).
    """
    spark = docs.sparkSession
    prepped = _prep_signatures(docs, id_col, text_col, shingle_k,
                               n_hashes, n_bands, hash_fn)
    prepped.write.mode("overwrite").parquet(f"{path}/signatures")
    (spark.createDataFrame(
        [(id_col, shingle_k, n_hashes, n_bands, hash_fn)],
        "id_col string, shingle_k int, n_hashes int, n_bands int, "
        "hash_fn string")
     .write.mode("overwrite").parquet(f"{path}/meta"))


def append_signatures(spark, path: str, new_docs: DataFrame,
                      text_col: str = "text") -> None:
    """Fold a new batch into the signature store: shingle + hash the
    DELTA only, append its rows.  Precondition: new ids are disjoint
    from the store (the append-not-upsert contract)."""
    m = spark.read.parquet(f"{path}/meta").head()
    prepped = _prep_signatures(new_docs, m["id_col"], text_col,
                               m["shingle_k"], m["n_hashes"],
                               m["n_bands"], m["hash_fn"])
    prepped.write.mode("append").parquet(f"{path}/signatures")


def dedup_pairs_against(spark, path: str, new_docs: DataFrame,
                        text_col: str = "text",
                        threshold: float = 0.5,
                        star_buckets_over: int | None = None,
                        broadcast_delta: bool = True) -> DataFrame:
    """Near-dup pairs of a NEW batch against a
    :func:`materialize_signatures` store (plus within the batch
    itself) — verified (a_id, b_id, jaccard) where at least one side
    is new, IDENTICAL to what the full-corpus pipeline would emit
    restricted to those pairs (LSH candidacy is pairwise: two docs
    are candidates iff they share a band key, a property of the two
    docs alone — so new×old ∪ new×new candidates from the store
    equal the full run's candidates touching a new doc, and the
    exact-Jaccard verify reads the stored shingle sets).

    Scale shape: the delta is shingled once; the store scan reads
    band keys + shingle sets only (no base text); the new-side band
    keys ride a BROADCAST into the store join when the batch is
    small (the common daily-append case), so candidate generation is
    a map-side probe of the store — pass ``broadcast_delta=False``
    for a backfill-sized batch and let AQE pick the join."""
    m = spark.read.parquet(f"{path}/meta").head()
    id_col = m["id_col"]
    prepped = _prep_signatures(new_docs, id_col, text_col,
                               m["shingle_k"], m["n_hashes"],
                               m["n_bands"], m["hash_fn"])
    from ._cache import scoped_persist
    prepped = scoped_persist(prepped, "incremental_prepped")
    stored = spark.read.parquet(f"{path}/signatures")
    nn = lsh_candidate_pairs(prepped, id_col, "_bands",
                             star_buckets_over=star_buckets_over)
    nb = prepped.select(F.col(id_col).alias("_nid"),
                        F.explode("_bands").alias("bk")) \
        .select("_nid", "bk.band", "bk.key")
    sb = stored.select(F.col(id_col).alias("_oid"),
                       F.explode("_bands").alias("bk")) \
        .select("_oid", "bk.band", "bk.key")
    nb_side = F.broadcast(nb) if broadcast_delta else nb
    no = (
        sb.join(nb_side, ["band", "key"])
        .where(F.col("_oid") != F.col("_nid"))
        .select(F.least("_oid", "_nid").alias("a_id"),
                F.greatest("_oid", "_nid").alias("b_id"))
        .distinct()
    )
    cands = nn.union(no).distinct()
    sets = (stored.select(F.col(id_col), F.col("_sh"))
            .unionByName(prepped.select(F.col(id_col), F.col("_sh"))))
    return jaccard_pairs(sets, id_col, "_sh", pairs=cands,
                         threshold=threshold)


def image_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                    hi_col: str = "ahash_hi", lo_col: str = "ahash_lo",
                    max_dist: int = 3) -> DataFrame:
    """Near-duplicate IMAGE pairs by aHash hamming distance
    (:func:`..multimodal.image_ahash` signatures): banded pigeonhole
    candidates + exact popcount verify — the simhash machinery
    applied to the perceptual hash.

    The 64-bit signature splits into four 16-bit bands; two images
    within hamming distance ``max_dist`` ≤ 3 MUST agree on at least
    one band (pigeonhole over 4 bands), so candidate generation is
    four hash-bucket joins — never the image pair space.  Distances
    above n_bands − 1 lose the recall guarantee (raise the band
    count, not the threshold).  Returns (a_id, b_id, dist)."""
    if max_dist > 3:
        raise ValueError(
            "image_dup_pairs: 4 bands guarantee recall only for "
            f"max_dist <= 3 (got {max_dist})")
    bands = F.array(
        F.shiftrightunsigned(F.col(hi_col), 16) % 65536,
        F.col(hi_col) % 65536,
        F.shiftrightunsigned(F.col(lo_col), 16) % 65536,
        F.col(lo_col) % 65536,
    )
    ex = df.select(F.col(id_col).alias("_id"),
                   F.col(hi_col).alias("_hi"), F.col(lo_col).alias("_lo"),
                   F.posexplode(bands).alias("_b", "_k"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(b, (F.col("a._b") == F.col("b._b"))
               & (F.col("a._k") == F.col("b._k"))
               & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"),
                (F.bit_count(F.col("a._hi").bitwiseXOR(F.col("b._hi")))
                 + F.bit_count(F.col("a._lo").bitwiseXOR(F.col("b._lo"))))
                .alias("dist"))
        .where(F.col("dist") <= max_dist)
        .distinct()
    )
    return cand


def materialize_clusters(spark, path: str, ids: DataFrame,
                         pairs: DataFrame, id_col: str = "doc_id") -> None:
    """Materialize the near-dup CLUSTER store: (doc_id, canon_id) for
    EVERY corpus id — members carry their component's minimum id,
    singletons themselves.  The third artifact of the incremental
    dedup lifecycle (signatures find pairs, clusters assign
    canonicals); a curation pipeline keeps ``doc_id == canon_id``
    rows and drops the rest.

    Writes ``canon/`` plus an empty ``remap/`` —
    :func:`append_clusters` appends batch assignments to canon/ and
    merge events (two existing clusters united by a new doc) to
    remap/, which :func:`read_canonical` resolves at read
    (merge-on-read; periodically re-materialize to compact)."""
    labels = connected_components_star(pairs)
    canon = (
        ids.select(F.col(id_col).alias("doc_id"))
        .join(labels.select(F.col("node").alias("doc_id"),
                            F.col("comp").alias("canon_id")),
              "doc_id", "left")
        .select("doc_id",
                F.coalesce("canon_id", F.col("doc_id")).alias("canon_id"))
    )
    canon.write.mode("overwrite").parquet(f"{path}/canon")
    (canon.select(F.col("canon_id").alias("old_canon"),
                  F.col("canon_id").alias("new_canon"))
     .limit(0).write.mode("overwrite").parquet(f"{path}/remap"))


def append_clusters(spark, path: str, new_ids: DataFrame,
                    new_pairs: DataFrame,
                    id_col: str = "doc_id") -> None:
    """Fold a batch into the cluster store in O(batch + merges):
    CONTRACT every old endpoint of the batch's near-dup pairs to its
    stored canonical, run connected components over just the
    batch-induced contracted graph (old clusters are super-nodes —
    never re-expanded), then:

    * every new doc gets its component's minimum id (= the GLOBAL
      minimum of the merged component, since an old canonical is
      already its old component's minimum) — appended to canon/;
    * an old canonical landing in a component with a smaller minimum
      is a MERGE event — (old_canon, new_canon) appended to remap/,
      applied lazily by :func:`read_canonical` instead of rewriting
      the old cluster's rows.

    Incremental ≡ full-run: contracting a component to its canonical
    preserves connectivity, so the resulting canonicals equal a
    from-scratch CC over the whole corpus's pair graph (the
    ds_incremental_clusters gate pins this).  Preconditions: batch
    ids disjoint from the store; every old endpoint in ``new_pairs``
    already materialized (the dedup_pairs_against contract)."""
    canon = read_canonical(spark, path)
    ca = canon.select(F.col("doc_id").alias("a_id"),
                      F.col("canon_id").alias("_ca"))
    cb = canon.select(F.col("doc_id").alias("b_id"),
                      F.col("canon_id").alias("_cb"))
    contracted = (
        new_pairs.select("a_id", "b_id")
        .join(ca, "a_id", "left").join(cb, "b_id", "left")
        .select(F.coalesce("_ca", F.col("a_id")).alias("a_id"),
                F.coalesce("_cb", F.col("b_id")).alias("b_id"))
        .where(F.col("a_id") != F.col("b_id"))
    )
    labels = connected_components_star(contracted)
    new_rows = (
        new_ids.select(F.col(id_col).alias("doc_id"))
        .join(labels.select(F.col("node").alias("doc_id"),
                            F.col("comp").alias("canon_id")),
              "doc_id", "left")
        .select("doc_id",
                F.coalesce("canon_id", F.col("doc_id")).alias("canon_id"))
    )
    new_rows.write.mode("append").parquet(f"{path}/canon")
    old_canons = canon.select(F.col("canon_id").alias("node")).distinct()
    merges = (
        labels.join(old_canons, "node")
        .where(F.col("comp") != F.col("node"))
        .select(F.col("node").alias("old_canon"),
                F.col("comp").alias("new_canon"))
        .distinct()
    )
    merges.write.mode("append").parquet(f"{path}/remap")


#: read_canonical collects merge EVENTS driver-side — O(merges) by
#: construction, but unbounded in principle if a store is appended
#: for years without rebuilding.  ~50M rows ≈ 1-2 GB of driver heap:
#: refuse beyond this and point at the rebuild path.
REMAP_GUARD_ROWS = 50_000_000


def read_canonical(spark, path: str) -> DataFrame:
    """(doc_id, canon_id) with remap chains RESOLVED — the current
    canonical assignment.  Remap rows are merge EVENTS (rare, small
    by construction: one row per pair of united clusters), so chains
    resolve driver-side with path compression and apply as one
    broadcast join — O(merges) work regardless of corpus size.
    Guarded: beyond ``REMAP_GUARD_ROWS`` accumulated events the
    collect would strain the driver — rebuild the store
    (:func:`materialize_clusters` over ``read_canonical``-resolved
    assignments folds every event into canon/ and empties remap/)."""
    canon = spark.read.parquet(f"{path}/canon")
    remap_df = spark.read.parquet(f"{path}/remap")
    n_remap = remap_df.count()
    if n_remap > REMAP_GUARD_ROWS:
        raise ValueError(
            f"read_canonical: {n_remap} accumulated remap events exceed "
            f"REMAP_GUARD_ROWS={REMAP_GUARD_ROWS}; rebuild the cluster "
            f"store (materialize_clusters over the resolved assignments) "
            f"to fold merge history into canon/")
    remap_rows = remap_df.collect()
    if not remap_rows:
        return canon
    m = {}
    for r in remap_rows:
        m[r["old_canon"]] = r["new_canon"]

    def resolve(x):
        seen = []
        while x in m:
            seen.append(x)
            x = m[x]
        for s in seen:
            m[s] = x
        return x

    resolved = [(k, resolve(k)) for k in list(m)]
    rm = spark.createDataFrame(resolved, canon.schema.names) \
        .withColumnRenamed("doc_id", "_old") \
        .withColumnRenamed("canon_id", "_new")
    return (canon.join(F.broadcast(rm),
                       canon.canon_id == rm._old, "left")
            .select("doc_id",
                    F.coalesce("_new", F.col("canon_id"))
                    .alias("canon_id")))
