"""Deterministic sampling for training-data pipelines.

The reference library (eflglobal/filters) has no sampling surface;
this is part of the large-scale-pipeline extension layer (SURVEY.md
§2.9 "beyond-reference ops").  Everything here is HASH-derived, not
RNG-derived, on purpose:

- reproducible across runs, retries, engines, and cluster sizes —
  ``rand()`` re-rolls per task attempt, an md5 threshold never does;
- exactly replayable by any engine with an md5() function, which is
  what puts these ops under the DuckDB correctness gate;
- stable under repartitioning: the keep/drop decision is a pure
  function of the row's key, so a 100 TB backfill and an incremental
  top-up select the *same* rows.

Mechanism: ``md5(key)`` is 32 lowercase hex chars ≈ a uniform draw
in [0, 1) when read as a hex fraction.  Keeping rows where the hex
string compares ``<`` a threshold prefix keeps that fraction of the
keyspace — string comparison, no numeric parsing, identical in every
engine.  ``rate_to_hex_threshold(0.2)`` → ``'33333333'`` (0x33333333
/ 16^8 ≈ 0.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "top_fraction_by_group",
    "rate_to_hex_threshold",
    "hash_keep",
    "hash_uniform",
    "stratified_sample",
    "stratified_fixed_n",
    "hash_bucket",
    "domain_mixture_sample",
    "token_budget_sample",
    "temperature_mixture_sample",
    "global_shuffle",
    "hash_reservoir",
    "pps_systematic_sample",
]

_HEX_DIGITS = 8  # 16^8 = 4.29e9 distinct thresholds — plenty of rate resolution

# NULL keys hash this sentinel instead of propagating NULL through
# md5 (which would make every comparison NULL and silently DROP the
# row even at rate=1.0 — a nullable sampling key must not shrink the
# corpus).  NULL-keyed rows are sampled/bucketed as one deterministic
# pseudo-key; callers wanting different treatment filter them first.
_NULL_SENTINEL = "\u0000filters_spark:null-key"


def _key_hex(key: Column) -> Column:
    """md5 hex draw for a key; NULL-safe via the sentinel."""
    return F.md5(F.coalesce(key.cast("string"), F.lit(_NULL_SENTINEL)))


def rate_to_hex_threshold(rate: float) -> str:
    """Hex prefix t such that P[md5(key) < t] == round(rate * 16^8) / 16^8.

    The returned string is an engine-portable literal: the same
    comparison in Spark, DuckDB, Trino, ... selects the same rows.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = round(rate * (16 ** _HEX_DIGITS))
    if n >= 16 ** _HEX_DIGITS:
        return "g"  # sorts after every hex digit → keep all
    return format(n, f"0{_HEX_DIGITS}x")


def hash_keep(key: Column, rate: float) -> Column:
    """Boolean: does this key fall in the kept ``rate`` fraction?

    Pure per-row predicate — survives predicate pushdown, costs one
    md5 per row, no shuffle, no state, no seed to manage.  NULL keys
    participate via a sentinel (kept at rate=1.0, never silently
    dropped).
    """
    return _key_hex(key) < F.lit(rate_to_hex_threshold(rate))


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates: dict[str, float],
                      default_rate: float = 1.0) -> DataFrame:
    """Per-stratum deterministic downsampling: stratum value → keep
    rate (e.g. ``{'en': 0.25}`` rebalances an English-heavy corpus).

    The rate lookup compiles to one CASE WHEN over broadcast
    literals; the keep decision stays a scan-level predicate, so at
    100 TB this is a single filtered pass — no shuffle, no
    per-stratum count pre-pass, and appending new data never changes
    which old rows are kept.
    """
    hexcol = _key_hex(F.col(key))
    expr: Column = F.lit(rate_to_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum) == value,
                      F.lit(rate_to_hex_threshold(rate))).otherwise(expr)
    return df.where(hexcol < expr)


def stratified_fixed_n(df: DataFrame, key: str, stratum: str,
                       n_per_stratum: int, salt: int = 32) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sampling (eval-set
    construction: "500 docs per language"): rows ranked within each
    stratum by their md5 draw (key tie-break) and the first n kept.

    Unlike the rate-based :func:`stratified_sample` (a pure scan
    predicate), a fixed-n contract needs a per-stratum order.  Scale
    shape — TWO-PHASE top-n so no task ever sorts a whole stratum
    (a 100 TB corpus with 5 languages must not funnel 20 TB through
    one window task):

    1. rows are salted into ``salt`` deterministic sub-groups (md5
       chars 9-14 — independent of the chars 1-8 that drive the rank
       order) and a (stratum, salt)-keyed window keeps each group's
       local top-n — parallelism = strata × salt;
    2. the global (md5, key)-ordered window runs over the ≤ n·salt
       survivors per stratum — a bounded, tiny input regardless of
       corpus size.

    Output is provably identical to the single-window form: every
    global top-n row is in its salt group's top-n, and the phase-2
    order (draw, key) is total.  Still deterministic across engines /
    retries / partitionings (hash order, not RNG), and stable under
    APPENDS-ONLY-at-the-tail semantics: a new row evicts the current
    rank-n row only if its draw is smaller, which is the documented
    reservoir-like behavior (use :func:`hash_keep` when append
    stability of the kept SET matters more than the exact size).
    ``salt=1`` recovers the single-window plan (useful when
    n_per_stratum is so large that n·salt survivors would dominate).
    Precondition: ``key`` values are unique within each stratum —
    duplicate keys tie on (draw, key) and the rank between their
    rows is then partition-order-dependent."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    draw = _key_hex(F.col(key))
    if salt == 1:
        w = Window.partitionBy(stratum).orderBy(draw, F.col(key))
        return (df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= n_per_stratum)
                .drop("_rn"))
    salted = df.withColumn("_draw", draw).withColumn(
        "_salt",
        (F.conv(F.substring("_draw", 9, 6), 16, 10) % salt).cast("int"))
    w1 = Window.partitionBy(stratum, "_salt").orderBy("_draw", F.col(key))
    survivors = (salted.withColumn("_rn", F.row_number().over(w1))
                 .where(F.col("_rn") <= n_per_stratum)
                 .drop("_rn", "_salt"))
    w2 = Window.partitionBy(stratum).orderBy("_draw", F.col(key))
    return (survivors.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= n_per_stratum)
            .drop("_rn", "_draw"))


def hash_bucket(key: Column, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) from the key's md5 — for
    deterministic train/validation/test splits (``bucket < 8`` is an
    80% train split that never leaks rows across re-runs).  NULL keys
    land in one deterministic bucket via the sentinel — every row gets
    a split."""
    return (F.conv(F.substring(_key_hex(key), 1, 8), 16, 10)
            .cast("long") % n_buckets).cast("int")


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform draw in [0, 1) from the key's md5 prefix
    (8 hex chars / 16^8) — the numeric form of :func:`hash_keep` for
    PER-ROW rates: ``hash_uniform(key) < rate_col`` samples each row
    with its own probability, still reproducible across engines and
    retries (both sides parse the same hex and perform the same IEEE
    division)."""
    return (
        F.conv(F.substring(_key_hex(key), 1, _HEX_DIGITS), 16, 10)
        .cast("double") / float(16 ** _HEX_DIGITS)
    )


def domain_mixture_sample(df: DataFrame, key: str, domain_col: str,
                          targets: dict[str, float]) -> DataFrame:
    """Downsample so the OUTPUT follows a target domain mixture
    (the pretraining-mix step: given observed per-domain counts n_d
    and target fractions t_d, the largest achievable corpus is
    S = min_d(n_d / t_d); each domain keeps t_d·S/n_d of its rows).

    Everything stays in-plan: the per-domain count aggregate is a
    narrow shuffle on the domain key; S is a 1-row aggregate over it;
    rates broadcast back onto the scan, where the keep decision is
    the deterministic ``hash_uniform(key) < rate`` predicate — two
    passes over the corpus total (count + filter), no driver collect,
    and the same rows are kept on every rerun/backfill.  Domains
    absent from ``targets`` are dropped (rate 0) — a mixture is a
    closed list by definition.

    A TARGETED domain with ZERO observed rows makes the mixture
    unachievable; the only output satisfying it is EMPTY, and that is
    what this returns (the target list left-joins the counts with a
    zero fill, so the missing domain drives S to 0) — never a
    silently mis-mixed corpus that quietly omits the absent domain.
    """
    from pyspark.sql.functions import broadcast

    for d, t in targets.items():
        if not t > 0:
            raise ValueError(
                f"domain_mixture_sample: target for {d!r} must be > 0 "
                f"(got {t}); omit the domain to drop it instead")
    target_expr: Column = F.lit(None).cast("double")
    for d, t in sorted(targets.items()):
        target_expr = F.when(F.col(domain_col) == d, F.lit(float(t))) \
            .otherwise(target_expr)
    counts = (
        df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_t", target_expr)
        .where(F.col("_t").isNotNull())
    )
    # `counts` only holds PRESENT targeted domains; if any targeted
    # domain is absent its implied n/t is 0, so S must be 0 — checked
    # by comparing the present-domain count to |targets| inside the
    # same 1-row aggregate (no extra join or literal frame)
    s = counts.agg(
        F.when(F.count(F.lit(1)) == len(targets),
               F.min(F.col("_n") / F.col("_t")))
        .otherwise(F.lit(0.0)).alias("_s"))
    rates = counts.crossJoin(broadcast(s)).select(
        F.col(domain_col),
        F.least(F.lit(1.0), F.col("_t") * F.col("_s") / F.col("_n"))
        .alias("_rate"),
    )
    return (
        df.join(broadcast(rates), domain_col)
        .where(hash_uniform(F.col(key)) < F.col("_rate"))
        .drop("_rate")
    )


def token_budget_sample(df: DataFrame, key: str, domain_col: str,
                        budgets: dict[str, int],
                        token_count_col: str = "_tok",
                        buckets: int = 64) -> DataFrame:
    """Fixed per-domain TOKEN budgets — the other way training
    mixtures are specified (\"200B tokens of web, 30B of code\"):
    within each budgeted domain, take documents in a deterministic
    hash-shuffled order until the cumulative token count would exceed
    the domain's budget, drop the rest.  The caller supplies a token
    count column (``token_count_col``, e.g. ``text.token_count`` —
    keeping the tokenizer choice out of the sampler).

    Deterministic and engine-exact: the order is
    (md5(key), key) — portable, uniformly shuffling, and total —
    and the cut is an integer cumulative-sum prefix (a document is
    kept iff its INCLUSIVE running total stays ≤ the budget, so the
    selected set is maximal-prefix and no partial document is ever
    implied).  Domains absent from ``budgets`` are dropped (a mixture
    is a closed list); a budget smaller than every document yields an
    empty domain.

    Scale shape — the per-domain prefix sum is TWO-PHASE, exactly the
    :func:`pps_systematic_sample` construction, so a heavy-tailed
    domain never serializes into one window task (the r9 VERDICT
    scale seam): the draw's first two hex chars RANGE-split each
    domain into ``buckets`` hash-uniform segments whose bucket-major
    order IS the draw order, so per-(domain, bucket) running sums
    compose EXACTLY into the domain's global prefix —

    1. phase 1 windows over (domain, bucket): parallelism =
       domains × buckets, each task ~|domain|/buckets rows (balanced
       by construction — the bucket is a hash prefix, not a data
       key);
    2. phase 2 offsets each bucket by the running total of the
       ≤ domains×buckets-row bucket-stats frame (scoped-persisted,
       broadcast back) — the keep test is
       ``offset + local_cum <= budget``.

    The selected set is PROVABLY IDENTICAL to the single-window form
    for every ``buckets`` (no seam tolerance: the composed prefix is
    the same integer for every row), pinned by pytest.  ``buckets=1``
    recovers the single-shuffle single-window plan — one corpus scan
    instead of two (the stats pass adds a narrow agg scan), the right
    trade when no domain is large enough to straggle one task."""
    from pyspark.sql.window import Window

    for d, b in budgets.items():
        if not int(b) >= 0:
            raise ValueError(
                f"token_budget_sample: budget for {d!r} must be >= 0")
    if not 1 <= buckets <= 256:
        raise ValueError(f"buckets must be in [1, 256], got {buckets}")
    budget_expr: Column = F.lit(None).cast("bigint")
    for d, b in sorted(budgets.items()):
        budget_expr = F.when(F.col(domain_col) == d,
                             F.lit(int(b))).otherwise(budget_expr)
    # the explicit isin is semantically the _budget null filter, but
    # UNLIKE the CASE-isNotNull form it pushes down to the scan
    ordered = (df.where(F.col(domain_col).isin(*sorted(budgets)))
               .withColumn("_budget", budget_expr)
               .withColumn("_ord", F.md5(F.col(key).cast("string"))))
    if buckets == 1:
        w = (Window.partitionBy(domain_col)
             .orderBy("_ord", key)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = F.sum(F.col(token_count_col).cast("bigint")).over(w)
        return (ordered.withColumn("_cum", cum)
                .where(F.col("_cum") <= F.col("_budget"))
                .drop("_budget", "_ord", "_cum"))
    # RANGE split (not modulo — bucket order must equal draw order so
    # the per-bucket sums compose into the draw-ordered prefix)
    rows = ordered.withColumn(
        "_b", F.expr(f"CAST((CAST(conv(substring(_ord, 1, 2), 16, 10) "
                     f"AS INT) * {buckets}) DIV 256 AS INT)"))
    from ._cache import scoped_persist
    bstats = scoped_persist(
        rows.groupBy(domain_col, "_b")
        .agg(F.sum(F.col(token_count_col).cast("bigint")).alias("_bw")),
        "token_budget_bstats")
    # ≤ domains×buckets rows: the per-domain running-total window is
    # bounded by the BUCKETS constant, not the data
    off_w = (Window.partitionBy(domain_col).orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    # _off stays NULL for an empty/all-NULL-token prefix — the
    # composed sum must be NULL-skipping exactly like the single
    # window's (a row before any non-NULL token has cum NULL and is
    # dropped; a NULL-token row AFTER one inherits the running sum)
    offs = bstats.withColumn(
        "_off", F.sum("_bw").over(off_w)).drop("_bw")
    in_b = (Window.partitionBy(domain_col, "_b")
            .orderBy("_ord", key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lcum = F.sum(F.col(token_count_col).cast("bigint")).over(in_b)
    composed = F.when(
        F.col("_off").isNull() & F.col("_lcum").isNull(),
        F.lit(None).cast("bigint"),
    ).otherwise(F.coalesce(F.col("_off"), F.lit(0)) +
                F.coalesce(F.col("_lcum"), F.lit(0)))
    return (rows.join(F.broadcast(offs), [domain_col, "_b"])
            .withColumn("_lcum", lcum)
            .withColumn("_cum", composed)
            .where(F.col("_cum") <= F.col("_budget"))
            .drop("_budget", "_ord", "_b", "_off", "_lcum", "_cum"))


def global_shuffle(df: DataFrame, key: str, n_shards: int,
                   shard_col: str = "shard",
                   pos_col: str = "pos") -> DataFrame:
    """Deterministic global training-data shuffle: assign every row a
    shard in [0, n_shards) and a position within its shard, both pure
    functions of ``key``'s md5 — the "shuffle the corpus before
    training" step without RNG.

    Why hash-order instead of ``orderBy(rand())``: the order is
    reproducible across runs/retries/engines (a preempted executor
    re-derives the same order), appending new rows perturbs only the
    positions after each insertion point instead of re-rolling the
    whole corpus, and any engine with md5 can replay the exact
    epoch-0 data order for a training-run audit.

    Scale shape: ONE shuffle keyed by shard (each shard ≈ n/n_shards
    rows — pick n_shards so a shard fits an output file target), and
    the per-shard sort that backs ``row_number`` is exactly the sort
    a sharded writer needs anyway, so ordering is free at write time.
    A global total order (one sort across all rows) is deliberately
    NOT offered: at 100 TB a single total order is a range-partition
    + sort over everything for no training benefit — shard-local
    order with hash-assigned shards is statistically equivalent.

    PRECONDITION: ``key`` must be unique (or rows sharing a key must
    be entirely identical).  Rows with equal keys tie on the whole
    sort key, and ``row_number`` then splits the tie by partition
    arrival order — their RELATIVE positions are not reproducible.
    Dedup first (``dedup.exact_dedup``) or derive a content id
    (``sources.readers.read_text_docs`` does) before shuffling.
    """
    h = _key_hex(F.col(key))
    w = Window.partitionBy(shard_col).orderBy(h, key)
    return (
        df.withColumn(shard_col, hash_bucket(F.col(key), n_shards))
        .withColumn(pos_col, F.row_number().over(w))
    )


def hash_reservoir(df: DataFrame, group_cols: list[str], key: str,
                   k: int) -> DataFrame:
    """Deterministic per-group reservoir: the k rows with the
    SMALLEST md5 draw per group — a uniform without-replacement
    k-sample that is stable across runs, engines, retries, and
    repartitioning (classic reservoir sampling is RNG- and
    order-dependent; the bottom-k-by-hash formulation is neither).
    Appending new rows can only displace current members the way a
    true reservoir would.

    One shuffle on the group key; the rank window prunes with
    WindowGroupLimit (top-k filter pushes into the sort), so the
    shuffle output per group is bounded by k.
    """
    w = Window.partitionBy(*group_cols).orderBy(_key_hex(F.col(key)), key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def pps_systematic_sample(df: DataFrame, key: str, weight_col: str,
                          n: int, buckets: int = 256) -> DataFrame:
    """Deterministic weighted sampling — systematic probability-
    proportional-to-size (PPS) over the hash order: n equally-spaced
    points are laid over the cumulative-weight axis (midpoint rule),
    and a row is selected once per point that lands inside its weight
    interval.  The inclusion probability of a row with weight w is
    min(1, n·w/W) — the data-mixing primitive for "sample documents
    proportional to length/quality score" — and the selection is a
    pure function of the corpus content: no RNG, no seed, identical
    across engines, retries, and partitionings.

    INTEGER-EXACT throughout, on purpose: weights must be an integral
    column (scale fractional scores to fixed-point first — e.g.
    millionths — exactly like :func:`expect_distribution` does); the
    crossing test is integer comparisons and integral division only,
    so the gate's value hash cannot flap on a cross-engine last-ulp
    (the module's ln/pow hazard note).  A point j in [0, n) sits at
    position floor((2j+1)·W / (2n)); row i with cumulative interval
    [start_i, end_i) is emitted with ``n_hits`` = #points inside —
    when every weight < W/n the output is EXACTLY n rows each with
    n_hits = 1; a mega-weight row absorbs several points into one
    output row (n_hits > 1), which callers repeat at materialization
    if with-replacement semantics are wanted.

    Scale shape — the global prefix sum is TWO-PHASE, never a global
    window: rows order by their md5 draw, whose first two hex chars
    split the axis into ``buckets`` hash-uniform segments (order by
    draw IS bucket-major order, so per-bucket sums compose exactly);
    phase 1 is a per-bucket window over ~|df|/buckets rows (balanced
    by construction — the bucket is a hash prefix, not a data key),
    phase 2 offsets each bucket by the running total of the ≤256-row
    bucket-stats frame (a bounded single-task window, same contract
    as expect_distribution's) broadcast back.  One data shuffle total
    (the per-bucket window); the stats frame adds a narrow agg.

    Zero-weight rows can never contain a point and drop out; a
    negative weight raises at run time (the check lives inside the
    summed expression, so the optimizer cannot prune it); an
    all-zero/empty corpus yields an empty frame.  Precondition:
    ``key`` unique (ties on (draw, key) are partition-order-
    dependent, as everywhere in this module)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 1 <= buckets <= 256:
        raise ValueError(f"buckets must be in [1, 256], got {buckets}")
    wtype = df.schema[weight_col].dataType.simpleString()
    if wtype not in ("int", "bigint", "smallint", "tinyint"):
        raise TypeError(
            f"pps_systematic_sample needs an integral weight column "
            f"(got {weight_col}:{wtype}); scale scores to fixed-point "
            f"integers first — integer exactness is what keeps the "
            f"selection identical across engines")
    draw = _key_hex(F.col(key))
    w_checked = F.when(
        F.col(weight_col) < 0,
        F.raise_error(F.concat(
            F.lit(f"pps_systematic_sample: negative weight in "
                  f"{weight_col!r}: "), F.col(weight_col).cast("string")))
        .cast("long"),
    ).otherwise(F.col(weight_col).cast("long"))
    rows = df.withColumn("_draw", draw).withColumn(
        # RANGE split of the 2-hex-char prefix (NOT a modulo, which
        # would scramble the bucket-major vs draw-major equivalence
        # for buckets < 256): bucket order == draw order, so the
        # per-bucket sums compose into the draw-ordered global prefix
        "_b", F.expr(f"CAST((CAST(conv(substring(_draw, 1, 2), 16, 10) "
                     f"AS INT) * {buckets}) DIV 256 AS INT)")
    ).withColumn("_w", w_checked.cast("decimal(38,0)"))
    # the ≤256-row stats frame feeds BOTH the offsets and the total;
    # without a barrier each branch re-aggregates (and re-SCANS) the
    # whole corpus — scoped_persist makes the stats pass run once
    from ._cache import scoped_persist
    bstats = scoped_persist(
        rows.groupBy("_b").agg(F.sum("_w").alias("_bw")), "pps_bstats")
    # ≤256 rows: the unpartitioned running-total window is bounded by
    # the BUCKETS constant, not the data (expect_distribution's
    # documented contract for tiny deliberate single-task windows)
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = bstats.withColumn(
        "_off", F.coalesce(F.sum("_bw").over(off_w),
                           F.lit(0).cast("decimal(38,0)")))
    total = offs.agg(F.sum("_bw").alias("_tw"))
    in_b = Window.partitionBy("_b").orderBy("_draw", F.col(key)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        rows.join(F.broadcast(offs.select("_b", "_off")), "_b")
        .crossJoin(F.broadcast(total))
        .withColumn("_end", F.col("_off") + F.sum("_w").over(in_b))
        .withColumn("_start", F.col("_end") - F.col("_w"))
    )

    def g(x: str) -> Column:
        # #points j with floor((2j+1)W/(2n)) < x  ==  #j with
        # (2j+1)W < 2nx  ==  min(n, (2nx - W - 1) div 2W + 1) for
        # positive a = 2nx - W, else 0 — integral DIV only, and the
        # div-by-zero branch (W = 0) is unreachable because a >= 1
        # requires x > 0 > cumulative weight under an all-zero corpus
        a = F.lit(2 * n).cast("decimal(38,0)") * F.col(x) - F.col("_tw")
        cnt = F.expr(
            f"CAST(((2*{n}*{x} - _tw - 1) DIV (2*_tw)) + 1 AS BIGINT)")
        return F.when(a < 1, F.lit(0)).otherwise(
            F.least(F.lit(n).cast("bigint"), cnt))

    return (
        cum.withColumn("n_hits", g("_end") - g("_start"))
        .where(F.col("n_hits") >= 1)
        .drop("_draw", "_b", "_w", "_off", "_tw", "_start", "_end")
    )


def temperature_mixture_sample(df: DataFrame, key: str, domain_col: str,
                               alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled mixture resampling — the multilingual
    pretraining practice of sampling domain d with probability
    proportional to n_d^alpha, alpha < 1 flattening the distribution
    toward low-resource domains (Conneau et al. 2020 use ~0.3-0.7).

    Unlike :func:`domain_mixture_sample` the targets are DERIVED from
    the data (t_d proportional to n_d^alpha), so the whole computation
    stays in-plan with no caller-supplied dict: per-domain counts (one
    narrow shuffle), weights w_d = n_d^alpha, and the keep rate
    r_d = (w_d/n_d) * min_e(n_e/w_e) — the normalizing sum of weights
    CANCELS out of t_d*S/n_d, so no cross-domain float accumulation
    exists anywhere.  For alpha = 1/2 this reduces to sqrt(n_min/n_d):
    the smallest domain survives whole and larger domains shrink by
    the square-root ratio.  The keep decision is the deterministic
    ``hash_uniform(key) < rate`` scan predicate (same rows on every
    rerun/backfill; no RNG, no driver collect).

    alpha = 0.5 computes weights with sqrt(), which IEEE 754 requires
    to be correctly rounded in every engine — the reason it is the
    default and the only alpha a hash gate should use; other alphas
    go through pow(), whose last ulp is not cross-engine guaranteed
    (fine in production, not under a value-hash oracle)."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    if alpha == 0.5:
        w = F.sqrt(F.col("_n"))
    else:
        w = F.pow(F.col("_n"), F.lit(float(alpha)))
    counts = counts.withColumn("_w", w)
    m = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_m"))
    rates = counts.crossJoin(F.broadcast(m)).select(
        F.col(domain_col),
        F.least(F.lit(1.0), F.col("_w") / F.col("_n") * F.col("_m"))
        .alias("_rate"))
    return (df.join(F.broadcast(rates), domain_col)
            .where(hash_uniform(F.col(key)) < F.col("_rate"))
            .drop("_rate"))


def top_fraction_by_group(df: DataFrame, score_col: str,
                          group_col: str, frac: float) -> DataFrame:
    """Keep (at most) the top ``frac`` of each group's rows by an
    INTEGER score — the per-domain quality-threshold selection every
    curation pipeline runs (CCNet/FineWeb-style "keep the best X% of
    each domain") — WITHOUT a per-group sort of the raw rows: a
    window ``percent_rank`` partitioned by domain puts the whole
    web-sized domain in one task (the ``token_budget_sample`` skew
    class), while this runs ONE map-side-combined (group, score)
    rollup and computes thresholds on the rollup — bounded by
    distinct scores per group, never row-sized.

    The kept set is ``score >= t_g`` where ``t_g`` is the smallest
    score whose from-the-top cumulative count is ≤
    ``floor(frac · n_g)`` — a closed integer definition (ties at the
    threshold either all qualify or none do, so the kept count is at
    most the target and the selection is deterministic and
    partition-invariant; exact-n within the boundary bucket is
    :func:`stratified_fixed_n`'s job).  Pick a ``frac`` with an exact
    binary representation for cross-engine gates.

    Returns the kept rows plus ``_threshold``.  NULL scores never
    qualify.  Groups too small for the fraction (``floor = 0``) keep
    nothing — the contract a mixture budget wants, not a surprise
    minimum of one.  A NULL group key is its own group (null-safe
    join back), not a silent row drop."""
    from .profile import _join_back_nullsafe
    w_top = (Window.partitionBy(group_col)
             .orderBy(F.col(score_col).desc())
             .rangeBetween(Window.unboundedPreceding, 0))
    cnt = (df.where(F.col(score_col).isNotNull())
           .groupBy(group_col, score_col)
           .agg(F.count(F.lit(1)).alias("_c")))
    cum = cnt.select(
        group_col, score_col, "_c",
        F.sum("_c").over(w_top).alias("_ctop"),
        F.sum("_c").over(Window.partitionBy(group_col)).alias("_n"))
    thr = (cum.groupBy(group_col)
           .agg(F.min(F.when(
               F.col("_ctop") <= F.floor(F.lit(frac) * F.col("_n")),
               F.col(score_col))).alias("_threshold")))
    return (_join_back_nullsafe(df, thr, [group_col])
            .where(F.col("_threshold").isNotNull()
                   & (F.col(score_col) >= F.col("_threshold"))))
