"""Graph analytics over edge lists: degrees and PageRank.

The reference library (eflglobal/filters) has no graph surface; this
extends the large-scale-pipeline layer (SURVEY.md §2.9) — link-graph
quality signals (PageRank over a hyperlink/domain graph) are a
standard web-corpus curation input alongside the dedup components in
:mod:`.dedup` (which already ship connected components).

Scale design: everything is edge-list relational — no adjacency
matrices, no driver-side graph object.  One PageRank iteration is
``ranks ⋈ out-degree → per-edge contribution → sum by dst`` — a join
keyed by src (co-partitioned with the out-degree frame, which reuses
the same shuffle) and one aggregation keyed by dst.  The rank frame
is ``localCheckpoint``-ed per iteration so lineage and plan-compile
cost stay flat across iterations (same discipline as
``dedup.connected_components``); edges are persisted once and reused
every round.  Dangling mass is redistributed uniformly (the standard
correction) so ranks stay a probability distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "degrees",
    "pagerank",
]


def degrees(edges: DataFrame, src_col: str = "src",
            dst_col: str = "dst") -> DataFrame:
    """(node, out_deg, in_deg) for every node in the edge list — two
    grouped counts stitched with a full outer join."""
    out_d = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    in_d = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select("node",
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
    )


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             checkpoint: bool = True,
             round_dp: int | None = None,
             dangling: bool = True) -> DataFrame:
    """PageRank by power iteration over an edge list; returns
    (node, rank) for every node appearing as src or dst.

    Fixed iteration count (not convergence-probed): rank queries want
    a deterministic plan, and in practice curation signals use a
    small fixed budget (3–10 rounds).  Each round:

        contrib(dst) = Σ_{src→dst} rank(src) / out_deg(src)
        rank'(v)     = (1-d)/N + d·(contrib(v) + dangling_mass/N)

    where dangling_mass is the rank parked on nodes with no out-edges
    — redistributed uniformly so Σrank stays 1 (an engine that drops
    it leaks rank mass every round and the ordering drifts).

    The per-round shuffles are: one join of ranks onto edges keyed by
    src, one sum keyed by dst — both linear in |E|.  ``checkpoint``
    truncates lineage per round (disable only for tiny fixed ``iters``
    where a single composed lazy plan is preferable, e.g. to keep the
    whole computation oracle-replayable as one expression tree).

    ``round_dp`` rounds each iteration's rank to that many decimals:
    the per-dst contribution SUM is accumulation-order-dependent in
    its last ulps, and without a per-round snap those ulps compound
    across iterations — with it, every engine (and every retry) feeds
    the next round bit-identical ranks, which is what puts an
    iterative float algorithm under a value-hash gate.

    ``dangling=False`` asserts the graph has NO dangling nodes (e.g.
    it was symmetrized) and skips the per-iteration dangling-mass
    aggregation + broadcast — 2 fewer jobs per round, numerically
    identical (the skipped term adds exactly 0.0).  Leave True unless
    the edge list provably gives every node an out-edge.
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    if checkpoint:
        # the (possibly expensive) distinct edge build feeds nodes,
        # degrees, AND the weighted edge list — cache it so each is
        # derived from ONE materialization, not three rebuilds
        e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("_deg"))
    # out-degree is ITERATION-INVARIANT: bake it onto the edge list
    # once, so each round is a single rank⋈edges join + dst-sum —
    # no per-round rank⋈degree join.  Likewise whether a node is
    # dangling is static: carried as a flag on the rank frame, so the
    # dangling mass is a plain filtered 1-row agg, no join.
    ew = e.join(out_deg, e.src == out_deg.node).select("src", "dst", "_deg")
    if checkpoint:
        ew = ew.persist()
        nodes = nodes.localCheckpoint()
    n = nodes.agg(F.count(F.lit(1)).alias("_n"))

    # rank frame carries N along (broadcast 1-row cross join) so every
    # arithmetic step is in-plan — nothing is collected to the driver
    ranks = (
        nodes.crossJoin(F.broadcast(n))
        .join(out_deg.select("node", F.lit(True).alias("_has_out")),
              "node", "left")
        .select("node", (F.lit(1.0) / F.col("_n")).alias("rank"), "_n",
                F.col("_has_out").isNull().alias("_dangling"))
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()

    for _ in range(iters):
        contrib = (
            ranks.join(ew, ranks.node == ew.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        next_ranks = (
            ranks.select("node", "_n", "_dangling")
            .join(contrib, "node", "left")
        )
        if dangling:
            # mass parked on dangling nodes (no out-edges) this round
            dm = ranks.where(F.col("_dangling")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            next_ranks = next_ranks.crossJoin(F.broadcast(dm))
            spread = F.col("_dm") / F.col("_n")
        else:
            spread = F.lit(0.0)
        new_rank = ((1.0 - damping) / F.col("_n")
                    + damping * (F.coalesce(F.col("_c"), F.lit(0.0))
                                 + spread))
        if round_dp is not None:
            new_rank = F.round(new_rank, round_dp)
        ranks = next_ranks.select("node", new_rank.alias("rank"), "_n",
                                  "_dangling")
        if checkpoint:
            ranks = ranks.localCheckpoint()
    if checkpoint:
        ew.unpersist()
        e.unpersist()
    return ranks.select("node", "rank")
