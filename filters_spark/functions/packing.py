"""Sequence packing: assigning documents to fixed-size context
windows for training-batch construction.

Two formulations, matching the repo's engine-pattern convention
(oracle-replayable default + scale/quality alternative):

* :func:`pack_streaming` — deterministic streaming fill: documents in
  a fixed order, running token total, bin = completed-budget count at
  the document's start.  Pure window arithmetic (one shuffle on the
  pack-group key), exactly replayable in ANSI SQL — the gated form.
  A document straddling a boundary stays in its start bin (the
  downstream writer truncates or wraps); bins can therefore overflow
  by at most one document's tail, never silently lose one.
* :func:`pack_greedy` — first-fit-decreasing inside each pack group
  via ``applyInPandas`` (Arrow-batched): tighter packing (classic FFD
  ≤ 11/9·OPT + 1) at the cost of a Python stage; use when bin waste
  matters more than pure-JVM throughput.

Scale note: packing needs an ORDER, and a global order is a
single-partition bottleneck — both functions take ``partition_cols``
(shard/date/source) so each group packs independently; at 100 TB the
groups are the natural write partitions and the window/apply runs
fully parallel.  Reference scope: pipeline-layer addition (SURVEY
§2.9); the reference library has no packing surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_streaming", "pack_greedy"]


def pack_streaming(df: DataFrame, order_col: str, len_col: str,
                   budget: int,
                   partition_cols: list[str] | None = None) -> DataFrame:
    """Input plus ``bin`` (0-based window index within the pack
    group) and ``bin_offset`` (token offset of this document's start
    inside its bin).  Deterministic for any fixed ``order_col``.

    NULL lengths fail LOUDLY inside the plan (a ``raise_error`` arm —
    no eager job): a NULL would otherwise propagate through the
    running sum, silently yielding NULL bins that drop out of batch
    accounting; :func:`pack_greedy` raises for the same input, and
    the two packers must share a contract."""
    parts = partition_cols or []
    checked = F.when(F.col(len_col).isNotNull(), F.col(len_col)).otherwise(
        F.raise_error(F.lit(
            f"pack_streaming: NULL {len_col} values — filter or impute "
            "lengths before packing")))
    w = (Window.partitionBy(*parts).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(checked).over(w)
    start = cum - checked
    return df.withColumn("bin", F.floor(start / budget)).withColumn(
        "bin_offset", start - F.col("bin") * budget)


def pack_greedy(df: DataFrame, id_col: str, len_col: str, budget: int,
                partition_cols: list[str] | None = None) -> DataFrame:
    """First-fit-decreasing packing per group.  Documents longer than
    the budget get a singleton bin (flagged via ``oversize``).
    Returns (partition_cols..., id_col, len_col, bin, oversize).
    """
    import pandas as pd

    parts = partition_cols or []
    id_name, len_name = id_col, len_col

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[len_name].isna().any():
            raise ValueError(
                f"pack_greedy: NULL {len_name} values — filter or "
                "impute lengths before packing")
        pdf = pdf.sort_values([len_name, id_name],
                              ascending=[False, True]).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assign = []
        oversize = []
        for ln in pdf[len_name]:
            ln = int(ln)
            if ln > budget:
                # capacity -1, not 0: an oversize bin is a SINGLETON —
                # a later zero-length doc must not first-fit into it
                bins.append(-1)
                assign.append(len(bins) - 1)
                oversize.append(True)
                continue
            for i, cap in enumerate(bins):
                if cap >= ln:
                    bins[i] = cap - ln
                    assign.append(i)
                    break
            else:
                bins.append(budget - ln)
                assign.append(len(bins) - 1)
            oversize.append(False)
        pdf["bin"] = pd.Series(assign, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*parts, id_col, len_col).schema.fields
    )
    schema = f"{fields}, bin bigint, oversize boolean"
    grouped = df.select(*parts, id_col, len_col)
    if parts:
        return grouped.groupBy(*parts).applyInPandas(ffd, schema)
    # no pack groups: one global group (single task by construction —
    # callers at scale pass partition_cols; this leg is for small jobs)
    return (grouped.withColumn("_g", F.lit(1)).groupBy("_g")
            .applyInPandas(ffd, f"_g int, {schema}").drop("_g"))
