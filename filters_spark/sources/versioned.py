"""Snapshot-versioned parquet tables: atomic pointer-flip commits,
time-travel reads, MERGE-as-new-snapshot, retention GC.

The missing piece between plain-parquet pipelines and a transactional
table format (Delta/Iceberg's job — r5 VERDICT missing #3): a real
100 TB pipeline hits "safe concurrent upsert + readable history"
immediately, and :func:`plans.joins.upsert`'s wholesale rewrite gives
neither isolation nor history.  This module graduates the
staged-swap discipline of ``retrieval.compact_postings`` /
``similarity.compact_ivf`` into a small manifest-based format:

```
path/
  snap/v=N/                immutable parquet data files for snapshot N
  changes/v=N/             optional stored change files for commit N
  _manifests/N.json        {version, parent, op, schema_json, n_files}
  _manifests/N.stats.json  per-file min/max sidecar (lazy; O(files))
  _latest                  text pointer to the current version (atomic)
```

Commit protocol (single pointer flip — the only mutation readers can
observe):

1. CLAIM the next version number by exclusively creating its
   manifest-claim file (``O_CREAT|O_EXCL`` — two racing writers
   cannot both win; the loser gets :class:`ConcurrentWriteError`).
2. Write the snapshot's data files under ``snap/v=N/`` (invisible to
   readers — nothing points there yet).
3. Write the manifest JSON (schema + lineage).
4. Atomically flip ``_latest`` via ``os.replace`` (POSIX rename is
   atomic within a filesystem).  A reader resolving "latest" either
   sees the old pointer or the new one — NEVER a half-written
   snapshot, because data and manifest are complete before the flip.

A crashed writer leaves an orphan claim/dir that no pointer
references; readers are unaffected and :func:`vacuum_versioned`
cleans it.  Old snapshots stay readable (time travel) until
retention removes them.

Scale notes: the manifest layer is O(1) metadata per commit — data
files are written once and never rewritten by later snapshots of
OTHER versions; :func:`merge_versioned` materializes the merged
table as the next snapshot (one keyed full-outer shuffle, the same
cost as any CDC merge over plain parquet — a format with file-level
pruning would rewrite only touched files, which is exactly the
upgrade path this API isolates callers from).  On a shared
filesystem (HDFS/objectstore via a rename-atomic committer) the same
protocol holds; S3-style stores need a pointer service instead of
rename — the single-pointer design makes that swap local to
``_flip_latest``.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T

__all__ = [
    "ConcurrentWriteError",
    "ContractViolation",
    "write_validated",
    "write_versioned",
    "optimize_versioned",
    "read_version",
    "merge_versioned",
    "delete_where",
    "update_where",
    "restore_version",
    "clone_versioned",
    "table_history",
    "read_changes",
    "consume_changes",
    "read_cursor",
    "advance_cursor",
    "latest_version",
    "versions",
    "version_as_of",
    "vacuum_versioned",
    "prune_files",
    "load_file_stats",
    "load_file_blooms",
    "bloom_prune_files",
    "apply_delete_vectors",
    "stats_aggregate",
    "StatsInsufficient",
    "verify_versioned",
]


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed the version this commit targeted."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _snap_dir(path: str, version: int) -> str:
    return os.path.join(path, "snap", f"v={version}")


def _latest_file(path: str) -> str:
    return os.path.join(path, "_latest")


def _changes_dir(path: str, version: int) -> str:
    return os.path.join(path, "changes", f"v={version}")


def latest_version(path: str) -> int | None:
    """Current committed version, or None for an empty/absent table."""
    try:
        with open(_latest_file(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def versions(path: str) -> list[int]:
    """All COMMITTED versions, ascending (claims without a manifest —
    crashed writers — are excluded)."""
    try:
        names = os.listdir(_manifest_dir(path))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.endswith(".json"):
            try:
                out.append(int(n[:-5]))
            except ValueError:
                pass
    return sorted(out)


def version_as_of(path: str, ts: float) -> int:
    """TIMESTAMP AS OF resolution (Delta's time-travel-by-timestamp
    contract): the LATEST committed version whose ``committed_at`` is
    ≤ ``ts`` (epoch seconds).  Versions predating the stamp (pre-r9
    manifests) sort as timestamp 0 — always eligible.  Raises when
    the table has no version that old."""
    best = None
    for v in versions(path):
        m = _read_manifest(path, v)
        at = m.get("committed_at", 0.0)
        if at <= ts and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(
            f"versioned table {path!r} has no version committed at or "
            f"before {ts}")
    return best


def _read_manifest(path: str, version: int) -> dict:
    mf = os.path.join(_manifest_dir(path), f"{version}.json")
    try:
        with open(mf) as fh:
            manifest = json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"versioned table {path!r} has no snapshot {version} "
            f"(committed versions: {versions(path)})")
    # private back-pointer so prune_files can resolve the stats
    # sidecar lazily from a bare manifest dict (never serialized)
    manifest["_manifest_dir"] = _manifest_dir(path)
    return manifest


def _claim(path: str, version: int) -> str:
    os.makedirs(_manifest_dir(path), exist_ok=True)
    claim = os.path.join(_manifest_dir(path), f"{version}.claim")
    try:
        fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"snapshot {version} of {path!r} is already claimed by "
            "another writer — re-read latest and retry")
    return claim


def _flip_latest(path: str, version: int) -> None:
    tmp = _latest_file(path) + f".tmp.{version}"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _latest_file(path))   # atomic POSIX rename


def _data_files(snap: str) -> list[str]:
    """Relative paths (posix separators) of every parquet data file
    under the snapshot — flat snapshots yield bare names, partitioned
    snapshots ``col=value/.../part-*.parquet`` paths."""
    out = []
    for root, _dirs, files in os.walk(snap):
        for name in files:
            if name.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, name), snap)
                out.append(rel.replace(os.sep, "/"))
    return sorted(out)


#: Hive's directory name for a null partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_INT_TYPES = frozenset(["byte", "short", "integer", "long"])
_FLOAT_TYPES = frozenset(["float", "double"])


def _partition_value(relpath: str, col: str, dtype: str | None = None):
    """Hive-partition value for ``col`` parsed from a data-file
    relpath (``col=value`` segment), typed from the SNAPSHOT SCHEMA
    (``dtype`` = Spark simple type name): numeric cast only when the
    column really is numeric, so a STRING column with numeric-LOOKING
    values ('007', '1e3') keeps its string stats and range pruning
    compares like with like instead of raising TypeError (ADVICE r8).
    Hive's null-partition sentinel maps to None (unknown — never
    pruned on).  None when the segment is absent."""
    from urllib.parse import unquote

    for seg in relpath.split("/")[:-1]:
        if seg.startswith(f"{col}="):
            raw = unquote(seg[len(col) + 1:])
            if raw == _HIVE_NULL:
                return None
            try:
                if dtype in _INT_TYPES:
                    return int(raw)
                if dtype in _FLOAT_TYPES:
                    return float(raw)
            except ValueError:
                return None         # unparseable: unknown, never prune
            return raw              # string/date/ts: lexicographic
    return None


#: Up to this many data files the commit reads footers in a driver
#: loop (cheaper than a Spark job at small counts); beyond it the
#: footer reads fan out executor-side so commit latency stays flat in
#: file count (VERDICT r8 next #2 — the 100k-file commit path).
_STATS_DRIVER_MAX = 64


def _footer_stats(abs_path: str, cols: list[str]) -> dict:
    """min/max per column from ONE parquet file's footer (pyarrow
    metadata only — no data pages).  Columns without usable
    statistics (absent, or binary min/max) record null and are never
    pruned on.  Runs on the driver for small snapshots and inside the
    executor-side stats job for large ones — keep it dependency-free
    beyond pyarrow."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}

    def norm(v):
        # JSON-safe ONCE, here — the driver loop and the executor-side
        # stats job must produce IDENTICAL sidecar types regardless of
        # file count (ADVICE r9: the old executor path stringified via
        # json default=str while the driver path kept native
        # date/Decimal objects, crashing the sidecar dump at <=64
        # files and string-typing it above).  bytes min/max are
        # unusable (truncated statistics); date/Decimal/datetime
        # become their str() form — ISO strings order like their
        # values, and a typed predicate bound hits prune_files'
        # conservative TypeError keep.
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, bytes):
            return None
        return str(v)

    stats: dict = {}
    for col in cols:
        lo = hi = None
        j = idx.get(col)
        if j is not None:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(j).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                mn, mx = st.min, st.max
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
        lo, hi = norm(lo), norm(hi)
        stats[col] = None if lo is None or hi is None else [lo, hi]
    # per-file row count and per-column null counts (footer facts,
    # free here) — what lets stats_aggregate answer COUNT(*) with
    # zero data tasks.  Reserved keys can never collide with a
    # column lookup (prune_files probes real column names only).
    stats["__n_rows"] = md.num_rows
    nulls: dict = {}
    for col in cols:
        j = idx.get(col)
        n = None
        if j is not None:
            n = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(j).statistics
                if st is None or st.null_count is None:
                    n = None
                    break
                n += st.null_count
        if n is not None:
            nulls[col] = n
    stats["__nulls"] = nulls
    return stats


def _file_stats(snap: str, stats_cols: list[str],
                partition_by: tuple[str, ...] = (),
                schema: T.StructType | None = None,
                spark: SparkSession | None = None) -> dict:
    """Per-data-file min/max for ``stats_cols`` — the manifest-level
    half of Delta-style data skipping.  PARTITION columns are not in
    the data files: their [v, v] range comes from the Hive
    ``col=value`` path segment (typed from the snapshot SCHEMA — a
    string column with numeric-looking values stays string, and the
    Hive null sentinel records null), so ``where=`` pruning works on
    the partition axis with zero footer reads.

    Footer-read placement: ≤ :data:`_STATS_DRIVER_MAX` files is a
    driver loop (O(files) metadata reads, no job); above that the
    reads run EXECUTOR-side as one Arrow-batched job over the file
    list — per-file work is a footer read, the collect is one tiny
    (file, json) row per file, so a 100k-file commit costs one short
    parallel job instead of a 100k-iteration driver loop."""
    dtypes = ({f.name: f.dataType.typeName() for f in schema.fields}
              if schema is not None else {})
    files = _data_files(snap)
    data_cols = [c for c in stats_cols if c not in partition_by]
    if not data_cols:
        footer = {name: {} for name in files}
    elif len(files) <= _STATS_DRIVER_MAX or spark is None:
        footer = {name: _footer_stats(os.path.join(snap, name), data_cols)
                  for name in files}
    else:
        import pandas as pd

        def _read(batches):
            for pdf in batches:
                out = []
                for name in pdf["file"]:
                    st = _footer_stats(os.path.join(snap, name), data_cols)
                    out.append((name, json.dumps(st, default=str)))
                yield pd.DataFrame(out, columns=["file", "stats"])

        n = min(len(files), spark.sparkContext.defaultParallelism)
        rows = (spark.createDataFrame([(f,) for f in files], "file string")
                .repartition(n, "file")
                .mapInPandas(_read, "file string, stats string")
                .collect())               # bounded: one small row/file
        footer = {r["file"]: json.loads(r["stats"]) for r in rows}
    out = {}
    for name in files:
        stats = dict(footer.get(name) or {})
        for col in stats_cols:
            if col in partition_by:
                v = _partition_value(name, col, dtypes.get(col))
                stats[col] = None if v is None else [v, v]
        out[name] = {c: stats.get(c) for c in stats_cols}
        for rk in ("__n_rows", "__nulls"):
            if rk in stats:
                out[name][rk] = stats[rk]
    return out


# --- Bloom file-skipping (point lookups) -----------------------------------
#
# min/max stats prune RANGE predicates; a point lookup on a
# high-cardinality key that the layout is NOT clustered on reads every
# file (each spans the full key range).  The standard answer (Delta
# bloom filter indexes) is a per-file Bloom filter: `where=(col, v, v)`
# probes each file's bitmap and skips files that provably lack v.
# Positions use the md5-bucket convention (seed '|' value, first 8 hex
# digits, mod bits) so membership is replayable in ANSI SQL, in Spark
# expressions, and in pure Python (the planning-time probe needs no
# Spark job).  Values hash as their canonical STRING form (Spark
# string cast ↔ Python str — exact for integer and string keys, the
# point-lookup types).  NULLs are never added and never probed.

_BLOOM_DEFAULT_BITS = 65536
_BLOOM_DEFAULT_HASHES = 4


#: Column types whose Spark string cast provably equals the Python
#: canonical rendering _bloom_canon produces — the only types
#: write_versioned accepts as bloom_cols.  Doubles ('1e+20' vs
#: '1.0E20'), booleans ('True' vs 'true'), decimals and timestamps
#: all render differently between engines, so a probe would hash to
#: different positions than the bitmap and SILENTLY skip files that
#: contain the key (r10 ADVICE).
_BLOOM_TYPES = ("byte", "short", "integer", "long", "string", "date")


def _bloom_canon(value) -> str:
    """Canonical string form of a probe value — must equal Spark's
    ``cast(col as string)`` for every type _BLOOM_TYPES allows:
    integers and strings are str(), dates are ISO (what str() gives a
    datetime.date).  Python bools are ints whose str() ('True') never
    matches a stored rendering — canonicalize through int so probing
    an integer column with True/False works."""
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def _bloom_positions_py(value, bits: int, hashes: int) -> list[int]:
    import hashlib

    v = _bloom_canon(value)
    return [int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:8], 16)
            % bits for i in range(hashes)]


def _bloom_member(hexmap: str, value, bits: int, hashes: int) -> bool:
    bm = int(hexmap, 16)
    return all((bm >> p) & 1 for p in
               _bloom_positions_py(value, bits, hashes))


def _file_blooms(path: str, files: list[str], cols: list[str],
                 bits: int, hashes: int, schema: T.StructType,
                 spark: SparkSession) -> dict:
    """Per-file Bloom bitmaps (hex) for ``cols`` over the given
    TABLE-ROOT-relative files: ONE job per column — distinct
    (file, position) pairs, shuffle bounded by files × bits, the
    collect bounded the same way (the stats-sidecar contract: driver
    state is metadata-sized, never data-sized)."""
    if not files:
        return {}
    out: dict = {f: {} for f in files}
    abs_paths = [os.path.join(path, f) for f in files]
    for col in cols:
        df = (spark.read.schema(schema).parquet(*abs_paths)
              .select(F.input_file_name().alias("_uri"),
                      F.col(col).cast("string").alias("_v"))
              .where(F.col("_v").isNotNull()))
        pos = [
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{i}|"), F.col("_v"))), 1, 8),
                16, 10).cast("bigint") % bits).cast("int")
            for i in range(hashes)]
        rows = (df.select("_uri", F.explode(F.array(*pos)).alias("_p"))
                .distinct()
                .groupBy("_uri").agg(F.collect_set("_p").alias("ps"))
                .collect())              # bounded: files × bits
        by_rel = {_rel_uri(path, r["_uri"]): r["ps"] for r in rows}
        for f in files:
            ps = by_rel.get(f)
            if ps is None:
                out[f][col] = "0"        # no non-null values: empty map
            else:
                bm = 0
                for p in ps:
                    bm |= 1 << p
                out[f][col] = f"{bm:x}"
    return out


def load_file_blooms(manifest: dict) -> dict | None:
    """Per-file Bloom bitmaps, resolving the lazy ``bloom_file``
    sidecar (mirrors :func:`load_file_stats`)."""
    blooms = manifest.get("file_blooms")
    if blooms is None and manifest.get("bloom_file") \
            and manifest.get("_manifest_dir"):
        try:
            with open(os.path.join(manifest["_manifest_dir"],
                                   manifest["bloom_file"])) as fh:
                blooms = json.load(fh)
        except FileNotFoundError:
            return None
        manifest["file_blooms"] = blooms
    return blooms


def bloom_prune_files(manifest: dict, where, files: list) -> list:
    """Intersect ``files`` with Bloom membership for every POINT
    predicate (``lo == hi``, non-null) in ``where`` whose column has
    bitmaps.  Files without a bitmap for the column are kept
    (conservative, like unknown min/max).  Pure driver arithmetic —
    no job, no Spark session."""
    blooms = load_file_blooms(manifest)
    if not blooms:
        return files
    cols = set(manifest.get("bloom_cols") or [])
    bits = manifest.get("bloom_bits") or _BLOOM_DEFAULT_BITS
    hashes = manifest.get("bloom_hashes") or _BLOOM_DEFAULT_HASHES
    points = [(c, lo) for (c, lo, hi) in
              (where if isinstance(where, list) else [where])
              if c in cols and lo is not None and lo == hi]
    if not points:
        return files
    kept = []
    for f in files:
        fb = blooms.get(f) or {}
        if all(fb.get(c) is None
               or _bloom_member(fb[c], v, bits, hashes)
               for c, v in points):
            kept.append(f)
    return kept


# --- NDV sketch sidecars (approximate distinct counts) ---------------------
#
# Iceberg's Puffin shape: per-file HyperLogLog registers recorded at
# commit time let stats_aggregate answer approx-NDV questions from
# metadata alone — register max-merge across files IS the whole-table
# sketch (max is associative), so the merged estimate equals what
# sketch.hll_table over the full scan would produce, replayable in
# SQL (the prof_hll_calibration machinery).

def _file_ndv(path: str, files: list[str], cols: list[str],
              schema: T.StructType, spark: SparkSession) -> dict:
    """Per-file HLL registers for ``cols`` over TABLE-ROOT-relative
    files: one job per column, collect bounded by files × 256
    buckets (the bloom-sidecar contract)."""
    from ..functions.sketch import _hll_parts

    if not files:
        return {}
    out: dict = {f: {} for f in files}
    abs_paths = [os.path.join(path, f) for f in files]
    for col in cols:
        bucket, rho = _hll_parts(F.col(col))
        rows = (spark.read.schema(schema).parquet(*abs_paths)
                .where(F.col(col).isNotNull())
                .select(F.input_file_name().alias("_uri"),
                        bucket.alias("b"), rho.alias("r"))
                .groupBy("_uri", "b").agg(F.max("r").alias("mr"))
                .collect())                 # bounded: files × 256
        regs: dict = {}
        for r in rows:
            regs.setdefault(_rel_uri(path, r["_uri"]), {})[
                str(int(r["b"]))] = int(r["mr"])
        for f in files:
            out[f][col] = regs.get(f, {})
    return out


def load_file_ndv(manifest: dict) -> dict | None:
    """Per-file NDV registers, resolving the lazy ``ndv_file``
    sidecar (mirrors :func:`load_file_blooms`)."""
    ndv = manifest.get("file_ndv")
    if ndv is None and manifest.get("ndv_file") \
            and manifest.get("_manifest_dir"):
        try:
            with open(os.path.join(manifest["_manifest_dir"],
                                   manifest["ndv_file"])) as fh:
                ndv = json.load(fh)
        except FileNotFoundError:
            return None
        manifest["file_ndv"] = ndv
    return ndv


def _root_ndv(path: str, manifest: dict) -> dict:
    ndv = load_file_ndv(manifest) or {}
    if manifest.get("data_files") is not None:
        return dict(ndv)
    v = manifest["version"]
    return {f"snap/v={v}/{k}": s for k, s in ndv.items()}


def _file_hdr(path: str, files: list[str], cols: list[str],
              schema: T.StructType, spark: SparkSession) -> dict:
    """Per-file HDR histogram buckets for POSITIVE-integer ``cols``
    (the engine's ``sketch.hdr_table`` convention, sub_bits=3): one
    job per column, collect bounded by files × 512 buckets.  A
    non-positive value fails the COMMIT loudly (the hdr_table
    raise_error contract — a silent drop would skew every rank
    served later)."""
    from ..functions.sketch import _bit_length

    if not files:
        return {}
    out: dict = {f: {} for f in files}
    abs_paths = [os.path.join(path, f) for f in files]
    for col in cols:
        v = F.when(F.col(col) > 0, F.col(col).cast("long")).otherwise(
            F.raise_error(F.lit(
                f"write_versioned(hdr_cols): non-positive {col} "
                "values — the log bucket needs v > 0")))
        shift = F.greatest(_bit_length(v) - F.lit(4), F.lit(0))
        rows = (spark.read.schema(schema).parquet(*abs_paths)
                .where(F.col(col).isNotNull())
                .select(F.input_file_name().alias("_uri"),
                        shift.cast("int").alias("_sh"), v.alias("_v"))
                .select("_uri", "_sh",
                        F.expr("shiftright(_v, _sh)").alias("_top"))
                .groupBy("_uri", "_sh", "_top")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .collect())                 # bounded: files × 512
        buckets: dict = {}
        for r in rows:
            buckets.setdefault(_rel_uri(path, r["_uri"]), {})[
                f"{int(r['_sh'])},{int(r['_top'])}"] = int(r["n"])
        for f in files:
            out[f][col] = buckets.get(f, {})
    return out


def load_file_hdr(manifest: dict) -> dict | None:
    hdr = manifest.get("file_hdr")
    if hdr is None and manifest.get("hdr_file") \
            and manifest.get("_manifest_dir"):
        try:
            with open(os.path.join(manifest["_manifest_dir"],
                                   manifest["hdr_file"])) as fh:
                hdr = json.load(fh)
        except FileNotFoundError:
            return None
        manifest["file_hdr"] = hdr
    return hdr


def _root_hdr(path: str, manifest: dict) -> dict:
    hdr = load_file_hdr(manifest) or {}
    if manifest.get("data_files") is not None:
        return dict(hdr)
    v = manifest["version"]
    return {f"snap/v={v}/{k}": s for k, s in hdr.items()}


def _hdr_quantile_py(buckets: dict, q_num: int, q_den: int) -> int | None:
    """EXACTLY sketch.hdr_quantiles' arithmetic in driver Python:
    lb-sorted cumulative counts, exact integer ceil-division rank —
    no float ever appears."""
    rows = []
    for key, n in buckets.items():
        sh, top = (int(x) for x in key.split(","))
        rows.append((top << sh, int(n)))
    if not rows:
        return None
    rows.sort()
    total = sum(n for _lb, n in rows)
    thresh = (q_num * total + q_den - 1) // q_den
    cum = 0
    for lb, n in rows:
        cum += n
        if cum >= thresh:
            return lb
    return rows[-1][0]


def _hll_estimate_py(regs: dict) -> float:
    """EXACTLY sketch.hll_estimate's arithmetic in driver Python:
    exact integer harmonic sum, one double division, linear counting
    under the small-range condition."""
    import math

    from ..functions.sketch import HLL_ALPHA_M2, HLL_M

    nz = len(regs)
    zeros = HLL_M - nz
    num = sum(1 << (61 - int(r)) for r in regs.values())
    d = zeros * (1 << 61) + num
    raw = (HLL_ALPHA_M2 * 2.0 ** 61) / float(d)
    if zeros > 0 and raw <= 2.5 * HLL_M:
        return float(HLL_M) * math.log(HLL_M / float(zeros))
    return raw


class StatsInsufficient(RuntimeError):
    """stats_aggregate cannot prove the answer from metadata alone
    (and was called strict)."""


#: Column type names whose parquet footer min/max are EXACT values —
#: the types stats_aggregate serves MIN/MAX for.  String/binary
#: statistics may be TRUNCATED for long values (a valid bound, not
#: the exact extreme), so they fall back.
_STATS_EXACT_TYPES = ("byte", "short", "integer", "long", "float",
                      "double", "date")


def stats_aggregate(spark: SparkSession, path: str,
                    aggs: list[tuple], version: int | None = None,
                    where: tuple | None = None,
                    strict: bool = True) -> DataFrame:
    """METADATA-ONLY aggregates over a versioned table (r10 VERDICT
    #5 — Delta answers ``SELECT COUNT(*)`` from its log): serve
    ``count``/``min``/``max`` from the manifest + stats sidecar with
    ZERO data-reading tasks — the returned frame is a driver-built
    one-row literal whose plan contains no file scan (the gate
    asserts it).

    ``aggs`` is ``[(fn, col, alias), ...]`` with fn ∈ {count, min,
    max} (``count`` takes col=None: COUNT(*)).  Facts used: per-file
    ``__n_rows`` / per-column null counts (recorded in the sidecar by
    every ``stats_cols`` write since r11; older sidecars fall back to
    one FOOTER-METADATA read per file — still no data pages) and the
    per-file min/max ranges.  MIN/MAX serve only columns in
    ``stats_cols`` with exact-statistics types
    (:data:`_STATS_EXACT_TYPES` — string footer stats may be
    truncated) where EVERY file has a known range or is provably
    all-NULL.

    ``where = (col, lo, hi)`` supports COUNT only: files prune via
    the sidecar, and the count is provable iff every surviving
    file's range lies FULLY inside [lo, hi] (each contributes
    ``n_rows − null_count``); a partially-overlapping file needs its
    rows read — fallback.

    FALLBACK is loud: tables with live delete vectors (a deleted row
    may be the extreme; counts need the vector set), missing stats,
    partial overlap, or unsupported types raise
    :class:`StatsInsufficient` under ``strict=True``; with
    ``strict=False`` the same call transparently computes through
    :func:`read_version` + a real aggregate (correct, scan-priced)."""
    def _fallback(msg: str) -> DataFrame:
        if strict:
            raise StatsInsufficient(
                f"stats_aggregate: {msg} — re-run with strict=False "
                "to compute through the scan path")
        df = read_version(spark, path, version, where=where)
        if where is not None:
            col, lo, hi = where
            c = F.col(col)
            if lo is not None:
                df = df.where(c >= F.lit(lo))
            if hi is not None:
                df = df.where(c <= F.lit(hi))
        exprs = []
        for fn, col, alias in aggs:
            if fn == "count":
                exprs.append(F.count(F.lit(1)).cast("long")
                             .alias(alias))
            elif fn == "approx_ndv":
                # the scan-path stand-in is EXACT distinct (a strict
                # superset answer; Spark's own HLL++ would estimate
                # with a different sketch than the sidecars)
                exprs.append(F.countDistinct(col).cast("double")
                             .alias(alias))
            elif fn == "approx_quantile":
                from ..functions.sketch import hdr_quantiles, hdr_table
                cname, qn, qd = col
                est = hdr_quantiles(
                    hdr_table(df, cname),
                    [(int(qn), int(qd))]).collect()
                exprs.append(
                    F.lit(int(est[0]["est"]) if est and
                          est[0]["est"] is not None else None)
                    .cast("long").alias(alias))
            else:
                exprs.append(getattr(F, fn)(col).alias(alias))
        return df.agg(*exprs)

    if version is None:
        version = latest_version(path)
        if version is None:
            raise ValueError(
                f"versioned table {path!r} has no snapshots")
    m = _read_manifest(path, version)
    for fn, col, _alias in aggs:
        if fn not in ("count", "min", "max", "approx_ndv",
                      "approx_quantile"):
            raise ValueError(
                f"stats_aggregate: fn must be count|min|max|"
                f"approx_ndv|approx_quantile, got {fn!r}")
        if fn == "approx_quantile" and not (
                isinstance(col, tuple) and len(col) == 3):
            raise ValueError(
                "stats_aggregate: approx_quantile takes col=(name, "
                "q_num, q_den), e.g. ('cents', 1, 2) for the median")
        if fn == "count" and col is not None:
            raise ValueError(
                "stats_aggregate: count is COUNT(*) — col must be "
                "None (count(col) needs per-column null semantics "
                "the scan path serves)")
        if fn == "approx_ndv" and col is None:
            raise ValueError("stats_aggregate: approx_ndv needs a "
                             "column")
    if m.get("dv_dirs"):
        return _fallback("table has live delete vectors (a deleted "
                         "row may be the extreme; counts need the "
                         "vector set)")
    if where is not None and any(fn != "count" for fn, _c, _a in aggs):
        return _fallback("min/max under a predicate needs row-level "
                         "evaluation")
    files = _root_files(path, m)
    stats = _root_stats(path, m)
    schema = T.StructType.fromJson(json.loads(m["schema_json"]))
    types = {f.name: f.dataType for f in schema.fields}

    meta_cols = sorted({c for _f, c, _a in aggs if c is not None}
                       | ({where[0]} if where is not None else set()))

    def file_meta(f: str) -> dict:
        st = stats.get(f)
        if st is not None and "__n_rows" in st:
            return st
        # pre-r11 sidecar (or no stats_cols): one footer-METADATA
        # read — no data pages, no Spark task
        fs = _footer_stats(os.path.join(path, f), meta_cols)
        return {**(st or {}), **fs}

    metas = {f: file_meta(f) for f in files}
    if where is not None:
        col, lo, hi = where
        count_files = []
        for f in files:
            st = metas[f]
            rng = st.get(col)
            nulls = (st.get("__nulls") or {}).get(col)
            if rng is None or nulls is None:
                return _fallback(
                    f"file {f!r} lacks a range/null-count for "
                    f"{col!r}")
            fmin, fmax = rng
            if (lo is not None and fmax < lo) or \
                    (hi is not None and fmin > hi):
                continue                     # provably disjoint
            if (lo is not None and fmin < lo) or \
                    (hi is not None and fmax > hi):
                return _fallback(
                    f"file {f!r} only partially overlaps the "
                    "predicate — its rows need reading")
            count_files.append(f)            # fully contained
    else:
        count_files = files
    ndv_regs = None
    hdr_buckets = None
    row: dict = {}
    out_fields: list[T.StructField] = []
    for fn, col, alias in aggs:
        if fn == "approx_quantile":
            cname, qn, qd = col
            if hdr_buckets is None:
                hdr_buckets = _root_hdr(path, m)
            merged_h: dict = {}
            for f in files:
                b = (hdr_buckets.get(f) or {}).get(cname)
                if b is None:
                    return _fallback(
                        f"file {f!r} has no HDR buckets for "
                        f"{cname!r} (commit with hdr_cols="
                        f"[{cname!r}])")
                for key, n in b.items():
                    merged_h[key] = merged_h.get(key, 0) + int(n)
            row[alias] = _hdr_quantile_py(merged_h, int(qn), int(qd))
            out_fields.append(T.StructField(alias, T.LongType()))
            continue
        if fn == "approx_ndv":
            if ndv_regs is None:
                ndv_regs = _root_ndv(path, m)
            merged: dict = {}
            for f in files:
                regs = (ndv_regs.get(f) or {}).get(col)
                if regs is None:
                    return _fallback(
                        f"file {f!r} has no NDV registers for "
                        f"{col!r} (commit with ndv_cols=[{col!r}])")
                for b, r in regs.items():
                    if merged.get(b, -1) < r:
                        merged[b] = r
            row[alias] = _hll_estimate_py(merged) if files else 0.0
            out_fields.append(T.StructField(alias, T.DoubleType()))
            continue
        if fn == "count":
            total = 0
            for f in count_files:
                st = metas[f]
                if st.get("__n_rows") is None:
                    return _fallback(f"file {f!r} has no row count")
                total += int(st["__n_rows"])
                if where is not None:
                    total -= int((st.get("__nulls") or {})[where[0]])
            row[alias] = total
            out_fields.append(T.StructField(alias, T.LongType()))
            continue
        if types.get(col) is None:
            raise ValueError(f"stats_aggregate: unknown column {col!r}")
        if types[col].typeName() not in _STATS_EXACT_TYPES:
            return _fallback(
                f"{col!r} has type {types[col].typeName()} — footer "
                "min/max may be truncated (strings) or unsupported")
        best = None
        for f in files:
            st = metas[f]
            rng = st.get(col)
            if rng is None:
                n_rows = st.get("__n_rows")
                nulls = (st.get("__nulls") or {}).get(col)
                if n_rows is not None and nulls == n_rows:
                    continue                  # provably all-NULL file
                return _fallback(
                    f"file {f!r} has no exact range for {col!r}")
            v = rng[0] if fn == "min" else rng[1]
            if types[col].typeName() == "date" and isinstance(v, str):
                import datetime as _dt

                v = _dt.date.fromisoformat(v)
            if best is None or (v < best if fn == "min" else v > best):
                best = v
        row[alias] = best
        out_fields.append(T.StructField(alias, types[col]))
    return spark.createDataFrame(
        [tuple(row[f.name] for f in out_fields)],
        T.StructType(out_fields))


def _root_blooms(path: str, manifest: dict) -> dict:
    """A snapshot's per-file blooms re-keyed TABLE-ROOT-relative
    (mirrors :func:`_root_stats`)."""
    blooms = load_file_blooms(manifest) or {}
    if manifest.get("data_files") is not None:
        return dict(blooms)
    v = manifest["version"]
    return {f"snap/v={v}/{k}": s for k, s in blooms.items()}


def _dv_dir(path: str, version: int) -> str:
    return os.path.join(path, "dv", f"v={version}")


#: Executor-side file identity for delete-vector binding: the
#: ``snap/v=N/<basename>`` TAIL of input_file_name() — unique per
#: physical file (version dirs never repeat), root-invariant (a clone
#: referencing ``../src/snap/v=3/x.parquet`` extracts the same tail),
#: and free of percent-encoding hazards (part filenames and ``v=N``
#: contain no URI-escaped characters).  Flat layouts only — a
#: partitioned snapshot's extra ``col=val`` level breaks the tail,
#: which is why MOR deletes require flat tables.
_DV_TAIL = r"(snap/v=\d+/[^/]+)$"


def _dv_file_expr() -> Column:
    return F.regexp_extract(F.input_file_name(), _DV_TAIL, 1)


def apply_delete_vectors(spark: SparkSession, path: str,
                         manifest: dict, df: DataFrame,
                         file_col: str | None = None) -> DataFrame:
    """MERGE-ON-READ: anti-join the manifest's live delete vectors
    into a frame read from this snapshot's physical files.  A DV
    entry is a ``(file tail, key)`` pair — binding to the FILE means
    a key deleted at v5 and re-inserted at v7 (a new file) is not
    re-deleted, the classic MOR correctness trap.  DV frames are
    delete-sized; the join broadcasts under AQE when small.  No-op
    for snapshots without delete vectors.

    ``file_col`` names an ALREADY-MATERIALIZED ``input_file_name()``
    column to derive file identity from instead — callers that need
    per-row file identity downstream (touched-file detection) must
    materialize it BEFORE this call: ``input_file_name()`` refuses
    plans with more than one source, and the anti-join adds one."""
    dv_dirs = manifest.get("dv_dirs")
    if not dv_dirs:
        return df
    key = manifest["dv_key"]
    dv = spark.read.parquet(*[_dv_dir(path, v) for v in dv_dirs])
    src = F.col(file_col) if file_col else F.input_file_name()
    return (df.withColumn("_dv_file",
                          F.regexp_extract(src, _DV_TAIL, 1))
            .join(dv.withColumnRenamed("_file", "_dv_file"),
                  ["_dv_file", key], "left_anti")
            .drop("_dv_file"))


def _detect_frame(spark: SparkSession, path: str,
                  manifest: dict) -> DataFrame:
    """The LIVE rows of a flat snapshot carrying ``_f`` =
    input_file_name() — the touched-file detection input every
    copy-on-write op uses.  ``_f`` materializes before the DV
    anti-join (see :func:`apply_delete_vectors`)."""
    schema = T.StructType.fromJson(json.loads(manifest["schema_json"]))
    files = _root_files(path, manifest)
    if not files:
        return spark.createDataFrame([], schema) \
            .withColumn("_f", F.lit(""))
    raw = (spark.read.schema(schema).parquet(
        *[os.path.join(path, f) for f in files])
        .withColumn("_f", F.input_file_name()))
    return apply_delete_vectors(spark, path, manifest, raw,
                                file_col="_f")


def write_versioned(df: DataFrame, path: str,
                    expected_parent: int | None = None,
                    _op: str = "write",
                    extra_meta: dict | None = None,
                    stats_cols: list[str] | None = None,
                    partition_by: list[str] | None = None,
                    changes_df: DataFrame | None = None,
                    reuse_files: list[str] | None = None,
                    reuse_stats: dict | None = None,
                    bloom_cols: list[str] | None = None,
                    bloom_bits: int | None = None,
                    bloom_hashes: int | None = None,
                    reuse_blooms: dict | None = None,
                    dv_df: DataFrame | None = None,
                    dv_key: str | None = None,
                    dv_dirs: list[int] | None = None,
                    ndv_cols: list[str] | None = None,
                    reuse_ndv: dict | None = None,
                    hdr_cols: list[str] | None = None,
                    reuse_hdr: dict | None = None,
                    _no_data: bool = False) -> int:
    """Commit ``df`` as the next snapshot; returns the new version.

    ``expected_parent`` is optimistic concurrency control: pass the
    version you READ when deriving ``df`` and the commit fails with
    :class:`ConcurrentWriteError` if someone committed in between
    (compare-and-set on the table head — the Delta/Iceberg commit
    contract).  ``None`` skips the check (blind append of a whole
    snapshot).

    ``stats_cols`` records per-FILE min/max for those columns in the
    manifest (read from parquet footers — zero extra jobs), enabling
    :func:`read_version`'s ``where=`` file skipping.  Cluster the
    data on the column first (``repartitionByRange(col)`` or a
    Z-order sort) or every file spans the full range and nothing
    prunes.

    ``partition_by`` writes the snapshot Hive-partitioned (the
    date/tenant layout a 100 TB table wants): readers restore the
    directory columns, and a partition column named in ``stats_cols``
    prunes by its ``col=value`` path segment — directory-level
    skipping with no footer reads.  Partitioning is per-SNAPSHOT
    (recorded in the manifest); later commits choose their own
    layout.

    ``changes_df`` is the writer's own change feed for THIS commit
    (``_change_type`` + row payload, :func:`read_changes` schema) —
    a writer that knows its delta at commit time (a keyed merge)
    persists it under ``changes/v=N/`` so :func:`read_changes` can
    serve the span O(changes) instead of diffing two whole snapshots
    (VERDICT r8 next #3).  The caller is responsible for its
    CORRECTNESS: it must be exactly the diff of this snapshot against
    its parent (``merge_versioned(store_changes=True)`` guarantees
    that by construction).  Change files commit with the snapshot
    (written before the manifest, invisible until the head flip).

    ``reuse_files`` makes this a FILE-REUSE (copy-on-write) commit:
    ``df`` holds only the REPLACEMENT rows (written as new files
    under ``snap/v=N/``), and the listed TABLE-ROOT-relative parquet
    paths from ancestor snapshots are carried by REFERENCE — the
    manifest records the full explicit ``data_files`` list and
    readers resolve it instead of listing the snapshot directory.
    This is how :func:`delete_where` / ``merge_versioned(
    file_reuse=True)`` touch a 0.1% slice of a 100 TB table without
    rewriting the other 99.9%.  Only FLAT layouts (no
    ``partition_by``) can reuse; :func:`vacuum_versioned` reference-
    counts files across retained versions.  ``reuse_stats`` carries
    the reused files' min/max entries forward (same keys) so
    ``stats_cols`` skipping stays armed without re-reading their
    footers.

    ``bloom_cols`` arms POINT-LOOKUP file skipping (Delta bloom
    filter indexes): per-file Bloom bitmaps (``bloom_bits`` bits,
    ``bloom_hashes`` md5-convention hashes) land in a lazy sidecar,
    and ``read_version(where=(col, v, v))`` probes them at planning
    time — a key lookup on a column the layout is NOT clustered on
    skips files min/max can't.  Costs one bounded job per column over
    the NEW files.  Bloom config is a TABLE PROPERTY: later commits
    INHERIT it from the parent manifest automatically (pass
    ``bloom_cols=[]`` to disarm), file-reuse commits carry the
    parent's bitmaps for carried files (``reuse_blooms`` overrides —
    the restore/clone path), and partition columns are rejected
    (their ``col=value`` path prunes via ``stats_cols`` for free).
    Size ``bloom_bits`` ≈ 10× the rows per file for ~1% false
    positives at 4 hashes; false positives only cost a read, never
    correctness.

    ``ndv_cols`` records per-file HyperLogLog REGISTERS (256-bucket
    md5 sketch, the engine's ``sketch.hll_table`` convention) in a
    lazy sidecar — Iceberg Puffin's shape: register max-merge across
    files IS the whole-table sketch, so
    ``stats_aggregate(('approx_ndv', col, ...))`` answers
    distinct-count questions from metadata alone.  Config is a table
    property like blooms (inherits from the parent;
    ``ndv_cols=[]`` disarms); file-reuse commits carry register
    entries for carried files (``reuse_ndv`` overrides); costs one
    bounded job per column over the NEW files.

    DELETE VECTORS (merge-on-read): ``dv_df`` — a ``(_file string,
    <dv_key>)`` frame of per-file deleted keys — is written as this
    commit's DV parquet dir (``dv/v=N/``, executor-side like
    ``changes_df``, committed with the snapshot) and appended to the
    manifest's live ``dv_dirs`` list; readers anti-join them in
    (:func:`apply_delete_vectors`).  ``dv_dirs`` overrides the live
    list explicitly (``[]`` resets — the restore path); when omitted,
    FILE-REUSE commits INHERIT the parent's (carried files still
    contain the deleted rows — dropping the vectors would resurrect
    them) while full rewrites reset (``df`` comes from a DV-applied
    read, so the new files hold only live rows)."""
    if reuse_files and partition_by:
        raise ValueError(
            "write_versioned: file-reuse commits require a flat "
            "layout (partition directory columns do not resolve "
            "across snapshot directories)")
    parent = latest_version(path)
    if expected_parent is not None and parent != expected_parent:
        raise ConcurrentWriteError(
            f"table {path!r} moved: expected parent {expected_parent}, "
            f"found {parent} — re-read and retry")
    # next version clears BOTH the head and any manifested-but-never-
    # flipped snapshot (a writer that crashed between manifest and
    # pointer flip must not block its number forever)
    version = max(versions(path) + [parent or 0]) + 1
    claim = _claim(path, version)
    _pool: ThreadPoolExecutor | None = None
    try:
        snap = _snap_dir(path, version)
        # The commit's SIDE WRITES (stored change feed, delete-vector
        # sidecar) are independent of the main snapshot write — kick
        # them off on driver threads so their jobs overlap the main
        # write's tail instead of serializing after it (guide §2.6:
        # actions are only sequential because the driver calls them
        # sequentially).  Each write is its own output directory; the
        # manifest (the atomic commit point) is written only after
        # every future joins, so crash semantics are unchanged —
        # nothing is visible until the head flip.
        _cfut = _dfut = None
        if dv_df is not None:
            # validate BEFORE the async write starts (fail-fast
            # semantics unchanged)
            if partition_by:
                raise ValueError(
                    "write_versioned: delete vectors require a flat "
                    "layout (the file-tail binding breaks across "
                    "partition directories)")
            if dv_key is None:
                raise ValueError(
                    "write_versioned: dv_df requires dv_key")
        if changes_df is not None or dv_df is not None:
            _pool = ThreadPoolExecutor(max_workers=2)
            if changes_df is not None:
                _cfut = _pool.submit(
                    lambda: changes_df.write.mode("overwrite").parquet(
                        _changes_dir(path, version)))
            if dv_df is not None:
                _dfut = _pool.submit(
                    lambda: dv_df.write.mode("overwrite").parquet(
                        _dv_dir(path, version)))
        if _no_data:
            # The caller declares ``df`` statically EMPTY (a MOR
            # delete / no-change update whose rewrite set has no
            # rows; df supplies only the schema).  Skip the parquet
            # write job — and, more importantly, the junk empty part
            # file it would leave in the snapshot: that file joins
            # ``data_files`` and every later read of the table opens
            # it forever (one extra scan split per MOR commit at
            # 100 TB).  Readers handle zero-file snapshots: explicit
            # manifest schema, n_files == 0 matches the empty dir.
            os.makedirs(snap, exist_ok=True)
            new_files: list[str] = []
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(snap)
            new_files = _data_files(snap)
        if reuse_files is not None:
            data_files = sorted(
                [f"snap/v={version}/{f}" for f in new_files]
                + list(reuse_files))
            n_files = len(data_files)
        else:
            data_files = None
            n_files = len(new_files)
        import time as _time

        manifest = {
            "version": version,
            "parent": parent,
            "op": _op,
            "schema_json": df.schema.json(),
            "n_files": n_files,
            # wall-clock commit stamp (manifest-write time — the flip
            # follows within the same commit call): arms timestamp
            # time travel (version_as_of / read_version(as_of=)).
            # Never part of any gated/hashed output.
            "committed_at": _time.time(),
            **({"data_files": data_files} if data_files is not None
               else {}),
            **({"partition_by": list(partition_by)} if partition_by
               else {}),
            **(extra_meta or {}),
        }
        if changes_df is not None:
            _cfut.result()               # join the overlapped write
            manifest["changes"] = True
            manifest["changes_schema_json"] = changes_df.schema.json()
        if stats_cols:
            # Stats live in a SIDECAR referenced by the manifest, not
            # inlined: the manifest stays O(1) no matter the file
            # count, and readers that never pass ``where=`` never pay
            # the O(files) parse (prune_files loads it lazily).
            stats = _file_stats(snap, stats_cols,
                                tuple(partition_by or ()),
                                schema=df.schema, spark=df.sparkSession)
            if reuse_files is not None:
                # file-reuse commits key stats TABLE-ROOT-relative so
                # one sidecar spans snapshot directories; carried
                # files keep their parent entries (no footer re-read),
                # unknown when absent (kept, never pruned)
                stats = {f"snap/v={version}/{k}": v
                         for k, v in stats.items()}
                for f in reuse_files:
                    stats[f] = (reuse_stats or {}).get(
                        f, {c: None for c in stats_cols})
            sidecar = f"{version}.stats.json"
            stmp = os.path.join(_manifest_dir(path), sidecar + ".tmp")
            with open(stmp, "w") as fh:
                json.dump(stats, fh)
            os.replace(stmp, os.path.join(_manifest_dir(path), sidecar))
            manifest["stats_file"] = sidecar
            manifest["stats_cols"] = list(stats_cols)
        # Bloom config inherits from the parent manifest (a table
        # property, like Delta's index config) unless the caller sets
        # it — bloom_cols=[] explicitly disarms.
        if bloom_cols is None and parent is not None:
            try:
                pm = _read_manifest(path, parent)
            except ValueError:
                pm = {}
            bloom_cols = pm.get("bloom_cols")
            bloom_bits = bloom_bits or pm.get("bloom_bits")
            bloom_hashes = bloom_hashes or pm.get("bloom_hashes")
            if reuse_files is not None and reuse_blooms is None \
                    and bloom_cols:
                reuse_blooms = _root_blooms(path, pm)
        if bloom_cols:
            bad = [c for c in bloom_cols if c in (partition_by or ())]
            if bad:
                raise ValueError(
                    f"write_versioned: bloom_cols {bad} are partition "
                    "columns — their col=value path already prunes "
                    "via stats_cols")
            types = {f.name: f.dataType.typeName() for f in df.schema}
            badtype = [(c, types.get(c)) for c in bloom_cols
                       if types.get(c) not in _BLOOM_TYPES]
            if badtype:
                raise ValueError(
                    f"write_versioned: bloom_cols {badtype} have types "
                    "whose Spark string cast differs from the Python "
                    "probe rendering (double '1e+20' vs '1.0E20', "
                    "boolean 'True' vs 'true', ...) — membership would "
                    "silently miss and point reads would DROP matching "
                    f"files.  Supported types: {_BLOOM_TYPES}")
            bloom_bits = bloom_bits or _BLOOM_DEFAULT_BITS
            bloom_hashes = bloom_hashes or _BLOOM_DEFAULT_HASHES
            if reuse_files is not None:
                new_keys = [f"snap/v={version}/{f}" for f in new_files]
                blooms = _file_blooms(path, new_keys, list(bloom_cols),
                                      bloom_bits, bloom_hashes,
                                      df.schema, df.sparkSession)
                for f in reuse_files:
                    blooms[f] = (reuse_blooms or {}).get(
                        f, {c: None for c in bloom_cols})
            else:
                blooms = _file_blooms(snap, new_files, list(bloom_cols),
                                      bloom_bits, bloom_hashes,
                                      df.schema, df.sparkSession)
            bsidecar = f"{version}.bloom.json"
            btmp = os.path.join(_manifest_dir(path), bsidecar + ".tmp")
            with open(btmp, "w") as fh:
                json.dump(blooms, fh)
            os.replace(btmp,
                       os.path.join(_manifest_dir(path), bsidecar))
            manifest["bloom_file"] = bsidecar
            manifest["bloom_cols"] = list(bloom_cols)
            manifest["bloom_bits"] = bloom_bits
            manifest["bloom_hashes"] = bloom_hashes
        # NDV config inherits from the parent manifest like blooms
        # (ndv_cols=[] explicitly disarms).
        if ndv_cols is None and parent is not None:
            try:
                pm_ndv = _read_manifest(path, parent)
            except ValueError:
                pm_ndv = {}
            ndv_cols = pm_ndv.get("ndv_cols")
            if reuse_files is not None and reuse_ndv is None \
                    and ndv_cols:
                reuse_ndv = _root_ndv(path, pm_ndv)
        if ndv_cols:
            if reuse_files is not None:
                new_keys = [f"snap/v={version}/{f}" for f in new_files]
                ndv = _file_ndv(path, new_keys, list(ndv_cols),
                                df.schema, df.sparkSession)
                for f in reuse_files:
                    ndv[f] = (reuse_ndv or {}).get(
                        f, {c: None for c in ndv_cols})
            else:
                nk = [f"snap/v={version}/{f}" for f in new_files]
                ndv = {k.split("/", 2)[-1]: v for k, v in _file_ndv(
                    path, nk, list(ndv_cols), df.schema,
                    df.sparkSession).items()}
            nsidecar = f"{version}.ndv.json"
            ntmp = os.path.join(_manifest_dir(path), nsidecar + ".tmp")
            with open(ntmp, "w") as fh:
                json.dump(ndv, fh)
            os.replace(ntmp,
                       os.path.join(_manifest_dir(path), nsidecar))
            manifest["ndv_file"] = nsidecar
            manifest["ndv_cols"] = list(ndv_cols)
        # HDR histogram sidecars (per-file quantile buckets) — the
        # third mergeable sketch beside stats ranges and NDV
        # registers; same inheritance/carry contract.
        if hdr_cols is None and parent is not None:
            try:
                pm_hdr = _read_manifest(path, parent)
            except ValueError:
                pm_hdr = {}
            hdr_cols = pm_hdr.get("hdr_cols")
            if reuse_files is not None and reuse_hdr is None \
                    and hdr_cols:
                reuse_hdr = _root_hdr(path, pm_hdr)
        if hdr_cols:
            if reuse_files is not None:
                new_keys = [f"snap/v={version}/{f}" for f in new_files]
                hdr = _file_hdr(path, new_keys, list(hdr_cols),
                                df.schema, df.sparkSession)
                for f in reuse_files:
                    hdr[f] = (reuse_hdr or {}).get(
                        f, {c: None for c in hdr_cols})
            else:
                nk = [f"snap/v={version}/{f}" for f in new_files]
                hdr = {k.split("/", 2)[-1]: v for k, v in _file_hdr(
                    path, nk, list(hdr_cols), df.schema,
                    df.sparkSession).items()}
            hsc = f"{version}.hdr.json"
            htmp = os.path.join(_manifest_dir(path), hsc + ".tmp")
            with open(htmp, "w") as fh:
                json.dump(hdr, fh)
            os.replace(htmp, os.path.join(_manifest_dir(path), hsc))
            manifest["hdr_file"] = hsc
            manifest["hdr_cols"] = list(hdr_cols)
        # --- delete vectors (merge-on-read) --------------------------
        if dv_dirs is None and reuse_files is not None \
                and parent is not None:
            try:
                pm_dv = _read_manifest(path, parent)
            except ValueError:
                pm_dv = {}
            dv_dirs = pm_dv.get("dv_dirs")
            if dv_dirs:
                if dv_key is None:
                    dv_key = pm_dv.get("dv_key")
                elif dv_key != pm_dv.get("dv_key"):
                    raise ValueError(
                        "write_versioned: dv_key "
                        f"{dv_key!r} differs from the table's live "
                        f"delete-vector key {pm_dv.get('dv_key')!r} — "
                        "one key per table (fold the existing vectors "
                        "with optimize_versioned first)")
        if dv_df is not None:
            _dfut.result()               # join the overlapped write
            dv_dirs = sorted(set(list(dv_dirs or []) + [version]))
        if dv_dirs:
            manifest["dv_dirs"] = sorted(set(int(v) for v in dv_dirs))
            manifest["dv_key"] = dv_key
        mf = os.path.join(_manifest_dir(path), f"{version}.json")
        tmp = mf + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mf)
        # The head TRANSITION is the atomic commit point, and it needs
        # its own mutual exclusion: the per-version claim above only
        # serializes writers that computed the SAME version number —
        # two racers can claim DIFFERENT numbers (one sees the other's
        # manifest and skips past it), and a bare re-check-then-flip
        # lets both pass the re-check before either flips (r8 race
        # test): both report success, one lineage silently shadowed.
        # O_EXCL on head.{parent}.claim makes exactly one writer per
        # parent state reach the flip; the loser's snapshot stays an
        # unreferenced orphan (vacuum_versioned reclaims it).
        hclaim = os.path.join(_manifest_dir(path),
                              f"head.{parent or 0}.claim")
        try:
            fd = os.open(hclaim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"table {path!r}: another writer is committing on top "
                f"of version {parent} — snapshot {version} written but "
                "not made latest; re-read and retry") from None
        try:
            # re-check the head UNDER the transition claim: a writer
            # that did NOT pass expected_parent could otherwise
            # clobber a concurrent commit's pointer with a stale
            # lineage (heads never move backwards, so a stale-parent
            # writer acquiring a released claim still fails here)
            head = latest_version(path)
            if head not in (parent, version):
                raise ConcurrentWriteError(
                    f"table {path!r} moved during commit (head {head}); "
                    f"snapshot {version} written but not made latest")
            _flip_latest(path, version)
        finally:
            try:
                os.remove(hclaim)
            except FileNotFoundError:
                pass
    finally:
        if _pool is not None:
            _pool.shutdown(wait=True)
        try:
            os.remove(claim)
        except FileNotFoundError:
            pass
    return version


def load_file_stats(manifest: dict) -> dict | None:
    """Per-file stats for a manifest, resolving the lazy SIDECAR
    (``stats_file``) written by :func:`write_versioned` — the
    manifest itself stays O(1) in file count; only ``where=`` readers
    pay the O(files) parse.  Inline ``file_stats`` (pre-sidecar
    manifests, hand-built dicts) still work.  None when the snapshot
    recorded no stats or the sidecar is gone."""
    stats = manifest.get("file_stats")
    if stats is None and manifest.get("stats_file") \
            and manifest.get("_manifest_dir"):
        try:
            with open(os.path.join(manifest["_manifest_dir"],
                                   manifest["stats_file"])) as fh:
                stats = json.load(fh)
        except FileNotFoundError:
            return None                     # sidecar gone: no pruning
        manifest["file_stats"] = stats      # cache for repeat calls
    return stats


def prune_files(manifest: dict, where) -> list | None:
    """Data-skipping file selection: ``where = (col, lo, hi)``
    (inclusive; ``None`` bound = open) against the manifest's
    per-file stats — or a LIST of such triples, pruned as a
    CONJUNCTION (a file survives only if every predicate's range
    intersects; one skippable axis is enough to prune even when
    another has no stats).  Returns the file names that MAY contain
    matching rows (a conservative superset — the caller still applies
    the real filter), or ``None`` when no predicate has stats (no
    pruning possible)."""
    if isinstance(where, list):
        kept: list | None = None
        for w in where:
            k = prune_files(manifest, w)
            if k is None:
                continue
            kept = k if kept is None else [f for f in kept
                                           if f in set(k)]
        return kept
    col, lo, hi = where
    stats = load_file_stats(manifest)
    if not stats:
        return None
    keep = []
    any_stats = False
    for name, cols in stats.items():
        rng = cols.get(col)
        if rng is None:
            keep.append(name)               # unknown range: must read
            continue
        any_stats = True
        fmin, fmax = rng
        try:
            if (lo is not None and fmax is not None and fmax < lo) or \
                    (hi is not None and fmin is not None and fmin > hi):
                continue
        except TypeError:
            # mixed-type comparison (stat type vs predicate bound type
            # drift): the range is UNKNOWABLE, not empty — keep the
            # file rather than crash or wrongly prune (ADVICE r8)
            pass
        keep.append(name)
    return keep if any_stats else None


def read_version(spark: SparkSession, path: str,
                 version: int | None = None,
                 where: tuple | None = None,
                 as_of: float | None = None) -> DataFrame:
    """Read a committed snapshot (``None`` = latest; ``as_of`` =
    epoch-seconds timestamp time travel via :func:`version_as_of` —
    mutually exclusive with ``version``).  The manifest's
    stored schema is applied explicitly, so empty snapshots (zero
    data files) read back with their true schema instead of failing
    inference — and readers are immune to parquet footer drift.

    ``where = (col, lo, hi)`` — or a list of such triples, applied as
    a conjunction — enables FILE SKIPPING against the manifest's
    :func:`write_versioned` ``stats_cols`` ranges: only
    files whose [min, max] intersects [lo, hi] are read (explicit
    paths — at 100 TB this is planning-time pruning, before any task
    launches).  The result is a conservative SUPERSET of matching
    rows; apply the actual filter on top.  Tables written without
    stats read fully (correct, unpruned)."""
    if as_of is not None:
        if version is not None:
            raise ValueError(
                "read_version: pass version OR as_of, not both")
        version = version_as_of(path, as_of)
    if version is None:
        version = latest_version(path)
        if version is None:
            raise ValueError(f"versioned table {path!r} has no snapshots")
    manifest = _read_manifest(path, version)
    schema = T.StructType.fromJson(json.loads(manifest["schema_json"]))
    snap = _snap_dir(path, version)
    data_files = manifest.get("data_files")
    if data_files is not None:
        # file-reuse commit: the manifest's explicit TABLE-ROOT-
        # relative list IS the snapshot (files may live in ancestor
        # snapshot dirs).  No basePath: these are flat layouts, and a
        # basePath above snap/ would misread v=N as a partition col.
        missing = sum(1 for f in data_files
                      if not os.path.exists(os.path.join(path, f)))
        if missing:
            raise ValueError(
                f"snapshot {version} of {path!r} was vacuumed "
                f"({missing} of {len(data_files)} referenced files "
                "gone)")
        files = data_files
        if where is not None:
            kept = prune_files(manifest, where)
            if kept is not None:
                files = kept
            files = bloom_prune_files(manifest, where, files)
        if not files:
            return spark.createDataFrame([], schema)
        return apply_delete_vectors(
            spark, path, manifest,
            spark.read.schema(schema).parquet(
                *[os.path.join(path, f) for f in files]))
    if not os.path.isdir(snap):
        raise ValueError(
            f"snapshot {version} of {path!r} was vacuumed — "
            f"retained versions: "
            f"{[v for v in versions(path) if os.path.isdir(_snap_dir(path, v))]}")
    if len(_data_files(snap)) != manifest["n_files"]:
        # reference-counting vacuum may keep a dropped version's dir
        # alive for files later snapshots reuse — a PARTIAL dir must
        # fail loudly, not silently return a subset of the snapshot
        raise ValueError(
            f"snapshot {version} of {path!r} was vacuumed (directory "
            "retains only files referenced by newer versions)")
    if where is not None:
        files = prune_files(manifest, where)
        if files is None and load_file_blooms(manifest):
            files = _data_files(snap)       # bloom-only pruning
        if files is not None:
            files = bloom_prune_files(manifest, where, files)
            if not files:
                return spark.createDataFrame([], schema)
            # basePath keeps Hive partition columns resolvable when
            # reading explicit pruned paths (no-op for flat snapshots)
            return apply_delete_vectors(
                spark, path, manifest,
                spark.read.option("basePath", snap)
                .schema(schema).parquet(
                    *[os.path.join(snap, f) for f in files]))
    return apply_delete_vectors(
        spark, path, manifest, spark.read.schema(schema).parquet(snap))


def _merge_changes(base: DataFrame, updates: DataFrame, key: str,
                   detect_cols: list[str] | None = None,
                   broadcast_batch: bool = True) -> DataFrame:
    """Change feed of a keyed merge, computed AT COMMIT TIME from
    base × updates: one join whose probe side is the (usually small)
    update batch — broadcast-able, never a full-outer diff of two
    whole snapshots.  A merge can only insert (update key absent from
    base) or update (present, content differs); rewriting a row with
    identical content emits nothing.  Output columns, change-type
    vocabulary, and the content fingerprint are identical to
    :func:`read_changes` over the same transition, so stored ≡ diff
    by construction.

    ``detect_cols`` restricts change DETECTION (not payloads) to the
    given columns — :func:`merge_versioned` passes the PARENT
    snapshot's non-key columns so an ``evolve_schema`` merge stays
    diff-equivalent: the read-time diff cannot see one-side-only
    columns, so a value landing in a freshly ADDED column on an
    existing key must emit nothing here either (ADVICE r9 — the
    widened fingerprint used to emit an update pair the diff path
    never would)."""
    # Pre-filter the base to rows whose key appears in the batch: a
    # right-outer join discards unmatched base rows anyway, so the
    # semi-join is a no-op semantically — but it turns "shuffle (or
    # broadcast) the whole base against a tiny batch" into "scan the
    # base once probing the batch's broadcast key set, then join two
    # batch-sized frames" (guide §2.4/§3.2: the base never exchanges
    # for a CDC-sized merge's change feed).  The broadcast hint is
    # explicit because the batch is RDD-backed (no size estimate —
    # without the hint the base pays a full hash exchange before AQE
    # can demote the join); a keyed-merge batch is CDC-sized by this
    # operator's design contract — callers merging a batch that is
    # NOT CDC-sized pass merge_versioned(broadcast_batch=False) and
    # the planner falls back to its size-based strategy instead of
    # risking an oversized broadcast (r11 ADVICE).
    keyset = updates.select(key).distinct()
    matched = base.join(
        F.broadcast(keyset) if broadcast_batch else keyset,
        key, "left_semi")
    o, n = matched.alias("o"), updates.alias("n")
    common = sorted(set(base.columns) & set(updates.columns) - {key}) \
        if detect_cols is None else sorted(detect_cols)
    all_cols = [key] + sorted((set(base.columns) | set(updates.columns))
                              - {key})

    def fp(side: str, cols: list[str]):
        return F.md5(F.to_json(F.struct(
            *[F.col(f"{side}.{c}") for c in cols])))

    def payload(side: str, has: set):
        return F.struct(*[
            (F.col(f"{side}.{c}") if c in has else F.lit(None)).alias(c)
            for c in all_cols])

    o_has, n_has = set(base.columns), set(updates.columns)
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"),
                    "right_outer")
    change = F.when(
        F.col(f"o.{key}").isNull(),
        F.array(F.struct(F.lit("insert").alias("_change_type"),
                         payload("n", n_has).alias("p")))
    ).when(
        fp("o", common) != fp("n", common),
        F.array(
            F.struct(F.lit("update_preimage").alias("_change_type"),
                     payload("o", o_has).alias("p")),
            F.struct(F.lit("update_postimage").alias("_change_type"),
                     payload("n", n_has).alias("p")))
    ).otherwise(F.array())
    return (joined.select(F.explode(change).alias("c"))
            .select(F.col("c._change_type").alias("_change_type"),
                    "c.p.*"))


def merge_versioned(spark: SparkSession, path: str, updates: DataFrame,
                    key: str, expected_parent: int | None = None,
                    extra_meta: dict | None = None,
                    store_changes: bool = False,
                    file_reuse: bool = False,
                    evolve_schema: bool = False,
                    mor: bool = False,
                    broadcast_batch: bool = True) -> int:
    """MERGE (keyed upsert) producing a NEW snapshot: same-key rows
    replaced wholesale, unmatched updates inserted, unmatched base
    rows carried over — :func:`plans.joins.upsert` semantics, but
    committed under snapshot isolation: readers of the current
    version never see half-merged state, and the pre-merge version
    stays readable (time travel).  Returns the new version.

    ``expected_parent`` defaults to the version actually read, so a
    concurrent commit between read and flip fails the merge instead
    of silently dropping it (lost-update protection).

    ``store_changes=True`` additionally persists this commit's change
    feed (computed from base × updates — the merge already knows its
    delta; see :func:`_merge_changes`) so :func:`read_changes` over
    the span is O(changes) instead of a two-snapshot diff.  Opt-in:
    it costs one extra keyed join and a (change-sized) write per
    commit.

    ``evolve_schema=True`` (Delta mergeSchema semantics): columns the
    update batch ADDS widen the table schema (base rows read NULL for
    them), and columns it omits null-pad on the inserted rows —
    instead of the default strict alignment, which drops unknown
    update columns.  Same-name/different-type conflicts raise (no
    silent type promotion).  Composes with ``file_reuse``: carried
    old files read under the widened manifest schema via
    schema-on-read (absent columns null out).

    ``file_reuse=True`` commits copy-on-write at FILE granularity
    (the :func:`delete_where` shape): one semi-join against the
    update keys finds the files whose rows the merge touches, the
    upsert runs over THAT SLICE plus the update batch (unmatched
    updates insert there), and every untouched file is carried by
    reference — a small CDC batch against a 100 TB table rewrites
    the touched slice, not the table.  Flat layouts only
    (partitioned parents fall back to the full materialization);
    parent ``stats_cols`` carry forward like delete_where's.

    ``broadcast_batch`` (default True) pins explicit ``F.broadcast``
    hints on the update-batch side of the internal joins: the batch
    is CDC-SIZED by this operator's design contract but usually
    RDD-backed (no size estimate), so without the hint the planner
    sort-merges with a full table exchange.  A caller merging a batch
    that is NOT CDC-sized (a backfill-scale upsert) passes ``False``
    and the planner's size-based strategy (with its broadcast caps
    and graceful sort-merge fallback) decides instead — the
    ``dedup._guard_unblocked_cross`` escape-hatch discipline without
    paying a count job on every CDC merge.

    ``mor=True`` (merge-on-read — the r11 deletion-vector machinery,
    overriding ``file_reuse``): matched keys whose content CHANGES
    get their old copies killed by a delete-sized vector sidecar and
    their new versions appended as the commit's own files; inserts
    append; unchanged matches neither move nor version (the
    ``_merge_changes`` fingerprint discipline, detect-cols-scoped so
    an ``evolve_schema`` merge stays diff-equivalent); EVERY parent
    file carries by reference.  A scattered update batch against a
    100 TB table writes vectors + the batch — zero files rewritten,
    beating even the file-reuse slice rewrite when touched rows
    spread across many files.  Requires a UNIQUE ``key``; flat
    layouts only (raises on partitioned parents)."""
    from ..plans.joins import upsert

    parent = latest_version(path)
    if parent is None:
        raise ValueError(
            f"merge_versioned: {path!r} has no base snapshot — "
            "write_versioned the initial table first")
    if expected_parent is None:
        expected_parent = parent
    m = _read_manifest(path, parent)
    base = read_version(spark, path, parent)
    parent_detect = sorted(set(base.columns) - {key})
    if evolve_schema:
        b_t = {f.name: f.dataType for f in base.schema.fields}
        u_t = {f.name: f.dataType for f in updates.schema.fields}
        conflicts = sorted(c for c in b_t
                           if c in u_t and b_t[c] != u_t[c])
        if conflicts:
            raise ValueError(
                "merge_versioned(evolve_schema=True): column type "
                f"conflicts {conflicts} — no silent type promotion; "
                "cast the update batch explicitly")
        all_cols = list(base.columns) + [c for c in updates.columns
                                         if c not in b_t]
        types = {**u_t, **b_t}

        def _align(df: DataFrame, have: set) -> DataFrame:
            return df.select(*[
                (F.col(c) if c in have
                 else F.lit(None).cast(types[c])).alias(c)
                for c in all_cols])

        base = _align(base, set(b_t))
        aligned = _align(updates, set(u_t))
        _widen = lambda df: _align(df, set(b_t))  # noqa: E731
    else:
        aligned = updates.select(*base.columns)
        _widen = None
    # The batch is CDC-sized by this operator's design, but its
    # LINEAGE may be arbitrarily expensive (a filtered scan, a codec
    # decode, a feed stitch) and the merge evaluates it 2-4 times
    # (feed keys + feed payload + touched detection + the upsert
    # write).  Persist once so the updates subtree runs exactly once
    # per merge (guide §5: reuse + recompute cost both argue for it).
    aligned = aligned.persist()
    try:
        return _merge_commit(
            spark, path, key, m, base, aligned, parent_detect, _widen,
            expected_parent, extra_meta, store_changes, file_reuse,
            mor, broadcast_batch)
    finally:
        aligned.unpersist()


def _merge_commit(spark, path, key, m, base, aligned, parent_detect,
                  _widen, expected_parent, extra_meta, store_changes,
                  file_reuse, mor, broadcast_batch=True) -> int:
    from ..plans.joins import upsert

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_batch else df

    if mor:
        if m.get("partition_by"):
            raise ValueError(
                "merge_versioned(mor=True): delete vectors require a "
                "flat layout — partitioned tables merge copy-on-write")
        changes = _merge_changes(base, aligned, key,
                                 detect_cols=parent_detect,
                                 broadcast_batch=broadcast_batch) \
            if store_changes else None
        det = _detect_frame(spark, path, m)
        if _widen is not None:
            have = {f.name for f in
                    T.StructType.fromJson(
                        json.loads(m["schema_json"])).fields}
            det = det.select(
                "_f", *[(F.col(c) if c in have
                         else F.lit(None)
                         .cast(aligned.schema[c].dataType)).alias(c)
                        for c in aligned.columns])
        o, nn = det.alias("o"), aligned.alias("n")
        common = parent_detect

        def _fp(side: str):
            return F.md5(F.to_json(F.struct(
                *[F.col(f"{side}.{c}") for c in common])))

        # ONE detection scan: the matched (file, changed?, new-payload)
        # rows are batch-sized — persist them so the replacement
        # write, the DV sidecar write, and the insert anti-join all
        # read the cache instead of re-running the full-table join
        # (was 3 scans of the table per MOR merge; guide §5).  The
        # insert anti-join probes the persisted MATCHED KEYS (batch-
        # sized) instead of building a hash over every table key.
        # broadcast the batch side explicitly: it is RDD-backed (no
        # size estimate), and without the hint the detection join
        # plans as SMJ with a full hash exchange of the table
        j = o.join(_hint(nn),
                   F.col(f"o.{key}") == F.col(f"n.{key}"))
        sel = j.select(
            F.col("o._f").alias("_f"),
            (_fp("o") != _fp("n")).alias("_chg"),
            *[F.col(f"n.{c}").alias(c) for c in aligned.columns]
        ).persist()
        try:
            n_changed = sel.where(F.col("_chg")).count()
            changed = sel.where(F.col("_chg"))
            changed_old = changed.select(
                F.regexp_extract(F.col("_f"), _DV_TAIL, 1)
                .alias("_file"), key)
            changed_new = changed.select(*aligned.columns)
            inserts = aligned.join(sel.select(key), key, "left_anti")
            replacement = changed_new.unionByName(inserts)
            dv_df = changed_old if n_changed else None
            return write_versioned(
                replacement, path, expected_parent=expected_parent,
                _op="merge", extra_meta={**(extra_meta or {}),
                                         "merge_mode": "mor"},
                changes_df=changes, stats_cols=m.get("stats_cols"),
                reuse_files=_root_files(path, m),
                reuse_stats=_root_stats(path, m),
                dv_df=dv_df, dv_key=key)
        finally:
            sel.unpersist()
    if file_reuse and not m.get("partition_by"):
        schema = T.StructType.fromJson(json.loads(m["schema_json"]))
        parent_files = _root_files(path, m)
        touched = sorted({
            _rel_uri(path, r["_f"]) for r in
            _detect_frame(spark, path, m)
            .join(_hint(aligned.select(key).distinct()),
                  key, "left_semi")
            # no .distinct() before the collect: dedup happens in the
            # set comprehension — the rows are batch-sized (one per
            # MATCHED base row, CDC-bounded) and the distinct added a
            # full exchange + an AQE stage per merge for nothing
            .select("_f").collect()
        })                                  # bounded: matched rows
        untouched = [f for f in parent_files if f not in set(touched)]
        sub = (apply_delete_vectors(
            spark, path, m, spark.read.schema(schema).parquet(
                *[os.path.join(path, f) for f in touched]))
            if touched else spark.createDataFrame([], schema))
        # The stored feed only needs BASE rows whose key the batch
        # touches, and every such row lives in a touched file (that
        # is the definition of touched) — so the feed's base side is
        # the TOUCHED SLICE, not the whole table: a CDC-sized merge
        # against a 100 TB table diffs megabytes, not the table
        # (payload values are identical; missing columns NULL-pad the
        # same way on both paths).
        changes = _merge_changes(sub, aligned, key,
                                 detect_cols=parent_detect,
                                 broadcast_batch=broadcast_batch) \
            if store_changes else None
        if _widen is not None:
            sub = _widen(sub)       # carried files null-pad via
            #                         schema-on-read; the rewritten
            #                         slice widens here
        merged = upsert(sub, aligned, key)
        return write_versioned(
            merged, path, expected_parent=expected_parent, _op="merge",
            extra_meta=extra_meta, changes_df=changes,
            stats_cols=m.get("stats_cols"),
            reuse_files=untouched, reuse_stats=_root_stats(path, m))
    changes = _merge_changes(base, aligned, key,
                             detect_cols=parent_detect,
                             broadcast_batch=broadcast_batch) \
        if store_changes else None
    merged = upsert(base, aligned, key)
    # the full-materialization path carries the parent's skipping /
    # layout contract exactly like the file_reuse branch and
    # delete_where do — an ordinary merge must not silently disarm
    # where= pruning or flatten a partitioned table (ADVICE r9)
    return write_versioned(merged, path,
                           expected_parent=expected_parent, _op="merge",
                           extra_meta=extra_meta, changes_df=changes,
                           stats_cols=m.get("stats_cols"),
                           partition_by=m.get("partition_by"))


def _root_files(path: str, manifest: dict) -> list[str]:
    """A snapshot's data files as TABLE-ROOT-relative paths,
    regardless of manifest generation (explicit list vs directory
    read)."""
    if manifest.get("data_files") is not None:
        return list(manifest["data_files"])
    v = manifest["version"]
    return [f"snap/v={v}/{f}" for f in _data_files(_snap_dir(path, v))]


def _root_stats(path: str, manifest: dict) -> dict:
    """A snapshot's per-file stats re-keyed TABLE-ROOT-relative (the
    file-reuse sidecar keying), empty when none recorded."""
    stats = load_file_stats(manifest) or {}
    if manifest.get("data_files") is not None:
        return dict(stats)
    v = manifest["version"]
    return {f"snap/v={v}/{k}": s for k, s in stats.items()}


def _rel_uri(path: str, uri: str) -> str:
    """input_file_name() URI → table-root-relative posix path."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri).path or uri
    return os.path.relpath(unquote(p), os.path.abspath(path)) \
        .replace(os.sep, "/")


def delete_where(spark: SparkSession, path: str, condition,
                 expected_parent: int | None = None,
                 store_changes_key: str | None = None,
                 mode: str = "cow", key: str | None = None) -> dict:
    """Row-level DELETE as a FILE-REUSE commit (Delta DELETE's
    copy-on-write shape — the upgrade path the module docstring
    names): one pass finds the files that CONTAIN matching rows
    (``input_file_name()`` + the predicate — with manifest stats this
    is where a clustered table shines: most files never match), only
    those are read back, filtered, and rewritten as the new version's
    files; every untouched file is carried by REFERENCE in the
    manifest.  Deleting 0.1% of a 100 TB table costs one scan plus a
    rewrite of the touched slice, not a rewrite of the table.

    ``condition`` is a Column or SQL string; rows where it is TRUE
    are deleted (NULL ⇒ kept, SQL DELETE semantics).  Partitioned
    parents fall back to a plain filtered rewrite (directory columns
    do not resolve across snapshot dirs).  ``store_changes_key``
    additionally persists the deleted rows as this commit's change
    feed (the stored-CDC path — the writer knows its delta exactly).
    Parent manifest ``stats_cols`` are carried forward: new files get
    fresh footer stats, reused files keep their parent entries.

    ``mode='mor'`` (MERGE-ON-READ, Delta/Iceberg deletion vectors —
    r10 VERDICT #2): instead of rewriting the touched files, the
    matching rows' ``(file, key)`` pairs are written as a
    delete-sized DV parquet sidecar (``dv/v=N/``) and EVERY parent
    file is carried by reference; :func:`read_version` anti-joins the
    vectors in.  This is the right shape for SCATTERED point deletes
    (GDPR erasure, id-list takedowns) where the layout does not
    localize the rows and copy-on-write would rewrite most of the
    table to delete 0.01% of it: the commit costs one (prunable)
    scan to find the matches plus a delete-sized write — zero data
    rewritten.  Requires ``key`` (a UNIQUE row identity column — a
    DV entry deletes every row of that key in that file);
    ``read_changes`` still sees the deletes (the diff reads both
    sides DV-applied, and ``store_changes_key`` stores them);
    :func:`optimize_versioned` folds vectors into rewritten files;
    vacuum reference-counts the sidecars.  Flat layouts only (the
    file-tail binding — partitioned parents raise; use the default
    copy-on-write there).

    Returns ``{"version", "n_deleted", "files_rewritten",
    "files_reused"}`` (MOR commits always report
    ``files_rewritten=0``)."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"delete_where: mode must be 'cow' or 'mor', "
                         f"got {mode!r}")
    parent = latest_version(path)
    if parent is None:
        raise ValueError(f"versioned table {path!r} has no snapshots")
    if expected_parent is None:
        expected_parent = parent
    m = _read_manifest(path, parent)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    hit = F.coalesce(cond, F.lit(False))
    base = read_version(spark, path, parent)
    schema = T.StructType.fromJson(json.loads(m["schema_json"]))
    stats_cols = m.get("stats_cols")

    def changes_of(deleted: DataFrame) -> DataFrame | None:
        if store_changes_key is None:
            return None
        key = store_changes_key
        cols = [key] + sorted(set(deleted.columns) - {key})
        return deleted.select(F.lit("delete").alias("_change_type"),
                              *cols)

    if mode == "mor":
        if m.get("partition_by"):
            raise ValueError(
                "delete_where(mode='mor'): delete vectors require a "
                "flat layout (file-tail binding) — partitioned tables "
                "delete copy-on-write")
        if key is None:
            raise ValueError(
                "delete_where(mode='mor') requires key= (a unique row "
                "identity column the vectors bind to)")
        if key not in base.columns:
            raise ValueError(
                f"delete_where: key {key!r} not in table columns")
        # the detect frame is DV-applied, so already-deleted rows
        # can't re-hit; ONE (stats/bloom-prunable) scan finds the
        # matches and the delete-sized hit set is PERSISTED, so the
        # count, the DV sidecar write, and the stored-feed write all
        # read the cache instead of re-scanning the table (was 3 full
        # scans per MOR delete; guide §5).
        hits = _detect_frame(spark, path, m).where(hit).persist()
        try:
            n_deleted = hits.count()
            dv_df = (hits.select(
                F.regexp_extract(F.col("_f"), _DV_TAIL, 1)
                .alias("_file"), key) if n_deleted else None)
            changes = changes_of(hits.drop("_f")) if n_deleted \
                else changes_of(spark.createDataFrame([], schema))
            parent_files = _root_files(path, m)
            version = write_versioned(
                spark.createDataFrame([], schema), path,
                expected_parent=expected_parent, _op="delete",
                extra_meta={"delete_mode": "mor"},
                stats_cols=stats_cols, changes_df=changes,
                reuse_files=parent_files,
                reuse_stats=_root_stats(path, m),
                dv_df=dv_df, dv_key=key, _no_data=True)
        finally:
            hits.unpersist()
        return {"version": version, "n_deleted": int(n_deleted),
                "files_rewritten": 0,
                "files_reused": len(parent_files)}
    if m.get("partition_by"):
        kept = base.where(~hit)
        deleted = base.where(hit)
        n_deleted = deleted.count()
        version = write_versioned(
            kept, path, expected_parent=expected_parent, _op="delete",
            partition_by=m["partition_by"], stats_cols=stats_cols,
            changes_df=changes_of(deleted))
        return {"version": version, "n_deleted": int(n_deleted),
                "files_rewritten": m["n_files"], "files_reused": 0}
    parent_files = _root_files(path, m)
    # ONE detection scan returns both the touched files AND the
    # per-file match counts (bounded: one row per touched file) —
    # the separate n_deleted count over the touched slice is free
    # (guide §1.2: fold passes).
    per_file = (_detect_frame(spark, path, m)
                .where(hit).groupBy("_f")
                .agg(F.count(F.lit(1)).alias("_n")).collect())
    touched = sorted({_rel_uri(path, r["_f"]) for r in per_file})
    n_deleted = sum(r["_n"] for r in per_file)
    untouched = [f for f in parent_files if f not in set(touched)]
    if touched:
        # the raw slice re-read must be DV-applied or rows deleted by
        # EARLIER merge-on-read commits resurrect into the rewrite
        sub = apply_delete_vectors(
            spark, path, m, spark.read.schema(schema).parquet(
                *[os.path.join(path, f) for f in touched]))
        replacement = sub.where(~hit)
        changes = changes_of(sub.where(hit))
    else:
        replacement = spark.createDataFrame([], schema)
        changes = changes_of(replacement)
    version = write_versioned(
        replacement, path, expected_parent=expected_parent,
        _op="delete", stats_cols=stats_cols, changes_df=changes,
        reuse_files=untouched, reuse_stats=_root_stats(path, m),
        _no_data=not touched)
    return {"version": version, "n_deleted": int(n_deleted),
            "files_rewritten": len(touched),
            "files_reused": len(untouched)}


def update_where(spark: SparkSession, path: str, condition,
                 assignments: dict, expected_parent: int | None = None,
                 store_changes_key: str | None = None,
                 mode: str = "cow", key: str | None = None) -> dict:
    """Row-level UPDATE as a FILE-REUSE commit — :func:`delete_where`'s
    natural sibling (Delta UPDATE's copy-on-write shape): one pass
    finds the files CONTAINING matching rows, only those are read
    back and rewritten with ``assignments`` applied to the matching
    rows, and every untouched file is carried by REFERENCE.  Updating
    0.1% of a 100 TB table costs one scan plus the touched slice.

    ``condition`` is a Column or SQL string; rows where it is TRUE
    are updated (NULL ⇒ untouched, SQL UPDATE semantics).
    ``assignments`` maps existing column names to Columns or SQL
    expression strings evaluated against the pre-update row (standard
    UPDATE: ``{"cents": "cents * 2"}`` doubles, all assignments see
    the OLD values).  Assigning an unknown column raises — schema
    evolution belongs to ``merge_versioned(evolve_schema=True)``.

    ``store_changes_key`` persists update pre/post pairs as this
    commit's stored change feed — ONLY for rows whose content
    actually changed (an assignment that rewrites a row with
    identical values emits nothing, matching the diff path's
    fingerprint semantics exactly, so stored ≡ diff holds).
    Partitioned parents fall back to a full rewrite; parent
    ``stats_cols`` carry forward.

    ``mode='mor'`` (merge-on-read — Iceberg's MOR update shape, the
    :func:`delete_where` deletion-vector machinery): instead of
    rewriting the touched files, the CHANGED rows' old copies are
    killed by a delete-sized ``(file, key)`` vector sidecar and their
    updated versions append as the commit's own new files — every
    parent file carries by reference, ``files_rewritten = 0``.  The
    right shape for scattered updates a clustered layout can't
    localize.  Requires ``key`` (unique row identity; assigning the
    key column itself is refused — that is a delete+insert, use
    ``merge_versioned``); flat layouts only; unchanged-content rows
    are neither vectored nor re-appended (the fingerprint
    discipline).

    Returns ``{"version", "n_updated", "n_changed",
    "files_rewritten", "files_reused"}`` — ``n_updated`` counts
    condition matches, ``n_changed`` the rows whose content actually
    changed."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"update_where: mode must be 'cow' or 'mor', "
                         f"got {mode!r}")
    parent = latest_version(path)
    if parent is None:
        raise ValueError(f"versioned table {path!r} has no snapshots")
    if expected_parent is None:
        expected_parent = parent
    m = _read_manifest(path, parent)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    hit = F.coalesce(cond, F.lit(False))
    base = read_version(spark, path, parent)
    schema = T.StructType.fromJson(json.loads(m["schema_json"]))
    unknown = sorted(set(assignments) - set(base.columns))
    if unknown:
        raise ValueError(
            f"update_where: unknown column(s) {unknown} — UPDATE "
            "cannot add columns (use merge_versioned(evolve_schema="
            "True))")
    sets = {c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in assignments.items()}

    def apply_to(df: DataFrame, when_hit) -> DataFrame:
        return df.select(*[
            (F.when(when_hit, sets[c].cast(schema[c].dataType))
             .otherwise(F.col(c)).alias(c) if c in sets else F.col(c))
            for c in df.columns])

    def changes_of(pre: DataFrame) -> DataFrame | None:
        # pre holds ONLY hit rows; emit pairs where content changed
        if store_changes_key is None:
            return None
        key = store_changes_key
        cols = [key] + sorted(set(pre.columns) - {key})
        post_exprs = {c: sets[c].cast(schema[c].dataType)
                      for c in sets}
        pre_s = F.struct(*[F.col(c).alias(c) for c in cols])
        post_s = F.struct(*[
            (post_exprs[c] if c in post_exprs else F.col(c)).alias(c)
            for c in cols])
        others = [c for c in cols if c != key]
        fp = lambda s: F.md5(F.to_json(F.struct(  # noqa: E731
            *[s[c] for c in others])))
        staged = pre.select(pre_s.alias("_pre"), post_s.alias("_post")) \
            .where(fp(F.col("_pre")) != fp(F.col("_post")))
        ev = staged.select(F.explode(F.array(
            F.struct(F.lit("update_preimage").alias("_change_type"),
                     F.col("_pre").alias("p")),
            F.struct(F.lit("update_postimage").alias("_change_type"),
                     F.col("_post").alias("p")))).alias("c"))
        return ev.select(F.col("c._change_type").alias("_change_type"),
                         "c.p.*")

    def n_changed_of(pre: DataFrame) -> int:
        others = sorted(set(pre.columns))
        old_fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in others])))
        new_fp = F.md5(F.to_json(F.struct(*[
            (sets[c].cast(schema[c].dataType) if c in sets
             else F.col(c)).alias(c) for c in others])))
        return pre.where(old_fp != new_fp).count()

    if mode == "mor":
        if m.get("partition_by"):
            raise ValueError(
                "update_where(mode='mor'): delete vectors require a "
                "flat layout — partitioned tables update copy-on-write")
        if key is None:
            raise ValueError(
                "update_where(mode='mor') requires key= (a unique row "
                "identity column the vectors bind to)")
        if key in assignments:
            raise ValueError(
                f"update_where(mode='mor'): assigning the key column "
                f"{key!r} is a delete+insert — use merge_versioned")
        if key not in base.columns:
            raise ValueError(
                f"update_where: key {key!r} not in table columns")
        det = _detect_frame(spark, path, m)
        # only CHANGED rows move: old copy vectored out, new content
        # appended as this commit's own files.  ONE detection scan:
        # the update-sized hit set (with its changed-content flag) is
        # PERSISTED so the two counts, the DV sidecar, the replacement
        # write, and the stored feed all read the cache instead of
        # re-scanning the table (was 5 full scans per MOR update;
        # guide §5).
        others = sorted(set(det.columns) - {"_f"})
        old_fp = F.md5(F.to_json(F.struct(*[F.col(c)
                                            for c in others])))
        new_fp = F.md5(F.to_json(F.struct(*[
            (sets[c].cast(schema[c].dataType) if c in sets
             else F.col(c)).alias(c) for c in others])))
        hits = det.where(hit).withColumn(
            "_chg", old_fp != new_fp).persist()
        try:
            counts = hits.agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.col("_chg").cast("int")).alias("_c")).first()
            n_updated = counts["_n"]
            n_changed = counts["_c"] or 0
            changed = hits.where(F.col("_chg"))
            dv_df = (changed.select(
                F.regexp_extract(F.col("_f"), _DV_TAIL, 1)
                .alias("_file"), key) if n_changed else None)
            replacement = (apply_to(changed.drop("_f", "_chg"),
                                    F.lit(True))
                           .select(*[f.name for f in schema.fields])
                           if n_changed
                           else spark.createDataFrame([], schema))
            version = write_versioned(
                replacement, path, expected_parent=expected_parent,
                _op="update", extra_meta={"update_mode": "mor"},
                stats_cols=m.get("stats_cols"),
                changes_df=changes_of(hits.drop("_f", "_chg")),
                reuse_files=_root_files(path, m),
                reuse_stats=_root_stats(path, m),
                dv_df=dv_df, dv_key=key,
                _no_data=not n_changed)
        finally:
            hits.unpersist()
        return {"version": version, "n_updated": int(n_updated),
                "n_changed": int(n_changed), "files_rewritten": 0,
                "files_reused": m["n_files"]}
    if m.get("partition_by"):
        pre = base.where(hit)
        n_updated = pre.count()
        n_changed = n_changed_of(pre)
        version = write_versioned(
            apply_to(base, hit), path,
            expected_parent=expected_parent, _op="update",
            partition_by=m["partition_by"],
            stats_cols=m.get("stats_cols"), changes_df=changes_of(pre))
        return {"version": version, "n_updated": int(n_updated),
                "n_changed": int(n_changed),
                "files_rewritten": m["n_files"], "files_reused": 0}
    parent_files = _root_files(path, m)
    # ONE detection scan returns the touched files AND the per-file
    # match/changed counts (bounded: one row per touched file) — the
    # two separate counts over the touched slice are free (guide
    # §1.2: fold passes).
    det = _detect_frame(spark, path, m)
    _others = sorted(set(det.columns) - {"_f"})
    _old_fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in _others])))
    _new_fp = F.md5(F.to_json(F.struct(*[
        (sets[c].cast(schema[c].dataType) if c in sets
         else F.col(c)).alias(c) for c in _others])))
    per_file = (det.where(hit).groupBy("_f").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((_old_fp != _new_fp).cast("int")).alias("_c"))
        .collect())
    touched = sorted({_rel_uri(path, r["_f"]) for r in per_file})
    n_updated = sum(r["_n"] for r in per_file)
    n_changed = sum(r["_c"] or 0 for r in per_file)
    untouched = [f for f in parent_files if f not in set(touched)]
    if touched:
        sub = apply_delete_vectors(
            spark, path, m, spark.read.schema(schema).parquet(
                *[os.path.join(path, f) for f in touched]))
        pre = sub.where(hit)
        replacement = apply_to(sub, hit)
        changes = changes_of(pre)
    else:
        replacement = spark.createDataFrame([], schema)
        changes = changes_of(replacement)
    version = write_versioned(
        replacement, path, expected_parent=expected_parent,
        _op="update", stats_cols=m.get("stats_cols"),
        changes_df=changes, reuse_files=untouched,
        reuse_stats=_root_stats(path, m), _no_data=not touched)
    return {"version": version, "n_updated": int(n_updated),
            "n_changed": int(n_changed),
            "files_rewritten": len(touched),
            "files_reused": len(untouched)}


def table_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY for a versioned table: one row per committed
    manifest (version ascending) with the operation, parent link,
    file/feed facts, and writer identity — the audit view a governed
    table owes its operators.  Manifests are O(1) JSON reads, so this
    never touches data; the result is a tiny driver-built frame
    (bounded by version count — run ``vacuum_versioned`` retention
    like any long-lived table).  ``committed_at`` is the wall-clock
    manifest stamp (timestamp time travel's axis) — present for
    operators, excluded from any hash-gated output by the usual
    rule."""
    rows = []
    for v in versions(path):
        m = _read_manifest(path, v)
        rows.append((
            int(v), m.get("parent"), str(m.get("op", "write")),
            int(m["n_files"]), bool(m.get("changes")),
            m.get("data_files") is not None,
            m.get("restored_from"),
            m.get("stream_query"), m.get("stream_batch"),
            float(m["committed_at"]) if m.get("committed_at") else None,
        ))
    schema = ("version long, parent long, op string, n_files long, "
              "has_changes boolean, file_reuse boolean, "
              "restored_from long, stream_query string, "
              "stream_batch long, committed_at double")
    return spark.createDataFrame(rows, schema)


def restore_version(spark: SparkSession, path: str, version: int,
                    expected_parent: int | None = None,
                    store_changes_key: str | None = None) -> dict:
    """ROLLBACK as a first-class commit (Delta RESTORE): make snapshot
    ``version`` the table's new head WITHOUT rewriting its data — a
    new manifest carries the old version's files by REFERENCE (the
    :func:`delete_where` copy-on-write machinery), so restoring a
    100 TB table after a bad commit costs one manifest, zero data
    movement, and the full audit trail survives: the bad version
    stays readable (time travel), ``op='restore'`` +
    ``restored_from`` land in the manifest, and history keeps moving
    FORWARD (heads never rewind — a restore is a new version whose
    CONTENT equals the old one).

    ``store_changes_key`` persists the restore's change feed — the
    INVERSE of the feed it undoes: ``read_changes(version → head)``
    with insert↔delete and preimage↔postimage swapped, so CDC
    consumers that applied the bad span can net it back out.  Served
    from stored change files when the undone span has them
    (O(changes)), else computed as the snapshot diff.

    The restored snapshot's ``stats_cols`` sidecar and schema carry
    forward; PARTITIONED snapshots cannot be carried by reference
    (directory columns don't resolve across snapshot dirs — the
    file-reuse invariant), so they restore as a full rewrite with the
    original ``partition_by``.  Restoring the current head, an
    unknown version, or a vacuumed version raises.

    Returns ``{"version", "restored_from", "files_reused",
    "files_rewritten"}``."""
    head = latest_version(path)
    if head is None:
        raise ValueError(f"versioned table {path!r} has no snapshots")
    if expected_parent is None:
        expected_parent = head
    if version == head:
        raise ValueError(
            f"restore_version: {version} is already the head of "
            f"{path!r} — nothing to restore")
    m_old = _read_manifest(path, version)    # raises on unknown version
    changes = None
    if store_changes_key is not None:
        feed = read_changes(spark, path, store_changes_key,
                            from_version=version, to_version=head)
        t = F.col("_change_type")
        changes = feed.withColumn(
            "_change_type",
            F.when(t == "insert", "delete")
             .when(t == "delete", "insert")
             .when(t == "update_preimage", "update_postimage")
             .otherwise("update_preimage"))
    meta = {"restored_from": version}
    if m_old.get("partition_by"):
        df = read_version(spark, path, version)   # raises if vacuumed
        new_v = write_versioned(
            df, path, expected_parent=expected_parent, _op="restore",
            extra_meta=meta, stats_cols=m_old.get("stats_cols"),
            partition_by=m_old["partition_by"], changes_df=changes,
            bloom_cols=m_old.get("bloom_cols") or [],
            bloom_bits=m_old.get("bloom_bits"),
            bloom_hashes=m_old.get("bloom_hashes"))
        return {"version": new_v, "restored_from": version,
                "files_reused": 0, "files_rewritten": m_old["n_files"]}
    files = _root_files(path, m_old)
    missing = [f for f in files
               if not os.path.exists(os.path.join(path, f))]
    # len(files) != n_files catches a vacuumed DIRECTORY-read
    # manifest: its snap dir lists empty (or partial, when newer
    # reuse-commits kept some files alive), which would otherwise
    # silently "restore" a truncated table
    if missing or len(files) != m_old["n_files"]:
        raise ValueError(
            f"restore_version: snapshot {version} of {path!r} was "
            f"vacuumed ({len(missing) + m_old['n_files'] - len(files)}"
            f" of {m_old['n_files']} data files gone) — only retained "
            "versions can be restored")
    dv_gone = [v for v in (m_old.get("dv_dirs") or [])
               if not os.path.isdir(_dv_dir(path, v))]
    if dv_gone:
        raise ValueError(
            f"restore_version: snapshot {version} of {path!r} was "
            f"vacuumed (delete-vector dirs {dv_gone} gone) — only "
            "retained versions can be restored")
    schema = T.StructType.fromJson(json.loads(m_old["schema_json"]))
    empty = spark.createDataFrame([], schema)
    # Bloom config travels WITH the carried bitmaps: write_versioned
    # would otherwise inherit bloom_bits/bloom_hashes from the current
    # HEAD's manifest, and bitmaps built under m_old's sizing probed
    # with HEAD's parameters yield silent false negatives (r10
    # ADVICE).  m_old without blooms restores the no-bloom state
    # ([] disarms — RESTORE restores table properties too).
    new_v = write_versioned(
        empty, path, expected_parent=expected_parent, _op="restore",
        extra_meta=meta, stats_cols=m_old.get("stats_cols"),
        changes_df=changes, reuse_files=files,
        reuse_stats=_root_stats(path, m_old),
        reuse_blooms=_root_blooms(path, m_old),
        bloom_cols=m_old.get("bloom_cols") or [],
        bloom_bits=m_old.get("bloom_bits"),
        bloom_hashes=m_old.get("bloom_hashes"),
        # the restored CONTENT includes m_old's delete vectors —
        # inheriting the current head's list instead would apply
        # post-restore deletes to the restored state ([] resets when
        # m_old had none)
        dv_dirs=m_old.get("dv_dirs") or [],
        dv_key=m_old.get("dv_key"), _no_data=True)
    return {"version": new_v, "restored_from": version,
            "files_reused": len(files), "files_rewritten": 0}


def clone_versioned(spark: SparkSession, src: str, dst: str,
                    version: int | None = None) -> dict:
    """SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE``):
    create ``dst`` as a NEW versioned table whose first snapshot
    carries the source snapshot's data files by REFERENCE — cloning a
    100 TB table for a dev branch, an experiment, or a what-if
    migration costs one manifest, zero data movement.  The clone then
    evolves INDEPENDENTLY: copy-on-write commits (:func:`delete_where`
    / :func:`update_where` / file-reuse merges) rewrite only touched
    slices into the clone's own tree while untouched files keep
    pointing into the source; the source never sees the clone's
    history and vice versa.

    File references are stored dst-root-relative (``../src/...``) —
    the same explicit ``data_files`` contract every file-reuse commit
    uses, so readers, stats skipping (the sidecar carries forward),
    CDC, vacuum's reference counting, and further COW commits all
    work on a clone unchanged.  :func:`vacuum_versioned` on the CLONE
    never touches source files (it only removes under its own root);
    vacuuming the SOURCE does not know about clones — like Delta
    shallow clones, dropping the cloned source version breaks the
    clone, whose reads then fail loudly on the missing files.

    ``version`` clones a time-travel snapshot (default: the source
    head).  Partitioned sources cannot be carried by reference
    (directory columns don't resolve across roots — the file-reuse
    invariant) and clone as a full rewrite preserving their
    ``partition_by``.  ``dst`` must not already be a versioned table;
    vacuumed source versions raise.

    Returns ``{"version", "source_path", "source_version",
    "files_referenced", "files_rewritten"}``."""
    if latest_version(dst) is not None:
        raise ValueError(
            f"clone_versioned: {dst!r} is already a versioned table")
    head = latest_version(src)
    if head is None:
        raise ValueError(f"versioned table {src!r} has no snapshots")
    if version is None:
        version = head
    m = _read_manifest(src, version)    # raises on unknown version
    src_abs = os.path.abspath(src)
    meta = {"source_path": src_abs, "source_version": version}
    if m.get("partition_by"):
        df = read_version(spark, src, version)   # raises if vacuumed
        v = write_versioned(
            df, dst, _op="clone", extra_meta=meta,
            stats_cols=m.get("stats_cols"),
            partition_by=m["partition_by"],
            bloom_cols=m.get("bloom_cols"),
            bloom_bits=m.get("bloom_bits"),
            bloom_hashes=m.get("bloom_hashes"))
        return {"version": v, "source_path": src_abs,
                "source_version": version, "files_referenced": 0,
                "files_rewritten": m["n_files"]}
    files = _root_files(src, m)
    missing = [f for f in files
               if not os.path.exists(os.path.join(src, f))]
    if missing or len(files) != m["n_files"]:
        raise ValueError(
            f"clone_versioned: snapshot {version} of {src!r} was "
            f"vacuumed ({len(missing) + m['n_files'] - len(files)}"
            f" of {m['n_files']} data files gone) — only retained "
            "versions can be cloned")
    dst_abs = os.path.abspath(dst)
    refs = [os.path.relpath(os.path.join(src_abs, f), dst_abs)
            .replace(os.sep, "/") for f in files]
    def rekey(d: dict) -> dict:
        return {os.path.relpath(os.path.join(src_abs, k), dst_abs)
                .replace(os.sep, "/"): v for k, v in d.items()}

    reuse_stats = rekey(_root_stats(src, m))
    schema = T.StructType.fromJson(json.loads(m["schema_json"]))
    empty = spark.createDataFrame([], schema)
    # Delete vectors are REWRITTEN into the clone's own tree (one
    # delete-sized copy, dv/v=1): the (file-tail, key) entries stay
    # valid — the tail extraction is root-invariant — while keeping
    # the clone independent of the source's dv retention and clear of
    # dv-dir version-number collisions with the clone's own commits.
    dv_df = None
    dv_key = None
    if m.get("dv_dirs"):
        dv_gone = [dvv for dvv in m["dv_dirs"]
                   if not os.path.isdir(_dv_dir(src, dvv))]
        if dv_gone:
            raise ValueError(
                f"clone_versioned: snapshot {version} of {src!r} was "
                f"vacuumed (delete-vector dirs {dv_gone} gone) — only "
                "retained versions can be cloned")
        dv_key = m.get("dv_key")
        dv_df = spark.read.parquet(
            *[_dv_dir(src, dvv) for dvv in m["dv_dirs"]])
    v = write_versioned(
        empty, dst, _op="clone", extra_meta=meta,
        stats_cols=m.get("stats_cols"),
        reuse_files=refs, reuse_stats=reuse_stats,
        bloom_cols=m.get("bloom_cols"),
        bloom_bits=m.get("bloom_bits"),
        bloom_hashes=m.get("bloom_hashes"),
        reuse_blooms=rekey(_root_blooms(src, m)),
        dv_df=dv_df, dv_key=dv_key, _no_data=True)
    return {"version": v, "source_path": src_abs,
            "source_version": version, "files_referenced": len(refs),
            "files_rewritten": 0}


def verify_versioned(path: str, strict: bool = False) -> list[str]:
    """TABLE INTEGRITY CHECK (fsck for the versioned format): walk
    every committed manifest and validate the invariants readers
    depend on — referenced data files exist and match ``n_files``,
    parent links chain back without cycles, the head pointer lands on
    a committed manifest, stats/bloom sidecars parse and key only
    referenced files, delete-vector dirs exist with their key in the
    snapshot schema, change dirs exist where the manifest claims
    them, and crashed-writer leftovers (orphan claims, snap dirs with
    no manifest) are reported.  Pure driver metadata reads — no
    Spark session, no data pages; run it before/after vacuum or as a
    governance cadence job.

    Returns the issue list (empty = healthy); VACUUMED history is
    reported as ``note:`` lines (expected state), real corruption as
    ``error:`` lines.  ``strict=True`` raises on any error."""
    issues: list[str] = []
    committed = versions(path)
    if not committed:
        issues.append(f"error: {path!r} has no committed manifests")
    head = latest_version(path)
    if head is not None and head not in committed:
        issues.append(f"error: head pointer {head} has no manifest")
    seen_parents: dict[int, int | None] = {}
    for v in committed:
        try:
            m = _read_manifest(path, v)
        except ValueError as e:
            issues.append(f"error: manifest {v} unreadable: {e}")
            continue
        parent = m.get("parent")
        seen_parents[v] = parent
        if parent is not None and parent >= v:
            issues.append(
                f"error: manifest {v} parent {parent} not older")
        files = _root_files(path, m)
        missing = [f for f in files
                   if not os.path.exists(os.path.join(path, f))]
        if missing:
            kind = "note" if v != head else "error"
            issues.append(
                f"{kind}: version {v} missing {len(missing)} of "
                f"{len(files)} data files"
                + (" (vacuumed history)" if kind == "note" else ""))
        elif m.get("data_files") is None \
                and len(files) != m["n_files"]:
            kind = "note" if v != head else "error"
            issues.append(
                f"{kind}: version {v} directory holds {len(files)} "
                f"files, manifest says {m['n_files']} "
                f"({m['n_files'] - len(files)} missing)")
        try:
            st = load_file_stats(m)
        except Exception as e:              # malformed sidecar
            issues.append(f"error: version {v} stats sidecar "
                          f"unreadable: {e}")
            st = None
        if st:
            rst = _root_stats(path, m)
            extra = set(rst) - set(files)
            if extra:
                issues.append(
                    f"error: version {v} stats key {sorted(extra)[:3]}"
                    " not in the snapshot's file list")
        try:
            bl = load_file_blooms(m)
        except Exception as e:
            issues.append(f"error: version {v} bloom sidecar "
                          f"unreadable: {e}")
            bl = None
        if bl is not None and m.get("bloom_cols"):
            if not m.get("bloom_bits") or not m.get("bloom_hashes"):
                issues.append(
                    f"error: version {v} has bloom_cols but no "
                    "bloom_bits/bloom_hashes")
        for dvv in (m.get("dv_dirs") or []):
            if not os.path.isdir(_dv_dir(path, dvv)):
                kind = "note" if v != head else "error"
                issues.append(
                    f"{kind}: version {v} references vacuumed "
                    f"delete-vector dir dv/v={dvv}")
        if m.get("dv_dirs"):
            schema = T.StructType.fromJson(json.loads(m["schema_json"]))
            if m.get("dv_key") not in {f.name for f in schema.fields}:
                issues.append(
                    f"error: version {v} dv_key {m.get('dv_key')!r} "
                    "not in the snapshot schema")
        if m.get("changes") and not os.path.isdir(_changes_dir(path, v)):
            issues.append(
                f"note: version {v} change files vacuumed (spans "
                "crossing it fall back to the diff path)")
    # acyclic reachability: the head chain must terminate
    v = head
    hops = 0
    while v is not None and hops <= len(seen_parents) + 1:
        v = seen_parents.get(v)
        hops += 1
    if hops > len(seen_parents) + 1:
        issues.append("error: parent links form a cycle")
    mdir = _manifest_dir(path)
    if os.path.isdir(mdir):
        for n in os.listdir(mdir):
            if n.endswith(".claim") and not n.startswith("head."):
                try:
                    cv = int(n[:-6])
                except ValueError:
                    continue
                if cv not in committed:
                    issues.append(
                        f"note: orphan claim {n} (crashed writer — "
                        "vacuum_versioned reclaims it)")
    snap_root = os.path.join(path, "snap")
    if os.path.isdir(snap_root):
        for d in os.listdir(snap_root):
            if d.startswith("v="):
                try:
                    sv = int(d[2:])
                except ValueError:
                    continue
                if sv not in committed:
                    issues.append(
                        f"note: orphan snapshot dir snap/{d} "
                        "(crashed writer — vacuum reclaims it)")
    errors = [i for i in issues if i.startswith("error:")]
    if strict and errors:
        raise ValueError(
            f"verify_versioned: {path!r} has "
            f"{len(errors)} integrity error(s): " + "; ".join(errors))
    return issues


def vacuum_versioned(path: str, keep_last: int = 2) -> list[int]:
    """Retention GC: drop snapshot DATA older than the newest
    ``keep_last`` versions (manifests are kept — history stays
    listable; a time-travel read of a vacuumed version fails with an
    explicit error).  Also removes orphan claims and orphan snapshot
    dirs from crashed writers — do NOT run vacuum concurrently with
    an in-flight writer (its claim looks orphaned until its manifest
    lands); readers are never affected.  Returns the removed
    versions."""
    import shutil

    if keep_last < 1:
        raise ValueError("vacuum_versioned: keep_last must be >= 1")
    committed = versions(path)
    keep = set(committed[-keep_last:])
    head = latest_version(path)
    if head is not None:
        keep.add(head)
    # files referenced by RETAINED versions: explicit-list (file-
    # reuse) manifests pin individual files — possibly inside a
    # DROPPED version's directory — so removal is reference-counted
    # at file granularity; directory-read manifests pin their whole
    # snap dir.
    referenced: set[str] = set()
    protected_dirs: set[str] = set()
    for v in sorted(keep):
        try:
            m = _read_manifest(path, v)
        except ValueError:
            continue
        if m.get("data_files") is not None:
            referenced |= {
                os.path.normpath(os.path.join(path, f))
                for f in m["data_files"]}
        else:
            protected_dirs.add(_snap_dir(path, v))
    # delete-vector dirs are REFERENCE-COUNTED like reused data
    # files: a retained manifest's dv_dirs may point at sidecars
    # committed by dropped versions (reuse commits inherit the list),
    # so a dv dir survives while ANY retained manifest references it.
    dv_referenced: set[int] = set()
    for v in sorted(keep):
        try:
            m = _read_manifest(path, v)
        except ValueError:
            continue
        dv_referenced |= {int(x) for x in (m.get("dv_dirs") or [])}
    removed = []
    for v in committed:
        if v in keep:
            continue
        snap = _snap_dir(path, v)
        if os.path.isdir(snap) and snap not in protected_dirs:
            for root, _dirs, files in os.walk(snap, topdown=False):
                for name in files:
                    p = os.path.normpath(os.path.join(root, name))
                    if p not in referenced:
                        os.remove(p)
                try:
                    os.rmdir(root)          # prune emptied dirs
                except OSError:
                    pass                    # still holds kept files
            removed.append(v)
        if os.path.isdir(_changes_dir(path, v)):
            # change files follow their snapshot's retention; spans
            # crossing a vacuumed commit fall back to the diff path
            shutil.rmtree(_changes_dir(path, v))
        if v not in dv_referenced and os.path.isdir(_dv_dir(path, v)):
            shutil.rmtree(_dv_dir(path, v))
    # orphans: claims with no manifest, snap dirs with no manifest,
    # and head-transition claims (held only between manifest write
    # and pointer flip — any survivor is a crashed writer's, and it
    # deadlocks every future commit on that parent until removed;
    # safe here because vacuum must not run beside in-flight writers)
    mdir = _manifest_dir(path)
    if os.path.isdir(mdir):
        for n in os.listdir(mdir):
            if not n.endswith(".claim"):
                continue
            if n.startswith("head."):
                os.remove(os.path.join(mdir, n))
                continue
            try:
                v = int(n[:-6])
            except ValueError:
                continue
            if v not in committed:
                os.remove(os.path.join(mdir, n))
                for d in (_snap_dir(path, v), _changes_dir(path, v),
                          _dv_dir(path, v)):
                    if os.path.isdir(d):
                        shutil.rmtree(d)
    return removed


def _stored_chain(path: str, from_version: int,
                  to_version: int) -> tuple[list[int],
                                            T.StructType] | None:
    """Versions (ascending) covering ``(from, to]`` via manifest
    parent links, IF every commit in the span persisted change files
    with one identical schema (nullability-normalized — a literal
    '_change_type' column marks non-null where the merge-derived one
    doesn't) — the precondition for serving the span from stored
    changes.  None ⇒ caller must diff."""
    chain: list[int] = []
    schema: T.StructType | None = None
    v = to_version
    while v != from_version:
        try:
            m = _read_manifest(path, v)
        except ValueError:
            return None
        if not m.get("changes") or \
                not os.path.isdir(_changes_dir(path, v)):
            return None                 # never stored, or vacuumed
        sj = m.get("changes_schema_json")
        raw = T.StructType.fromJson(json.loads(sj))
        norm = T.StructType([T.StructField(f.name, f.dataType, True)
                             for f in raw.fields])
        if schema is None:
            schema = norm
        elif norm != schema:
            return None                 # schema evolved mid-span
        chain.append(v)
        parent = m.get("parent")
        if parent is None or parent < from_version:
            return None
        v = parent
    return list(reversed(chain)), schema


def _net_stored_changes(ev: DataFrame, key: str) -> DataFrame:
    """Collapse per-commit stored change rows (``ev`` carries ``_v``)
    into the NET from→to feed — exactly what the two-snapshot diff
    would emit: a row updated twice nets to one pre/post pair
    (earliest preimage, latest postimage), insert-then-delete and
    update-then-revert net to NOTHING.  Cost: two grouped aggregates
    keyed by ``key`` over the change rows only — O(changes), never
    O(table)."""
    others = [c for c in ev.columns if c not in ("_change_type", "_v",
                                                 key)]
    t = F.col("_change_type")
    norm = ev.select(
        F.col(key), F.col("_v"),
        F.when(t == "insert", "insert").when(t == "delete", "delete")
         .otherwise("update").alias("_kind"),
        F.when(t.isin("delete", "update_preimage"),
               F.struct(*others)).alias("_pre"),
        F.when(t.isin("insert", "update_postimage"),
               F.struct(*others)).alias("_post"),
    )
    # one record per (key, commit): update rows pair up pre+post
    perv = norm.groupBy(key, "_v").agg(
        F.max("_kind").alias("_kind"),          # single value per group
        F.first("_pre", ignorenulls=True).alias("_pre"),
        F.first("_post", ignorenulls=True).alias("_post"))
    net = perv.groupBy(key).agg(
        F.min_by(F.struct(F.col("_kind"), F.col("_pre")), F.col("_v"))
        .alias("_first"),
        F.max_by(F.struct(F.col("_kind"), F.col("_post")), F.col("_v"))
        .alias("_last"))
    old_p = F.when(F.col("_first._kind") != "insert",
                   F.col("_first._pre"))        # else: absent before
    new_p = F.when(F.col("_last._kind") != "delete",
                   F.col("_last._post"))        # else: absent after
    staged = net.select(F.col(key), old_p.alias("_old"),
                        new_p.alias("_new"))

    def mk(ct: str, p):
        return F.struct(F.lit(ct).alias("_change_type"), p.alias("p"))

    fpo = F.md5(F.to_json(F.col("_old")))
    fpn = F.md5(F.to_json(F.col("_new")))
    change = F.when(
        F.col("_old").isNull() & F.col("_new").isNull(), F.array()
    ).when(
        F.col("_old").isNull(), F.array(mk("insert", F.col("_new")))
    ).when(
        F.col("_new").isNull(), F.array(mk("delete", F.col("_old")))
    ).when(
        fpo != fpn,
        F.array(mk("update_preimage", F.col("_old")),
                mk("update_postimage", F.col("_new")))
    ).otherwise(F.array())
    return (staged.select(F.col(key), F.explode(change).alias("c"))
            .select(F.col("c._change_type").alias("_change_type"),
                    F.col(key), "c.p.*"))


def read_changes(spark: SparkSession, path: str, key: str,
                 from_version: int,
                 to_version: int | None = None,
                 validate_keys: bool = False,
                 use_stored: bool = True) -> DataFrame:
    """Change-data feed between two snapshots — the READ half of the
    CDC story (``streaming.versioned_merge_sink`` is the write half):
    every row gets ``_change_type`` ∈ {'insert', 'delete',
    'update_preimage', 'update_postimage'} with Delta
    readChangeFeed's semantics, COMPUTED as a snapshot key-diff
    rather than read from stored change files (this table format
    stores full snapshots, so the diff is always derivable — no
    writer opt-in, no change-file retention).

    Unchanged rows emit NOTHING: change detection compares a
    canonical JSON fingerprint of all common non-key columns
    (null-safe, engine-internal — never hash-gated itself), so an
    update that rewrites a row with identical content is correctly
    silent.  Updates emit BOTH images, preimage carrying the FROM
    side's payload.  Caveat: MAP columns serialize in stored key
    order, so a rewrite that only reorders map keys reads as an
    update (false-positive, never a false-negative) — normalize map
    key order upstream if that matters.

    Scale shape: two snapshot scans and ONE full-outer shuffle join
    keyed by ``key``; the ≤2 change rows per key come from a single
    explode over the joined row — no second pass, no union of
    re-scans.  At 100 TB this is the standard diff-based CDF; if the
    table is bucketed/clustered on ``key`` the join co-locates.

    Columns present on only one side (schema evolution between the
    snapshots) are excluded from change DETECTION but kept in the
    payload of rows from their own side (absent = NULL on the other
    side's rows).

    PRECONDITION: ``key`` must be UNIQUE within each snapshot.  A
    duplicated key fans out in the full-outer join and the feed emits
    a cross-product of spurious update pairs — silently wrong, and
    every downstream consumer (``consume_changes``,
    ``maintain_continuous_rollup``) inherits the corruption.  The
    format cannot enforce this at write time (it stores arbitrary
    frames); pass ``validate_keys=True`` to pay one counting
    aggregate per side and FAIL LOUDLY on a non-keyed table instead
    (ADVICE r8).

    STORED fast path (``use_stored``, default on): when every commit
    in the span persisted its change files
    (``merge_versioned(store_changes=True)`` /
    ``write_versioned(changes_df=...)``) under one schema, the feed
    is served from those files — O(changes) scan + a per-key netting
    aggregate for multi-commit spans — instead of the O(table)
    two-snapshot diff.  Missing/vacuumed change files or a mid-span
    schema change fall back to the diff automatically (the
    writer-independent path; results are identical by construction
    and hash-gated by ``rel_change_feed_stored``).

    ``validate_keys=True`` FORCES the diff path even when stored
    change files cover the span (deliberate, pinned by pytest): the
    uniqueness check is a property of the SNAPSHOTS, which the stored
    files bypass — paying the O(table) scans is exactly what asking
    for validation means.  Run an unvalidated stored read afterwards
    if you want both the check and the fast path on later spans."""
    if to_version is None:
        to_version = latest_version(path)
    if to_version is None or from_version == to_version:
        raise ValueError(
            f"read_changes: need two distinct committed versions "
            f"(from={from_version}, to={to_version})")
    if use_stored and not validate_keys:
        span = _stored_chain(path, from_version, to_version)
        if span is not None:
            vers, schema = span
            if key not in schema.fieldNames():
                raise ValueError(
                    f"read_changes: key {key!r} missing from the "
                    f"stored change schema")
            frames = [
                spark.read.schema(schema)
                .parquet(_changes_dir(path, v))
                for v in vers
            ]
            if len(vers) == 1:
                return frames[0]
            ev = frames[0].withColumn("_v", F.lit(vers[0]))
            for v, f in zip(vers[1:], frames[1:]):
                ev = ev.unionByName(f.withColumn("_v", F.lit(v)))
            return _net_stored_changes(ev, key)
    old = read_version(spark, path, from_version).alias("o")
    new = read_version(spark, path, to_version).alias("n")
    if key not in old.columns or key not in new.columns:
        raise ValueError(f"read_changes: key {key!r} missing from a "
                         f"snapshot schema")
    if validate_keys:
        for side, ver in ((old, from_version), (new, to_version)):
            dup = (side.groupBy(key).count()
                   .where(F.col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    f"read_changes: key {key!r} is not unique in "
                    f"snapshot {ver} of {path!r} (e.g. "
                    f"{dup[0][key]!r} × {dup[0]['count']}) — the "
                    "change feed requires a keyed table")
    common = sorted(set(old.columns) & set(new.columns) - {key})
    all_cols = [key] + sorted((set(old.columns) | set(new.columns))
                              - {key})

    def fp(side: str, cols: list[str]):
        return F.md5(F.to_json(F.struct(
            *[F.col(f"{side}.{c}") for c in cols])))

    def payload(side: str, has: set):
        fields = [(F.col(f"{side}.{c}") if c in has else F.lit(None))
                  .alias(c) for c in all_cols]
        return F.struct(*fields)

    o_has, n_has = set(old.columns), set(new.columns)
    joined = old.join(new, F.col(f"o.{key}") == F.col(f"n.{key}"),
                      "full_outer")
    change = F.when(
        F.col(f"o.{key}").isNull(),
        F.array(F.struct(F.lit("insert").alias("_change_type"),
                         payload("n", n_has).alias("p")))
    ).when(
        F.col(f"n.{key}").isNull(),
        F.array(F.struct(F.lit("delete").alias("_change_type"),
                         payload("o", o_has).alias("p")))
    ).when(
        fp("o", common) != fp("n", common),
        F.array(
            F.struct(F.lit("update_preimage").alias("_change_type"),
                     payload("o", o_has).alias("p")),
            F.struct(F.lit("update_postimage").alias("_change_type"),
                     payload("n", n_has).alias("p")))
    ).otherwise(F.array())
    return (joined.select(F.explode(change).alias("c"))
            .select(F.col("c._change_type").alias("_change_type"),
                    "c.p.*"))


def read_changes_per_commit(spark: SparkSession, path: str, key: str,
                            from_version: int,
                            to_version: int | None = None
                            ) -> DataFrame | None:
    """PER-COMMIT change events for the span ``(from_version,
    to_version]`` — one row per stored change image tagged with its
    ``_commit_version`` — served as ONE multi-path scan over the
    span's stored change directories, with the commit version derived
    from each file's ``changes/v=N/`` path segment.

    This is the bounded-plan twin of the per-pair
    :func:`read_changes` loop that SCD2 consumers run: a type-2
    rebuild must keep INTERMEDIATE states (netting them away is
    exactly what it cannot do), so it reads the span commit by
    commit — but a union of one ``read_changes`` branch per commit
    grows the plan linearly with history (the SCALE.md §25
    giant-union class: 80k-char plans at 120 commits, planning time
    dominating).  One scan node covers any span length.

    Returns None when any commit in the span lacks stored change
    files or the change schema evolved mid-span (callers fall back
    to the per-pair loop, which handles diffs and schema drift);
    raises if ``key`` is missing from the stored schema.  Rows are
    exactly the concatenation of the per-pair stored reads: single
    commits are never netted against each other."""
    if to_version is None:
        to_version = latest_version(path)
    if to_version is None or to_version <= from_version:
        return None
    span = _stored_chain(path, from_version, to_version)
    if span is None:
        return None
    vers, schema = span
    # the per-pair loop this replaces pairs MANIFESTED versions while
    # the chain follows parent links — on a healthy table they are
    # identical; on a table with orphaned manifests (a lost head
    # race) defer to the loop rather than silently diverge
    if vers != [v for v in versions(path)
                if from_version < v <= to_version]:
        return None
    if key not in schema.fieldNames():
        raise ValueError(
            f"read_changes_per_commit: key {key!r} missing from the "
            f"stored change schema")
    # one scan over every feed dir; the version comes from the
    # path's own `changes/v=N/` segment (input_file_name is legal
    # here — single-source plan; the segment never needs
    # percent-decoding: digits and '=' pass through URI encoding)
    ev = spark.read.schema(schema).parquet(
        *[_changes_dir(path, v) for v in vers])
    return ev.withColumn(
        "_commit_version",
        F.regexp_extract(F.input_file_name(),
                         r"/changes/v=(\d+)/", 1).cast("long"))


def read_cursor(cursor_path: str) -> int | None:
    """Last version a :func:`consume_changes` consumer has fully
    processed (None = never consumed)."""
    try:
        with open(cursor_path) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def advance_cursor(cursor_path: str, version: int) -> None:
    """Atomically record ``version`` as fully processed.  Never moves
    backwards (a stale writer cannot rewind a concurrent consumer's
    progress)."""
    cur = read_cursor(cursor_path)
    if cur is not None and version < cur:
        raise ValueError(
            f"cursor {cursor_path!r} is at {cur}; refusing to rewind "
            f"to {version}")
    os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)
    tmp = f"{cursor_path}.tmp.{version}"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, cursor_path)


def consume_changes(spark: SparkSession, path: str, key: str,
                    cursor_path: str, bootstrap: str = "snapshot"):
    """Incremental CDC consumption — the micro-batch pull loop over
    :func:`read_changes` (the pattern Structured Streaming's
    replayable-source contract names: re-reading the same span is
    always possible, so the consumer advances its cursor only AFTER
    its own side effects land, and a crash between processing and
    :func:`advance_cursor` replays the span — at-least-once, made
    exactly-once by an idempotent downstream like
    ``merge_versioned`` or the batch-id-guarded streaming sinks).

    Returns ``(changes_df | None, to_version, ack)``: ``None`` when
    the cursor is already at the table head (nothing to do), else the
    change feed from the cursor to the current head, plus ``ack()`` —
    call it after your processing commits to advance the cursor to
    ``to_version``.

    First consumption (no cursor file): ``bootstrap='snapshot'``
    (default) returns the entire HEAD snapshot tagged ``'insert'`` —
    the "give me current state, then deltas" contract a fresh
    consumer needs; ``bootstrap='diff'`` baselines at the oldest
    RETAINED snapshot instead (its contents are treated as already
    consumed — the resubscribe-after-vacuum case).

    Scale note: the span diff costs the same one full-outer join no
    matter how many commits it covers — a consumer that falls behind
    pays ONE diff over the net change, not one per missed version
    (the advantage of diff-derived CDC over stored change files)."""
    head = latest_version(path)
    if head is None:
        raise ValueError(f"versioned table {path!r} has no snapshots")
    cur = read_cursor(cursor_path)
    if cur is None:
        if bootstrap == "snapshot":
            snap = read_version(spark, path, head)
            cols = [key] + sorted(set(snap.columns) - {key})
            out = snap.select(
                F.lit("insert").alias("_change_type"), *cols)
            return out, head, lambda: advance_cursor(cursor_path, head)
        if bootstrap != "diff":
            raise ValueError(
                f"consume_changes: bootstrap must be 'snapshot' or "
                f"'diff', got {bootstrap!r}")
        retained = [v for v in versions(path)
                    if os.path.isdir(_snap_dir(path, v))]
        cur = min(retained)
    if cur >= head:
        return None, head, lambda: None
    changes = read_changes(spark, path, key, cur, head)
    return changes, head, lambda: advance_cursor(cursor_path, head)


class ContractViolation(RuntimeError):
    """The input batch failed the table's data contract — nothing was
    committed."""


def write_validated(df: DataFrame, path: str, schema,
                    max_reject_rate: float = 0.0,
                    dead_path: str | None = None,
                    expected_parent: int | None = None,
                    stats_cols: list[str] | None = None) -> dict:
    """Contract-gated commit — the validation layer wired into the
    table format (Delta CHECK-constraint semantics, but with the full
    Validator chain vocabulary): validate ``df`` against ``schema``
    (any object with ``.validate(df)`` returning clean/rejected
    frames, i.e. :class:`~filters_spark.schema.ValidationSchema`),
    commit ONLY the clean rows as the next snapshot, quarantine
    rejects to ``dead_path`` (original values + error payloads — the
    replayable dead-letter contract), and REFUSE the whole commit
    when the reject rate exceeds ``max_reject_rate`` — the circuit
    breaker that keeps one poisoned upstream batch from becoming a
    committed mostly-empty snapshot that downstream consumers (and
    the change feed) then observe as a mass delete.

    On refusal rejects are still written to ``dead_path`` (if given)
    for diagnosis, the table head does NOT move, and
    :class:`ContractViolation` carries the measured rate.

    The contract outcome is recorded in the manifest
    (``extra_meta["contract"]``), so table history doubles as a data-
    quality audit log.

    Cost shape: ONE counting aggregate over the validated frame
    (count + reject-flag sum — no per-field rollup), then the clean
    write and the (usually tiny) dead-letter write; the validation
    itself is the usual single staged projection riding both scans.

    Returns ``{"version", "n_input", "n_committed", "n_rejected",
    "reject_rate"}``."""
    res = schema.validate(df)
    from ..schema import ERRORS_COL

    counts = res.validated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.size(F.col(ERRORS_COL)) > 0).cast("long")).alias("bad"),
    ).first()
    n_input = counts["n"] or 0
    n_rejected = int(counts["bad"] or 0)
    rate = (n_rejected / n_input) if n_input else 0.0
    if n_input and rate > max_reject_rate:
        if dead_path is not None:
            res.write_dead_letter(dead_path)
        raise ContractViolation(
            f"table {path!r}: reject rate {rate:.4f} exceeds the "
            f"contract's {max_reject_rate:.4f} "
            f"({n_rejected}/{n_input} rows) — commit refused"
            + (f"; rejects quarantined to {dead_path!r}"
               if dead_path is not None else ""))
    if dead_path is not None:
        # BEFORE the head flip (ADVICE r8): a crash between quarantine
        # and commit leaves an uncommitted table plus extra dead
        # letters — benign duplicates under the sink's at-least-once
        # contract — whereas the reverse order could commit a manifest
        # claiming n_rejected rows whose quarantine never landed.
        # Written even when zero rows reject: the quarantine location
        # must always read back (as empty), or every downstream audit
        # needs an existence branch — the tar-shard empty-corpus rule.
        res.write_dead_letter(dead_path)
    version = write_versioned(
        res.clean, path, expected_parent=expected_parent,
        _op="validated_write", stats_cols=stats_cols,
        extra_meta={"contract": {
            "n_input": int(n_input),
            "n_rejected": n_rejected,
            "reject_rate": rate,
            "max_reject_rate": max_reject_rate,
        }})
    return {"version": version, "n_input": int(n_input),
            "n_committed": int(n_input) - n_rejected,
            "n_rejected": n_rejected, "reject_rate": rate}


def optimize_versioned(spark: SparkSession, path: str,
                       zorder: list[str] | None = None,
                       n_files: int = 32, bits: int = 8,
                       stats_cols: list[str] | None = None,
                       partition_by: list[str] | None = None,
                       min_file_bytes: int | None = None) -> int:
    """Table-maintenance OPTIMIZE (Delta OPTIMIZE [ZORDER BY]'s job):
    rewrite the HEAD snapshot's files — plain small-file compaction
    into ``n_files`` (round-robin), or with ``zorder`` a multi-column
    Z-order re-cluster (range-partition the Morton key + sort within
    files, `functions.layout.zorder_key`) so every file's min/max is
    tight on EVERY keyed column — committed as the next snapshot with
    ``op='optimize'`` and manifest stats recorded for the clustered
    columns (``stats_cols`` defaults to ``zorder``), which is what
    arms :func:`read_version`'s ``where=`` file skipping.

    DATA-PRESERVING by contract: the commit goes through the same CAS
    head transition as any write (a concurrent writer wins, the
    optimize loses — maintenance never clobbers data), old snapshots
    stay readable until vacuum, and :func:`read_changes` across the
    optimize commit is EMPTY — the change feed is layout-blind, so
    downstream CDC consumers see nothing (pytest-pinned; the skipping
    effectiveness is hash-gated by ``rel_optimize_zorder``).

    Cost: one full read + one shuffle (the range partition) + one
    write — the standard maintenance pass; run it on cadence or when
    small-file counts degrade scan parallelism.

    ``min_file_bytes`` makes the compaction SELECTIVE (Delta
    OPTIMIZE's minFileSize behavior, on the file-reuse machinery):
    only files SMALLER than the threshold are read and bin-packed
    into ``n_files``; every already-right-sized file is carried by
    REFERENCE with its stats and bloom entries intact — maintenance
    on a 100 TB table touches the small-file tail, not the table.
    No-op (returns the current head, no commit) when nothing is
    below the threshold; flat layouts only (partitioned snapshots
    compact via the full rewrite — pass no threshold); mutually
    exclusive with ``zorder`` (re-clustering rewrites everything by
    design)."""
    head = latest_version(path)
    if head is None:
        raise ValueError(f"versioned table {path!r} has no snapshots")
    if min_file_bytes is not None:
        if zorder:
            raise ValueError(
                "optimize_versioned: min_file_bytes is the selective "
                "compaction mode — zorder re-clusters everything; "
                "pass one or the other")
        m = _read_manifest(path, head)
        if m.get("partition_by"):
            raise ValueError(
                "optimize_versioned: selective compaction needs a "
                "flat layout (file-reuse invariant) — partitioned "
                "snapshots compact via the full rewrite")
        files = _root_files(path, m)
        sizes = {f: os.path.getsize(os.path.join(path, f))
                 for f in files}          # driver metadata loop
        small = [f for f in files if sizes[f] < min_file_bytes]
        if not small:
            return head                   # nothing to compact: no-op
        big = [f for f in files if sizes[f] >= min_file_bytes]
        schema = T.StructType.fromJson(json.loads(m["schema_json"]))
        # the compacted slice is DV-applied (deleted rows FOLD OUT of
        # the rewrite — compacting them back in would resurrect
        # them), and the live vector set is re-filtered to entries
        # binding to still-carried files and rewritten as ONE fresh
        # sidecar, so dv history compacts along with the data.
        packed = (apply_delete_vectors(
            spark, path, m, spark.read.schema(schema).parquet(
                *[os.path.join(path, f) for f in small]))
            .repartition(min(n_files, len(small))))
        dv_df = None
        dv_key = None
        dv_dirs_override = None
        if m.get("dv_dirs"):
            dv_key = m.get("dv_key")
            dv_dirs_override = []
            live = (spark.read.parquet(
                *[_dv_dir(path, dvv) for dvv in m["dv_dirs"]])
                .where(F.col("_file").isin(big)))
            if live.limit(1).count():
                dv_df = live
        stats = _root_stats(path, m)
        return write_versioned(
            packed, path, expected_parent=head, _op="optimize",
            extra_meta={"compacted": len(small), "carried": len(big)},
            stats_cols=stats_cols if stats_cols is not None
            else m.get("stats_cols"),
            reuse_files=big,
            reuse_stats={f: stats[f] for f in big if f in stats},
            dv_df=dv_df, dv_key=dv_key, dv_dirs=dv_dirs_override)
    df = read_version(spark, path, head)
    if zorder:
        from ..functions.layout import zorder_key

        key, stats = zorder_key(df, zorder, bits)
        out = (df.crossJoin(F.broadcast(stats)).withColumn("_zkey", key)
               .repartitionByRange(n_files, "_zkey")
               .sortWithinPartitions("_zkey")
               .drop("_zkey", *[f"_{p}_{c}" for p in ("lo", "hi")
                                for c in zorder]))
        stats_cols = stats_cols if stats_cols is not None else list(zorder)
    else:
        out = df.repartition(n_files)
    # partition_by re-lays the snapshot's directory structure (or
    # establishes one on a previously flat table) — OPTIMIZE is the
    # natural place to change layout since it rewrites anyway; None
    # writes flat regardless of the prior snapshot's layout.
    return write_versioned(out, path, expected_parent=head,
                           _op="optimize", stats_cols=stats_cols,
                           partition_by=partition_by)
