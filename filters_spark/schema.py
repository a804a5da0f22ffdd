"""ValidationSchema + ValidationResult — the engine's top-level API.

Maps the reference surface (SURVEY.md §3):

* ``ValidationSchema``  ≈ ``filters/complex.py::FilterMapper`` — a dict
  of column → chain, compiled into ONE ``select`` projection.
* ``ValidationResult``  ≈ ``filters/base.py::FilterRunner`` +
  ``handlers.py::MemoryHandler`` — exposes ``clean`` / ``rejected`` /
  ``errors_long`` / ``error_code_counts`` / ``is_valid``.
* ``strict=True``       ≈ ``handlers.py::ExceptionHandler`` — raise
  :class:`FilterError` on the first invalid row.

Schema-static semantics (a deliberate, documented improvement over the
reference — SURVEY.md §3 entry point 3): ``allow_extra_keys`` /
``allow_missing_keys`` are checked once at plan time against
``df.columns`` instead of per row.  Per-row dynamics survive only
inside JSON payloads (Variant / ``from_json`` null carries the error).

Scale (100 TB): validation is a single narrow projection — no shuffle,
no Python, fused into whole-stage codegen on top of the scan.  The
clean/rejected split is two filters over the same cached plan;
Catalyst prunes the error machinery from the clean branch when only
cleaned columns are selected.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .core import ERROR_DDL, FilterError, Validator, ValidatorLike, coerce, null_error

__all__ = ["ValidationSchema", "ValidationResult", "SchemaError"]

ERRORS_COL = "_errors"
RAW_COL = "_raw"


class SchemaError(Exception):
    """Plan-time schema violation (missing/extra/ill-typed column) —
    the static analog of the reference's ``missing_key`` /
    ``unexpected_key`` per-row errors."""


class ValidationSchema:
    def __init__(self, filter_map: dict[str, ValidatorLike],
                 allow_extra_keys: bool = True,
                 allow_missing_keys: bool = True):
        self.filter_map: dict[str, Validator] = {
            k: coerce(v) for k, v in filter_map.items()
        }
        self.allow_extra_keys = allow_extra_keys
        self.allow_missing_keys = allow_missing_keys
        # compiled-stage cache, keyed by input schema fingerprint:
        # Column objects are unbound expression trees, so the staged
        # select lists are reusable verbatim across DataFrames with
        # the same schema — re-validating per batch/partition/sf-dir
        # skips the whole expression build (~0.6 s of driver-side
        # plan construction for the 6-field flagship)
        self._stage_cache: dict[tuple, tuple] = {}

    # -- plan-time checks -------------------------------------------------
    def _check_columns(self, df: DataFrame) -> tuple[list[str], list[str]]:
        declared = list(self.filter_map)
        present = set(df.columns)
        missing = [c for c in declared if c not in present]
        extra = [c for c in df.columns if c not in self.filter_map]
        if missing and not self.allow_missing_keys:
            raise SchemaError(f"missing_key: {missing}")
        if extra and not self.allow_extra_keys:
            raise SchemaError(f"unexpected_key: {extra}")
        # The staged projection emits `_raw_<field>` copies (and
        # apply(with_raw=True) emits RAW_COL): a passthrough column
        # already using a reserved name would collide into duplicate /
        # ambiguous columns deep in the plan — catch it here with the
        # other plan-time checks instead.
        reserved = {f"_raw_{n}" for n in declared} | {RAW_COL}
        clashes = sorted(present & reserved)
        if clashes:
            raise SchemaError(
                f"reserved_column_name: {clashes} — `_raw_<field>` and "
                f"{RAW_COL!r} are reserved for the validation plan's "
                "raw-value copies; rename the input column(s)"
            )
        return missing, extra

    # -- compilation ------------------------------------------------------
    def _staged(self, df: DataFrame) -> tuple[DataFrame, list[str], list[str]]:
        """Compile the schema into STAGED projections: one narrow
        select per chain depth, with per-field ``(_v_x, _e_x)``
        intermediate columns.  Returns (staged frame, declared field
        names, passthrough column names); ``_assemble`` adds the final
        select producing cleaned columns + the ``_errors`` array
        (first error per field — MemoryHandler's accumulation per row).

        Why staged, not one giant expression: threading (value, err)
        through a chain as nested expressions duplicates each step's
        subtree in the next (the err tree appears inside the value
        tree and vice versa), so analysis/codegen cost grows
        exponentially with chain depth — measured ~3 s of pure
        planning for a 6-field schema.  Named intermediates keep every
        stage's trees O(1); Catalyst's CollapseProject deliberately
        does NOT re-inline non-cheap aliases referenced twice, and
        whole-stage codegen still fuses all stages into one pass with
        locals.  Zero shuffles either way.
        """
        from .core import Chain

        cache_key = tuple(
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        )
        hit = self._stage_cache.get(cache_key)
        if hit is not None:
            selects, fields, extra = hit
            cur = df
            for sel in selects:
                cur = cur.select(*sel)
            return cur, list(fields), list(extra)

        missing, extra = self._check_columns(df)
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        steps_by_field: dict[str, list] = {}
        for name, chain in self.filter_map.items():
            if name in dtypes:
                dt = dtypes[name]
                expected = chain.expected_types
                if expected and dt.typeName() not in expected:
                    raise SchemaError(
                        f"wrong_type: column {name!r} is {dt.simpleString()}, "
                        f"validator expects {expected}"
                    )
                # Plan-time specialization: e.g. Int() over BIGINT
                # becomes a bare cast — same semantics, cheaper plan.
                chain = chain.specialize(dt)
            steps_by_field[name] = (
                list(chain.steps) if isinstance(chain, Chain)
                else list(chain.substeps())
            )

        # Raw copies ride along unreferenced — Catalyst prunes them
        # from every plan that doesn't use rejected_raw, so carrying
        # them is free except for the dead-letter path that needs them.
        passthrough = [F.col(c) for c in extra] + [
            F.col(f"_raw_{n}") for n in steps_by_field if n not in missing
        ]
        # Stage 0: bind sources (missing declared column → NULL runs
        # through the chain; only Required then rejects — reference
        # missing-key semantics).
        selects: list[list[Column]] = [[
            *[
                (F.col(n) if n not in missing else F.lit(None)).alias(f"_v_{n}")
                for n in steps_by_field
            ],
            *[null_error().alias(f"_e_{n}") for n in steps_by_field],
            *[F.col(c) for c in extra],
            *[F.col(n).alias(f"_raw_{n}")
              for n in steps_by_field if n not in missing],
        ]]
        depth = max((len(s) for s in steps_by_field.values()), default=0)
        for i in range(depth):
            stage: list[Column] = []
            for n, steps in steps_by_field.items():
                v: Column = F.col(f"_v_{n}")
                e: Column = F.col(f"_e_{n}")
                if i < len(steps):
                    v, e = steps[i].build(v, e, n)
                stage.append(v.alias(f"_v_{n}"))
                stage.append(e.alias(f"_e_{n}"))
            selects.append([*stage, *passthrough])
        fields = list(steps_by_field)
        self._stage_cache[cache_key] = (selects, fields, extra)
        cur = df
        for sel in selects:
            cur = cur.select(*sel)
        return cur, list(fields), list(extra)

    def apply(self, df: DataFrame, with_raw: bool = False) -> DataFrame:
        """Compile to the final validated DataFrame: cleaned columns +
        the ``_errors`` array.  See :meth:`_staged` for the staging
        rationale; :meth:`validate` keeps a handle on the staged frame
        so the clean/rejected split can filter on the cheap per-field
        error flags instead of the assembled array.

        ``with_raw=True`` appends a ``_raw`` struct holding the
        ORIGINAL value of every validated column — for pipelines whose
        sink must quarantine replayable originals (streaming dead
        letters: a stream sees the assembled frame only, so the raws
        must travel inside it).  Declared-but-missing columns are
        absent from the struct."""
        cur, fields, extra = self._staged(df)
        extra_cols = None
        if with_raw:
            raw_names = [n for n in fields if f"_raw_{n}" in cur.columns]
            extra_cols = [F.struct(
                *[F.col(f"_raw_{n}").alias(n) for n in raw_names]
            ).alias(RAW_COL)]
        return _assemble(cur, fields, extra, extra_cols)

    def validate(self, df: DataFrame, strict: bool = False) -> "ValidationResult":
        cur, fields, extra = self._staged(df)
        result = ValidationResult(_assemble(cur, fields, extra),
                                  pre=cur, fields=fields, extra=extra)
        if strict:
            result.raise_on_error()
        return result

    def __or__(self, other: "ValidationSchema") -> "ValidationSchema":
        merged = dict(self.filter_map)
        for k, v in other.filter_map.items():
            merged[k] = (merged[k] | v) if k in merged else v
        return ValidationSchema(merged, self.allow_extra_keys, self.allow_missing_keys)


def _err_array(fields: "tuple[str, ...]") -> Column:
    """The null-free ``_errors`` array, by ``concat`` of 0/1-element
    arrays — NOT array_compact/filter: those are higher-order
    functions, CodegenFallback in Spark, and one interpreted
    expression in the errors column knocks the whole projection AND
    every downstream ``size(_errors)`` filter out of whole-stage
    codegen (measured: clean-split count 2.1 s → 0.4 s at sf0.1)."""
    empty = F.array().cast(f"array<{ERROR_DDL}>")
    errs = [F.col(f"_e_{n}") for n in fields]
    return (
        F.concat(*[F.when(e.isNotNull(), F.array(e)).otherwise(empty) for e in errs])
        if errs else empty
    )


@lru_cache(maxsize=256)
def _assemble_cols(fields: "tuple[str, ...]",
                   extra: "tuple[str, ...]") -> "tuple[Column, ...]":
    """Final-select column list (name-based → reusable across any
    DataFrame carrying the staged columns; cached because building
    these whens is ~100 py4j round trips per validate call)."""
    return (
        *[F.when(F.col(f"_e_{n}").isNull(), F.col(f"_v_{n}")).alias(n)
          for n in fields],
        *[F.col(c) for c in extra],
        _err_array(fields).alias(ERRORS_COL),
    )


def _assemble(cur: DataFrame, fields: list[str], extra: list[str],
              extra_cols: "list[Column] | None" = None) -> DataFrame:
    """Final select over the staged frame: cleaned columns (invalid →
    None — the single end-of-chain nulling point) + the ``_errors``
    array (see :func:`_err_array` for why concat-of-arrays)."""
    cols = list(_assemble_cols(tuple(fields), tuple(extra)))
    if extra_cols:
        cols = cols[:-1] + list(extra_cols) + cols[-1:]
    return cur.select(*cols)


class ValidationResult:
    """Lazy handle over the validated DataFrame (all properties are
    plans, not materializations).

    When constructed by :meth:`ValidationSchema.validate` it also
    holds the STAGED frame (per-field ``_e_x`` error flags, no
    assembled array).  ``clean``/``rejected`` then filter on the flag
    conjunction — a tiny codegen'd predicate — instead of
    ``size(_errors)``, whose assembled-array expression would be
    compiled into the Filter a second time (measured: flagship cold
    7.1 s → 4.6 s, the errors machinery pruned entirely from the
    clean branch)."""

    def __init__(self, validated: DataFrame, pre: DataFrame | None = None,
                 fields: list[str] | None = None,
                 extra: list[str] | None = None):
        self.validated = validated
        self._pre = pre
        self._fields = fields
        self._extra = extra

    def _flags(self) -> Column:
        ok = F.lit(True)
        for n in self._fields:
            ok = ok & F.col(f"_e_{n}").isNull()
        return ok

    @property
    def clean(self) -> DataFrame:
        if self._pre is None:
            return self.validated.where(F.size(F.col(ERRORS_COL)) == 0).drop(ERRORS_COL)
        # all error flags null → values are final; no nulling, no array
        return self._pre.where(self._flags()).select(
            *[F.col(f"_v_{n}").alias(n) for n in self._fields],
            *[F.col(c) for c in self._extra],
        )

    @property
    def rejected(self) -> DataFrame:
        if self._pre is None:
            return self.validated.where(F.size(F.col(ERRORS_COL)) > 0)
        # array assembly runs only over the (usually small) reject set
        return _assemble(self._pre.where(~self._flags()), self._fields, self._extra)

    @property
    def rejected_raw(self) -> DataFrame:
        """Rejected rows with their ORIGINAL input values + the error
        payload — what a dead-letter table must store: the chain nulls
        a failed field's transformed value (its type may not even
        admit the bad input), so :attr:`rejected` alone cannot be
        replayed after a schema fix.  The raw copies ride the staged
        projection unreferenced (column-pruned everywhere else), so
        this costs nothing until used.  A column the input never had
        (declared-but-missing) comes back NULL."""
        if self._pre is None:
            raise ValueError(
                "rejected_raw needs the staged frame; construct the result "
                "via ValidationSchema.validate()"
            )
        pre = self._pre.where(~self._flags())
        raw_cols = set(pre.columns)
        return pre.select(
            *[
                (F.col(f"_raw_{n}") if f"_raw_{n}" in raw_cols
                 else F.lit(None)).alias(n)
                for n in self._fields
            ],
            *[F.col(c) for c in self._extra],
            _err_array(tuple(self._fields)).alias(ERRORS_COL),
        )

    @property
    def clean_raw(self) -> DataFrame:
        """Clean rows with their ORIGINAL input values + an EMPTY
        error array — schema-identical to :attr:`rejected_raw`, so
        both halves of a batch can land in ONE quarantine table: a
        chain that coerces a field's type would otherwise write the
        transformed type beside the raw dead letters and leave the
        directory unreadable (conflicting parquet column types —
        ADVICE r8).  This is what a circuit-breaker 'skip the whole
        batch' path must persist."""
        if self._pre is None:
            raise ValueError(
                "clean_raw needs the staged frame; construct the result "
                "via ValidationSchema.validate()"
            )
        pre = self._pre.where(self._flags())
        raw_cols = set(pre.columns)
        return pre.select(
            *[
                (F.col(f"_raw_{n}") if f"_raw_{n}" in raw_cols
                 else F.lit(None)).alias(n)
                for n in self._fields
            ],
            *[F.col(c) for c in self._extra],
            F.array().cast(f"array<{ERROR_DDL}>").alias(ERRORS_COL),
        )

    @property
    def errors_long(self) -> DataFrame:
        """One row per (row, field, code) — the exploded MemoryHandler
        dict."""
        return (
            self.validated.where(F.size(F.col(ERRORS_COL)) > 0)
            .select(F.explode(F.col(ERRORS_COL)).alias("e"))
            .select("e.field", "e.code", "e.filter")
        )

    def error_code_counts(self) -> DataFrame:
        """Rollup ``(field, code) -> count`` — map-side partial agg
        then a tiny shuffle on (field, code): cardinality is bounded by
        schema size × code vocabulary, never by data size."""
        return self.errors_long.groupBy("field", "code").count()

    def is_valid(self) -> bool:
        """True iff no row has errors.  Uses limit(1) short-circuit —
        stops scanning at the first invalid row."""
        return self.rejected.limit(1).count() == 0

    def raise_on_error(self) -> None:
        """ExceptionHandler semantics: raise on the first invalid row."""
        row = self.rejected.select(F.element_at(F.col(ERRORS_COL), 1).alias("e")).head(1)
        if row:
            e = row[0]["e"]
            raise FilterError(
                f"validation failed: field={e['field']} code={e['code']} filter={e['filter']}",
                field=e["field"],
                code=e["code"],
            )

    def write_dead_letter(self, path: str, fmt: str = "parquet") -> None:
        """LogHandler-style sink: persist rejected rows — with their
        ORIGINAL values (see :attr:`rejected_raw`) — plus error
        payloads, so a later replay under a fixed schema can recover
        them."""
        df = self.rejected_raw if self._pre is not None else self.rejected
        df.write.format(fmt).mode("append").save(path)
