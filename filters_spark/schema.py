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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .core import ERROR_DDL, FilterError, Validator, ValidatorLike, coerce, null_error

__all__ = ["ValidationSchema", "ValidationResult", "SchemaError"]

ERRORS_COL = "_errors"


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
        return missing, extra

    # -- compilation ------------------------------------------------------
    def apply(self, df: DataFrame) -> DataFrame:
        """Compile the schema into STAGED projections: one narrow
        select per chain depth, with per-field ``(_v_x, _e_x)``
        intermediate columns, then a final select assembling cleaned
        columns + the ``_errors`` array (first error per field —
        MemoryHandler's accumulation per row).

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
                list(chain.steps) if isinstance(chain, Chain) else [chain]
            )

        passthrough = [F.col(c) for c in extra]
        # Stage 0: bind sources (missing declared column → NULL runs
        # through the chain; only Required then rejects — reference
        # missing-key semantics).
        cur = df.select(
            *[
                (F.col(n) if n not in missing else F.lit(None)).alias(f"_v_{n}")
                for n in steps_by_field
            ],
            *[null_error().alias(f"_e_{n}") for n in steps_by_field],
            *passthrough,
        )
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
            cur = cur.select(*stage, *passthrough)

        errs = [F.col(f"_e_{n}") for n in steps_by_field]
        err_array = (
            F.array_compact(F.array(*errs))
            if errs
            else F.array().cast(f"array<{ERROR_DDL}>")
        )
        return cur.select(
            # invalid → None (reference cleaned_data semantics): the
            # single end-of-chain nulling point.
            *[
                F.when(F.col(f"_e_{n}").isNull(), F.col(f"_v_{n}")).alias(n)
                for n in steps_by_field
            ],
            *passthrough,
            err_array.alias(ERRORS_COL),
        )

    def validate(self, df: DataFrame, strict: bool = False) -> "ValidationResult":
        result = ValidationResult(self.apply(df))
        if strict:
            result.raise_on_error()
        return result

    def __or__(self, other: "ValidationSchema") -> "ValidationSchema":
        merged = dict(self.filter_map)
        for k, v in other.filter_map.items():
            merged[k] = (merged[k] | v) if k in merged else v
        return ValidationSchema(merged, self.allow_extra_keys, self.allow_missing_keys)


class ValidationResult:
    """Lazy handle over the validated DataFrame (all properties are
    plans, not materializations)."""

    def __init__(self, validated: DataFrame):
        self.validated = validated

    @property
    def clean(self) -> DataFrame:
        return self.validated.where(F.size(F.col(ERRORS_COL)) == 0).drop(ERRORS_COL)

    @property
    def rejected(self) -> DataFrame:
        return self.validated.where(F.size(F.col(ERRORS_COL)) > 0)

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
        """LogHandler-style sink: persist rejected rows with their
        error payloads for replay/inspection."""
        self.rejected.write.format(fmt).mode("append").save(path)
