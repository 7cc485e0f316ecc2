"""SchemaRule — schema conformance + nullability + domain checks.

The reference only *tolerates* schema problems (pads ragged rows,
back-fills missing headers — ExcelReader.cs:110-114,164-166); this rule
instead *reports* them: missing/extra/mistyped columns become rule-level
violations, null-or-out-of-domain cells become row-level violations.
All row checks are pure Column predicates → whole-stage codegen, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import Rule, RuleContext


@dataclass
class ColumnSpec:
    name: str
    dtype: str  # Spark simpleString, e.g. "int", "string", "binary", "bigint"
    nullable: bool = True
    domain: F.Column | None = None  # extra predicate; row passes if True


@dataclass
class SchemaRule(Rule):
    columns: list[ColumnSpec] = field(default_factory=list)
    name: str = "schema"

    def violations(self, ctx: RuleContext) -> DataFrame:
        df = ctx.images
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        out = ctx.empty_violations()

        # table-level: missing / mistyped columns (schema is metadata —
        # checked driver-side, emitted as bucket-less violations)
        table_level = []
        for spec in self.columns:
            if spec.name not in actual:
                table_level.append((self.name, None, spec.name, "missing column", None))
            elif actual[spec.name] != spec.dtype:
                table_level.append(
                    (
                        self.name,
                        None,
                        spec.name,
                        f"type mismatch: expected {spec.dtype}, got {actual[spec.name]}",
                        None,
                    )
                )
        for col in actual:
            if col not in {s.name for s in self.columns} and col != "bucket":
                table_level.append((self.name, None, col, "unexpected column", None))
        if table_level:
            out = out.unionByName(
                ctx.spark.createDataFrame(table_level, out.schema)
            )

        # row-level: nullability + domain predicates — FUSED into a single
        # scan. Each check becomes a conditional struct in one array;
        # explode drops the nulls. One branch in the violations union
        # regardless of column count (vs one scan per check, which at
        # ~10 checks multiplies AQE stage-scheduling overhead ~10x).
        #
        # EXCEPTION — wide binary columns with ONLY a nullability check:
        # folding `bytes IS NULL` into the fused scan forces the scan to
        # READ the multi-GB binary column (no pushdown: it's a projected
        # expression, not a filter). Split those into their own
        # `WHERE col IS NULL` branch instead: the IsNull filter pushes to
        # parquet, row-group null_count stats skip every clean group, and
        # the fused scan prunes the binary column away — in the common
        # all-clean case the rule never touches the image bytes at all.
        checks = []
        wide_null_specs = []
        for spec in self.columns:
            if spec.name not in actual:
                continue
            if (
                actual[spec.name] == "binary"
                and not spec.nullable
                and spec.domain is None
            ):
                wide_null_specs.append(spec)
                continue
            if not spec.nullable:
                checks.append(
                    F.when(
                        F.col(spec.name).isNull(),
                        F.struct(
                            F.lit(spec.name).alias("column"),
                            F.lit("null value").alias("detail"),
                        ),
                    )
                )
            if spec.domain is not None:
                checks.append(
                    F.when(
                        F.col(spec.name).isNotNull() & ~spec.domain,
                        F.struct(
                            F.lit(spec.name).alias("column"),
                            F.lit("domain violation").alias("detail"),
                        ),
                    )
                )
        if not checks and not wide_null_specs:
            return out
        df_b = ctx.with_bucket(df)
        if checks:
            fused = (
                df_b.select(
                    F.col(ctx.key_col).cast("string").alias("key"),
                    F.col("bucket"),
                    F.array_compact(F.array(*checks)).alias("_viol"),
                )
                .where(F.size("_viol") > 0)
                .select(
                    F.lit(self.name).alias("rule"),
                    "key",
                    F.explode("_viol").alias("v"),
                    "bucket",
                )
                .select("rule", "key", F.col("v.column").alias("column"),
                        F.col("v.detail").alias("detail"), "bucket")
            )
            out = out.unionByName(fused)
        for spec in wide_null_specs:
            out = out.unionByName(
                df_b.where(F.col(spec.name).isNull()).select(
                    F.lit(self.name).alias("rule"),
                    F.col(ctx.key_col).cast("string").alias("key"),
                    F.lit(spec.name).alias("column"),
                    F.lit("null value").alias("detail"),
                    F.col("bucket"),
                )
            )
        return out
