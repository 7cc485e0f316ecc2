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

        # row-level: nullability + domain predicates, one pass over the table
        df_b = ctx.with_bucket(df)
        for spec in self.columns:
            if spec.name not in actual:
                continue
            conds = []
            if not spec.nullable or spec.domain is not None:
                if not spec.nullable:
                    conds.append((F.col(spec.name).isNull(), F.lit("null value")))
                if spec.domain is not None:
                    conds.append(
                        (
                            F.col(spec.name).isNotNull() & ~spec.domain,
                            F.lit("domain violation"),
                        )
                    )
            for cond, detail in conds:
                out = out.unionByName(
                    df_b.where(cond).select(
                        F.lit(self.name).alias("rule"),
                        F.col(ctx.key_col).cast("string").alias("key"),
                        F.lit(spec.name).alias("column"),
                        detail.alias("detail"),
                        F.col("bucket"),
                    )
                )
        return out
