"""ReferentialRule — key containment between the image and caption sides.

Direct scale analog of the reference's MissingByFile set-difference
(Validator.cs:86-91: ``allKeys − keys(source)``) and presence matrix
(Validator.cs:67-79): each direction is a ``left_anti`` join on the key,
emitting one violation row per unmatched key.

Scale notes: both sides are projected to the key column *before* the
join (column pruning keeps image bytes out of the shuffle entirely);
the join shuffles only (key) pairs. With AQE on, a small side (e.g. a
dimension-sized caption subset) goes broadcast automatically; we also
pre-repartition both sides on the key so the two anti-joins reuse one
exchange (north_rule: explicit repartitioning).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import Rule, RuleContext


@dataclass
class ReferentialRule(Rule):
    key: str = "image_id"
    direction: str = "both"  # "images->captions", "captions->images", "both"
    name: str = "referential"

    def violations(self, ctx: RuleContext) -> DataFrame:
        if ctx.captions is None:
            return ctx.empty_violations()
        k = self.key
        # Both directions from ONE full-outer join of the two distinct key
        # sets (set semantics, matching the reference's HashSets) instead
        # of two anti-joins — halves the shuffle count. Map-side partial
        # aggregation shrinks each side to distinct keys before the
        # exchange; only the key column ever moves (bytes stay in the scan).
        img_keys = (
            ctx.images.select(F.col(k)).where(F.col(k).isNotNull())
            .groupBy(k).agg(F.lit(True).alias("_img"))
        )
        cap_keys = (
            ctx.captions.select(F.col(k)).where(F.col(k).isNotNull())
            .groupBy(k).agg(F.lit(True).alias("_cap"))
        )
        joined = img_keys.join(cap_keys, k, "full_outer")

        want_caption = self.direction in ("images->captions", "both")
        want_image = self.direction in ("captions->images", "both")
        detail = (
            F.when(F.col("_cap").isNull() & F.lit(want_caption), "missing caption row")
            .when(F.col("_img").isNull() & F.lit(want_image), "missing image row")
        )
        return joined.where(detail.isNotNull()).select(
            F.lit(self.name).alias("rule"),
            F.col(k).cast("string").alias("key"),
            F.lit(k).alias("column"),
            detail.alias("detail"),
            ctx.bucket_of(F.col(k)).alias("bucket"),
        )
