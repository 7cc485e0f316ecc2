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
        # project-then-shuffle: only the key column moves
        img_keys = ctx.images.select(F.col(k)).where(F.col(k).isNotNull())
        cap_keys = ctx.captions.select(F.col(k)).where(F.col(k).isNotNull())

        out = ctx.empty_violations()
        if self.direction in ("images->captions", "both"):
            missing_caption = img_keys.join(cap_keys, k, "left_anti")
            out = out.unionByName(self._emit(ctx, missing_caption, "missing caption row"))
        if self.direction in ("captions->images", "both"):
            missing_image = cap_keys.join(img_keys, k, "left_anti")
            out = out.unionByName(self._emit(ctx, missing_image, "missing image row"))
        return out

    def _emit(self, ctx: RuleContext, keys_df: DataFrame, detail: str) -> DataFrame:
        return keys_df.select(
            F.lit(self.name).alias("rule"),
            F.col(self.key).cast("string").alias("key"),
            F.lit(self.key).alias("column"),
            F.lit(detail).alias("detail"),
            F.pmod(F.xxhash64(F.col(self.key)), F.lit(ctx.num_buckets))
            .cast("long")
            .alias("bucket"),
        )
