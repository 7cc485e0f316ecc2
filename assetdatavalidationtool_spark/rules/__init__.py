"""Declarative validation rules compiled to DataFrame plans.

Reference parity map (SURVEY.md §7.1):

* SchemaRule        ← header discovery/padding   (ExcelReader.cs:18-85,164-166)
* StatsRule         ← value-overlap stats        (ColumnOverlapMapper.cs:31-43)
* UniquenessRule    ← first-row-wins key index   (ReportGenerator.cs:150-156)
* ReferentialRule   ← MatchesAll / MissingByFile (Validator.cs:67-91)
* RowInvariantRule  ← Conflicts/Deltas compare   (Validator.cs:93-142)
* HeaderConsistencyRule ← the same conflict compare between metadata
  columns and the payload's own embedded header — decode-free
* DriftRule         ← field-mapping score distributions (ReportGenerator.cs:170-205)
* AudioInvariantRule ← RowInvariantRule's per-row compare applied to a
  WAV-clips table (exact sample equality — the lossless counterpart of
  the PSNR gate — plus metadata + clipping health)
* VideoInvariantRule ← the same compare applied to Y4M videos (sampled
  frames vs reference rendering under a PSNR gate + header metadata)
"""

from .base import (
    RuleContext,
    RuleSet,
    VIOLATIONS_SCHEMA,
    split_violations,
    write_split,
)
from .schema import SchemaRule
from .stats import StatsRule
from .uniqueness import UniquenessRule
from .referential import ReferentialRule
from .row_invariant import RowInvariantRule
from .drift import DriftRule
from .audio import AudioInvariantRule
from .video import VideoInvariantRule
from .gate import MetadataGateRule
from .header import HeaderConsistencyRule
from .neardup import NearDuplicateRule

__all__ = [
    "RuleContext",
    "RuleSet",
    "VIOLATIONS_SCHEMA",
    "split_violations",
    "write_split",
    "SchemaRule",
    "StatsRule",
    "UniquenessRule",
    "ReferentialRule",
    "RowInvariantRule",
    "DriftRule",
    "AudioInvariantRule",
    "VideoInvariantRule",
    "MetadataGateRule",
    "HeaderConsistencyRule",
    "NearDuplicateRule",
]
