"""Reference-workflow semantics as Spark dataflows.

The reference's one big validation pass (Validator.cs:11-145 +
ReportGenerator.cs:132-454) decomposes into:

* presence     — N-way full-outer presence matrix, MatchesAll, MissingByFile
* conflicts    — per-key per-column value conflicts over common columns
* mapping      — field-mapping match scores + column-overlap suggestions
* deltas       — baseline-vs-others cell mismatches via inferred mapping
"""

from .presence import key_presence, matches_all, missing_by_file, source_keys
from .conflicts import conflicts, first_row_per_key, melt
from .mapping import column_overlap, field_mapping_scores, pick_mappings
from .deltas import deltas
from .pipeline import validate_sources

__all__ = [
    "validate_sources",
    "source_keys",
    "key_presence",
    "matches_all",
    "missing_by_file",
    "first_row_per_key",
    "melt",
    "conflicts",
    "field_mapping_scores",
    "pick_mappings",
    "column_overlap",
    "deltas",
]
