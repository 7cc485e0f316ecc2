"""assetdatavalidationtool_spark — a PySpark-native schema + constraint
validation engine.

A brand-new, Spark-first re-expression of the capabilities of
``Common-joeAI/AssetDataValidationTool`` (a C#/WinForms desktop tool that
joins N asset tables by key and diffs them — see SURVEY.md).  Instead of
in-memory row loops this engine compiles a declarative rule set
(schema conformance, per-column stats sketches, uniqueness, referential
integrity, distribution drift, per-row pixel/caption invariants) into
DataFrame expressions + vectorized Arrow UDFs, producing per-partition
pass/fail verdicts and materialized violation rows, resumable from a
checkpoint/manifest table.

Nothing here is ported from the reference; citations in docstrings are
`file:line` pointers into /root/reference for behavioral parity only.
"""

__version__ = "0.1.0"
