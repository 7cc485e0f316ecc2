"""Config ingestion — asset-class requirements + template profiles.

Reference parity:

* ``assetclasses.json`` loading with legacy-shape auto-upgrade
  (MainForm.cs:135-185: new shape Dict[str, List[InputRequirement]],
  legacy Dict[str, List[str]] upgraded on read)
* template-profile extraction contract (TemplateProfileReader.cs:20-130):
  asset class from a filename regex, source labels from a "Process"
  sheet column until 10 consecutive blanks, order-preserving dedupe.
  The XLSX parsing itself is a desktop concern; our engine takes the
  already-extracted rows (any tabular source) and applies the same
  selection rules.

All driver-side Python: config is metadata, never a dataflow.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class InputRequirement:
    """A declared source slot (src/Models/InputRequirement.cs:6-17)."""

    label: str
    description: str = ""
    patterns: list[str] = field(default_factory=list)


def load_asset_classes(path_or_text: str) -> dict[str, list[InputRequirement]]:
    """Parse asset-class config; auto-upgrade the legacy shape
    (MainForm.cs:153-175)."""
    try:
        with open(path_or_text) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        raw = json.loads(path_or_text)
    out: dict[str, list[InputRequirement]] = {}
    for asset_class, reqs in raw.items():
        items = []
        for r in reqs:
            if isinstance(r, str):  # legacy: list of labels
                items.append(InputRequirement(label=r))
            else:
                items.append(
                    InputRequirement(
                        label=r.get("label", ""),
                        description=r.get("description", ""),
                        patterns=list(r.get("patterns", [])),
                    )
                )
        out[asset_class] = items
    return out


ASSET_CLASS_RE = re.compile(r"Data Validation\s*-\s*(.+?)\.(xlsx|xlsm)$", re.IGNORECASE)


def asset_class_from_filename(filename: str) -> str | None:
    """'Data Validation - <AssetClass>.xlsx' → asset class
    (TemplateProfileReader.cs:120-130)."""
    m = ASSET_CLASS_RE.search(filename)
    return m.group(1).strip() if m else None


def template_profile_from_rows(
    column_values: list[str | None], blank_run_limit: int = 10
) -> list[str]:
    """Collect source labels from a template column: stop after
    ``blank_run_limit`` consecutive blanks, dedupe preserving order
    (TemplateProfileReader.cs:60-118)."""
    out: list[str] = []
    seen: set[str] = set()
    blanks = 0
    for v in column_values:
        s = (v or "").strip()
        if not s:
            blanks += 1
            if blanks >= blank_run_limit:
                break
            continue
        blanks = 0
        key = s.lower()
        if key not in seen:
            seen.add(key)
            out.append(s)
    return out
