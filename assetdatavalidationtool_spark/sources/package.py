"""Report packaging + workbook-format sanitizers (S10, F12, F14).

Pure-stdlib parity with the reference's distribution conveniences:

* ``sanitize_for_xml`` — drop characters outside the XML 1.0 valid
  ranges before they reach any XML/workbook writer
  (`/root/reference/src/Services/ReportGenerator.cs:494-514`).
* ``sanitize_sheet_name`` / ``dedupe_sheet_names`` — Excel sheet-name
  rules: strip ``:\\/?*[]``, trim, cap at 31 chars, 'Sheet' fallback
  (`OpenXmlHelpers.cs:70-83`), then case-insensitive ``" (2)"``
  suffix disambiguation capped back to 31
  (`OpenXmlHelpers.cs:36-53`).
* ``package_run`` — zip the report + deduped sources + audit log as
  ``{assetClass}-{yyyyMMdd}-{username}.zip`` with spaces → underscores,
  sources under a ``sources/`` prefix (`Packager.cs:11-34`). Ours
  additionally accepts directories (the engine's report/manifest sinks
  are parquet directories) and zips them recursively under their base
  name.

These are driver-side artifact utilities — nothing here touches the
distributed plans.
"""

from __future__ import annotations

import os
import zipfile
from datetime import datetime, timezone

_SHEET_INVALID = set(":\\/?*[]")


def sanitize_for_xml(text: str | None) -> str:
    """Keep only XML 1.0 valid chars: #x9 #xA #xD, #x20-#xD7FF,
    #xE000-#xFFFD (ReportGenerator.cs:508-514)."""
    if not text:
        return ""
    return "".join(
        c
        for c in text
        if c in ("\t", "\n", "\r")
        or "\x20" <= c <= "퟿"
        or "" <= c <= "�"
    )


def sanitize_sheet_name(name: str | None) -> str:
    """OpenXmlHelpers.SanitizeSheetName semantics: drop ``:\\/?*[]``,
    trim, cap at 31 chars, fall back to 'Sheet' when empty/blank."""
    if name is None or not name.strip():
        name = "Sheet"
    name = "".join(c for c in name if c not in _SHEET_INVALID).strip()
    if len(name) > 31:
        name = name[:31]
    return name or "Sheet"


def dedupe_sheet_names(requested: list[str]) -> list[str]:
    """AddWorksheet's case-insensitive disambiguation: the second
    occurrence of a name becomes ``name (2)``, then ``(3)`` …, re-capped
    to 31 chars (OpenXmlHelpers.cs:36-53)."""
    used: set[str] = set()
    out: list[str] = []
    for req in requested:
        name = sanitize_sheet_name(req)
        base = name
        disambiguator = 2
        while name.lower() in used:
            name = f"{base} ({disambiguator})"
            if len(name) > 31:
                name = name[:31]
            disambiguator += 1
        used.add(name.lower())
        out.append(name)
    return out


def _add_path(archive: zipfile.ZipFile, path: str, arcname: str) -> None:
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, path)
                archive.write(full, os.path.join(arcname, rel))
    else:
        archive.write(path, arcname)


def package_run(
    asset_class: str,
    report_path: str,
    source_files: list[str],
    audit_log_path: str | None,
    output_folder: str,
    date: str | None = None,
    username: str | None = None,
) -> str:
    """Zip the run artifacts (Packager.cs:11-34): report at the archive
    root, sources deduped case-insensitively under ``sources/``, audit
    log at the root. Name: ``{assetClass}-{yyyyMMdd}-{username}.zip``
    with spaces replaced by underscores. ``date``/``username`` are
    injectable for deterministic tests; defaults mirror the reference
    (today + the OS user)."""
    os.makedirs(output_folder, exist_ok=True)
    date = date or datetime.now(timezone.utc).strftime("%Y%m%d")
    username = username or os.environ.get("USER", "user")
    zip_name = f"{asset_class}-{date}-{username}.zip".replace(" ", "_")
    zip_path = os.path.join(output_folder, zip_name)
    if os.path.exists(zip_path):
        os.remove(zip_path)
    seen: set[str] = set()
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as archive:
        _add_path(archive, report_path, os.path.basename(report_path.rstrip("/")))
        for f in source_files:
            key = f.lower()
            if key in seen or not os.path.exists(f):
                continue
            seen.add(key)
            _add_path(
                archive, f, os.path.join("sources", os.path.basename(f.rstrip("/")))
            )
        if audit_log_path and os.path.exists(audit_log_path):
            _add_path(
                archive, audit_log_path, os.path.basename(audit_log_path.rstrip("/"))
            )
    return zip_path
