"""Sources & sinks (SURVEY.md §2.1).

The engine core reads parquet/Iceberg tables; this package carries the
reference's ingestion semantics for asset-table files and config:

* ``asset_csv``   — CSV scan with the reference's header/padding rules
* ``config``      — asset-class requirements + template-profile loading
* ``connectors``  — REST/LDAP source scaffolds (config-driven stubs,
  gated behind import-try; the reference's are stubs too)
* ``report``      — result-table sink (one table per reference sheet)
"""

from .asset_csv import read_asset_table, read_headers
from .config import (
    InputRequirement,
    load_asset_classes,
    template_profile_from_rows,
)
from .report import write_report_tables

__all__ = [
    "read_asset_table",
    "read_headers",
    "InputRequirement",
    "load_asset_classes",
    "template_profile_from_rows",
    "write_report_tables",
]
