"""Sources & config: CSV semantics, config upgrade, template profile,
report sink, connector scaffolds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assetdatavalidationtool_spark.sources import (
    InputRequirement,
    load_asset_classes,
    read_asset_table,
    read_headers,
    template_profile_from_rows,
    write_report_tables,
)
from assetdatavalidationtool_spark.sources.config import asset_class_from_filename
from assetdatavalidationtool_spark.sources.connectors import LdapConnector, rows_to_df

CSV = """Hostname,IP Address,MAC Address,Serial Number,,
host-a,10.0.0.1,AA:BB:CC:00:11:22,SN-1
host-b,10.0.0.2
host-c,10.0.0.3,AA:BB:CC:00:11:33,SN-3,extra
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "assets.csv"
    p.write_text(CSV)
    return str(p)


def test_read_headers_trims_trailing_blanks(spark, csv_path):
    assert read_headers(spark, csv_path) == [
        "Hostname", "IP Address", "MAC Address", "Serial Number",
    ]


def test_ragged_rows_padded(spark, csv_path):
    df = read_asset_table(spark, csv_path)
    rows = {r["Hostname"]: r for r in df.collect()}
    # host-b is missing MAC + Serial → padded with ""
    assert rows["host-b"]["MAC Address"] == "" and rows["host-b"]["Serial Number"] == ""
    assert rows["host-a"]["Serial Number"] == "SN-1"
    # order column present and increasing with file position
    assert rows["host-a"]["_ord"] < rows["host-b"]["_ord"] < rows["host-c"]["_ord"]


def test_asset_class_config_legacy_upgrade():
    new_shape = '{"Workstations": [{"label": "Baseline", "patterns": ["*base*"]}]}'
    legacy = '{"Servers": ["CMDB", "Scanner"]}'
    a = load_asset_classes(new_shape)
    assert a["Workstations"][0] == InputRequirement("Baseline", "", ["*base*"])
    b = load_asset_classes(legacy)
    assert [r.label for r in b["Servers"]] == ["CMDB", "Scanner"]


def test_template_profile_rules():
    col = ["CMDB", "", "Scanner", "cmdb",
           None, "", "", "", "", "", "", "", "", "",  # 10 consecutive blanks
           "AfterLimit"]
    # 10 consecutive blanks stop collection; case-insensitive dedupe
    assert template_profile_from_rows(col) == ["CMDB", "Scanner"]
    assert asset_class_from_filename("Data Validation - Laptops.xlsx") == "Laptops"
    assert asset_class_from_filename("notes.xlsx") is None


def test_report_sink_counts(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("report"))
    t1 = spark.range(5).select(F.col("id").alias("key"))
    t2 = spark.range(3).select(F.col("id").alias("key"))
    counts = write_report_tables(spark, out, {"KeyPresence": t1, "Conflicts": t2})
    assert counts == {"KeyPresence": 5, "Conflicts": 3}
    summary = {r["table"]: r["row_count"] for r in spark.read.parquet(f"{out}/Summary").collect()}
    assert summary == counts
    assert spark.read.parquet(f"{out}/_preview/KeyPresence").count() == 5


def test_connector_scaffolds(spark):
    df = rows_to_df(
        spark,
        [{"name": "h1", "os": "linux"}, {"name": "h2", "ip": "10.0.0.2"}],
        "cmdb",
    )
    # dynamic header growth + "" padding + source label
    assert set(df.columns) == {"name", "os", "ip", "_source"}
    rows = {r["name"]: r for r in df.collect()}
    assert rows["h1"]["ip"] == "" and rows["h2"]["os"] == ""
    with pytest.raises(NotImplementedError):
        LdapConnector("ldap://x", "dc=corp").fetch_rows()
