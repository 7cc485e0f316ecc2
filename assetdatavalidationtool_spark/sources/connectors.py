"""External source connectors — config-driven scaffolds.

The reference ships REST clients for ServiceNow / Azure AD and an LDAP
client for Active Directory, plus auth-only stubs for Nessus, Absolute
and Rapid7 (src/Services/Integrations/* — ServiceNowClient.cs:39 calls
itself a "Basic scaffold"). We mirror that surface honestly:

* a common ``fetch_rows() -> list[dict]`` contract that materializes
  into a DataFrame via ``spark.createDataFrame`` with dynamically grown
  headers (the reference grows headers as new JSON/LDAP fields appear,
  ServiceNowClient.cs:56-64, ActiveDirectoryClient.cs:36-46);
* network libraries are gated behind import-try — in containers
  without them (or without credentials) the connectors raise a clear
  error instead of silently returning empty (the reference swallows
  errors into empty results; we do not);
* the LDAP connector's server-side attribute projection
  (PropertiesToLoad, ActiveDirectoryClient.cs:27-31) maps to passing an
  explicit attribute list — the one pushed-down projection the
  reference has.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rows_to_df(spark: SparkSession, rows: list[dict], source: str) -> DataFrame:
    """Dynamic-header materialization: union of keys across rows, all
    strings, missing cells "" (ServiceNowClient.cs:56-64 semantics)."""
    headers: list[str] = []
    seen = set()
    for r in rows:
        for k in r:
            if k not in seen:
                seen.add(k)
                headers.append(k)
    schema = T.StructType(
        [T.StructField(h, T.StringType(), True) for h in headers]
        + [T.StructField("_source", T.StringType(), False)]
    )
    data = [
        tuple(str(r.get(h, "")) if r.get(h) is not None else "" for h in headers)
        + (source,)
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


@dataclass
class RestConnector:
    """ServiceNow/AzureAD-style paged REST table source (scaffold)."""

    base_url: str
    table: str
    auth_token: str | None = None
    page_size: int = 500
    query: str | None = None  # pushed-down filter string (sysparm_query)

    def fetch_rows(self) -> list[dict]:
        try:
            import urllib.request  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(f"HTTP stack unavailable: {e}") from e
        raise NotImplementedError(
            "RestConnector is a scaffold (like the reference's, "
            "ServiceNowClient.cs:39): wire base_url/auth and parse the "
            "paged JSON into dict rows here."
        )

    def to_df(self, spark: SparkSession, source: str) -> DataFrame:
        return rows_to_df(spark, self.fetch_rows(), source)


@dataclass
class LdapConnector:
    """Active-Directory-style LDAP source (scaffold) with server-side
    attribute projection — column pruning at the source."""

    server: str
    search_base: str
    ldap_filter: str = "(objectClass=computer)"
    attributes: list[str] = field(default_factory=lambda: ["name", "operatingSystem"])
    page_size: int = 500

    def fetch_rows(self) -> list[dict]:
        try:
            import ldap3  # type: ignore  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "ldap3 not available in this container; install it and "
                "implement the paged search here (attributes list is the "
                "pushed-down projection)."
            ) from e
        raise NotImplementedError("implement paged LDAP search")

    def to_df(self, spark: SparkSession, source: str) -> DataFrame:
        return rows_to_df(spark, self.fetch_rows(), source)
