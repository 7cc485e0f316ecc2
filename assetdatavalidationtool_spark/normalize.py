"""Typed value-normalization expressions (SURVEY.md §2.8).

The reference infers a normalization class from the *header name* and
applies it before comparisons (src/Services/ValueNormalizer.cs:15-54).
Here each class is a pure Column expression — JVM-side, whole-stage
codegen, no UDFs — applied before key joins and value comparisons.

Classes (behavioral parity, not a port):

* base:     trim → collapse whitespace → strip edge ``. - _``
* MAC:      strip non-hex, uppercase              (ValueNormalizer.cs:24-28)
* IPv4:     de-zero-pad octets when dotted-quad   (ValueNormalizer.cs:30-41)
* HOST/NAME: lowercase                            (ValueNormalizer.cs:44-45)
* SERIAL/ASSET TAG: strip space+dash, uppercase   (ValueNormalizer.cs:47-51)
* PK mode fallback: uppercase                     (ValueNormalizer.cs:53)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def base_normalize(c: Column) -> Column:
    c = F.trim(c)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.regexp_replace(c, r"^[.\-_]+|[.\-_]+$", "")


def normalize_mac(c: Column) -> Column:
    return F.upper(F.regexp_replace(base_normalize(c), "[^0-9A-Fa-f]", ""))


def normalize_ipv4(c: Column) -> Column:
    b = base_normalize(c)
    is_quad = b.rlike(r"^\s*\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\s*$")
    octets = [
        F.regexp_extract(b, r"^\s*(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})\s*$", i)
        .cast("int")
        .cast("string")
        for i in range(1, 5)
    ]
    return F.when(is_quad, F.concat_ws(".", *octets)).otherwise(b)


def normalize_hostname(c: Column) -> Column:
    return F.lower(base_normalize(c))


def normalize_serial(c: Column) -> Column:
    return F.upper(F.regexp_replace(base_normalize(c), r"[\s\-]", ""))


def normalize_for_header(header: str, c: Column, pk_mode: bool = False) -> Column:
    """Dispatch on header name, mirroring NormalizeByHeader's precedence:
    MAC > IP > HOST/NAME > SERIAL/ASSET TAG > (pk: upper | value: base)."""
    h = header.strip().upper()
    if "MAC" in h:
        return normalize_mac(c)
    if "IP" in h:
        return normalize_ipv4(c)
    if "HOST" in h or "NAME" in h:
        return normalize_hostname(c)
    if "SERIAL" in h or "S\\N" in h or "ASSET TAG" in h or "ASSET_TAG" in h:
        return normalize_serial(c)
    return F.upper(base_normalize(c)) if pk_mode else base_normalize(c)


def norm_key(c: Column) -> Column:
    """Key normalization used throughout the validation workflow: trim +
    case-fold (the reference's OrdinalIgnoreCase key sets,
    Validator.cs:39-42,62)."""
    return F.upper(F.trim(c.cast("string")))


def norm_value(c: Column) -> Column:
    """Value comparison normalization: trim + case-fold, null → ''
    (Validator.cs:124-127)."""
    return F.upper(F.trim(F.coalesce(c.cast("string"), F.lit(""))))


def wildcard_to_rlike(pattern: str) -> str:
    """Filename wildcard → anchored case-insensitive regex
    (MainForm.cs:530-535): ``*`` → ``.*``, ``?`` → ``.``."""
    esc = re.escape(pattern).replace(r"\*", ".*").replace(r"\?", ".")
    return f"(?i)^{esc}$"
