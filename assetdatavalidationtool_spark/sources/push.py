"""HTTP push of run artifacts — parity with the reference's
HttpApiClient (src/Services/HttpApiClient.cs:18-75), transport-injected
so the multipart/auth logic is real and tested offline.

Semantics mirrored from the reference:

* auth matrix (HttpApiClient.cs:29-50): api_key -> ``X-API-Key``
  header; bearer -> ``Authorization: Bearer``; basic ->
  ``Authorization: Basic base64(user:password)``; none -> no header.
* ``upload_source(label, path)`` posts multipart fields
  (label, file) to the source endpoint; ``upload_report(path)`` posts
  (file) to the report endpoint (HttpApiClient.cs:54-72).
* disabled settings or a blank endpoint return ``False`` without
  performing I/O (HttpApiClient.cs:56,67) — push is best-effort by
  design, unlike source reads which raise.
* timeout floor of 5 s (HttpApiClient.cs:24).

``post(url, headers, body, timeout) -> int`` is the injectable
transport (returns the HTTP status); the default uses stdlib urllib.
"""

from __future__ import annotations

import base64
import os
import uuid
from collections.abc import Callable
from dataclasses import dataclass

Post = Callable[[str, dict, bytes, float], int]


def default_post(url: str, headers: dict, body: bytes, timeout: float) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # nosec: caller's URL
        return resp.status


def encode_multipart(fields: dict[str, str], file_field: str,
                     filename: str, content: bytes,
                     boundary: str | None = None) -> tuple[bytes, str]:
    """RFC 2046 multipart/form-data body + content-type header value."""
    boundary = boundary or uuid.uuid4().hex
    parts: list[bytes] = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
            f"\r\n\r\n{v}\r\n".encode()
        )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="{file_field}"; '
        f'filename="{filename}"\r\nContent-Type: application/octet-stream'
        "\r\n\r\n".encode()
        + content
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


@dataclass
class ApiSettings:
    base_url: str = ""
    enabled: bool = False
    auth_type: str = "none"  # none | api_key | bearer | basic
    api_key: str = ""
    username: str = ""
    password: str = ""
    source_endpoint: str = ""
    report_endpoint: str = ""
    timeout_seconds: float = 30.0


class HttpPushClient:
    def __init__(self, settings: ApiSettings, post: Post | None = None):
        self.settings = settings
        self.post = post or default_post

    def _auth_headers(self) -> dict:
        s = self.settings
        if s.auth_type == "api_key" and s.api_key:
            return {"X-API-Key": s.api_key}
        if s.auth_type == "bearer" and s.api_key:
            return {"Authorization": f"Bearer {s.api_key}"}
        if s.auth_type == "basic" and s.username:
            tok = base64.b64encode(
                f"{s.username}:{s.password}".encode()
            ).decode("ascii")
            return {"Authorization": f"Basic {tok}"}
        return {}

    def _push(self, endpoint: str, fields: dict[str, str], file_path: str) -> bool:
        s = self.settings
        if not s.enabled or not endpoint.strip():
            return False
        with open(file_path, "rb") as f:
            content = f.read()
        body, ctype = encode_multipart(
            fields, "file", os.path.basename(file_path), content
        )
        url = s.base_url.rstrip("/") + "/" + endpoint.lstrip("/") if (
            s.base_url and not endpoint.startswith(("http://", "https://"))
        ) else endpoint
        headers = {**self._auth_headers(), "Content-Type": ctype}
        status = self.post(url, headers, body, max(5.0, s.timeout_seconds))
        return 200 <= status < 300

    def upload_source(self, label: str, file_path: str) -> bool:
        return self._push(
            self.settings.source_endpoint, {"label": label or ""}, file_path
        )

    def upload_report(self, report_path: str) -> bool:
        return self._push(self.settings.report_endpoint, {}, report_path)
