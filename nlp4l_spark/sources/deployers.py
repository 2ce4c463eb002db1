"""File deployers: ship produced artifacts to external endpoints.

Reference semantics: HttpFileTransferDeployer POSTs a produced file to a
configured URL (/root/reference/app/org/nlp4l/framework/builtin/
FeaturedDeployers.scala, ltr/support/procs/HttpFileTransferDeployer.scala).
Driver-side ops concern — no Spark involvement beyond having written the
file; kept dependency-free (urllib)."""

from __future__ import annotations

import os
import urllib.request


def http_deploy(
    file_path: str,
    url: str,
    *,
    content_type: str = "application/octet-stream",
    timeout: float = 30.0,
) -> int:
    """POST a file's bytes to ``url``; returns the HTTP status code.
    Raises on connection errors (caller decides retry policy, as the
    reference surfaces deployer failures to the job status)."""
    with open(file_path, "rb") as fh:
        data = fh.read()
    req = urllib.request.Request(
        url,
        data=data,
        method="POST",
        headers={
            "Content-Type": content_type,
            "Content-Length": str(len(data)),
            "X-Filename": os.path.basename(file_path),
        },
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status
