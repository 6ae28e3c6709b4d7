#!/usr/bin/env python
"""Package ``phphll_spark`` into ``dist/phphll_spark.zip`` for
``spark-submit --py-files`` (the deployment unit the north star names:
"runs via spark-submit --py-files at N and 4N executors").

Deterministic: fixed timestamps, sorted entries — the zip is reproducible
byte-for-byte from the same source tree.
"""

from __future__ import annotations

import os
import zipfile


def build_zip(repo_root: str | None = None, out: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out or os.path.join(repo_root, "dist", "phphll_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(repo_root, "phphll_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, repo_root), full))
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(2024, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    print(build_zip())
