"""Build the --py-files artifact: zip `fileverification_spark/` into
dist/fileverification_spark.zip for `spark-submit --py-files` (north_rule:
"launched via spark-submit --py-files at N and 4N executors").

Pure stdlib; deterministic member order so the artifact is reproducible.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "fileverification_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    members = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in members:
            z.write(full, arc)
    return out_path


if __name__ == "__main__":
    print(build())
