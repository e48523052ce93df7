#!/usr/bin/env python
"""Build dist/eaps.zip for spark-submit --py-files.

Zips the email_address_parser_spark package (source only) so every executor
can import it; run from the repo root:

    python jobs/package_pyfiles.py
    spark-submit --py-files dist/eaps.zip jobs/run_pipeline.py ...
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "email_address_parser_spark"
DIST = REPO / "dist"


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "eaps.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(PKG.rglob("*.py")):
            zf.write(path, path.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
