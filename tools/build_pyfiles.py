"""Build the spark-submit --py-files artifact.

    python tools/build_pyfiles.py [out.zip]

Produces a zip of the `dataingestion_spark` package importable from
executors and the driver:

    spark-submit --py-files dataingestion_spark.zip \
        --master <cluster> cli_entry.py apply --config ...

(or `python -m dataingestion_spark.cli` locally). The zip contains only
package sources - no tests, no caches - so it ships identically to the
1000-executor cluster the engine targets.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "dataingestion_spark"


def build(out: str | Path) -> Path:
    root = Path(__file__).resolve().parent.parent
    out = Path(out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((root / PKG).rglob("*.py")):
            z.write(p, p.relative_to(root))
    return out


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    path = build(target)
    print(path)
