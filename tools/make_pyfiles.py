"""Build dist/tl_spark.zip for `spark-submit --py-files`.

Only the package sources go in (no tests/goldens/tools); the zip is
importable directly from the executors' PYTHONPATH.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> str:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "tl_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "tl_spark").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
