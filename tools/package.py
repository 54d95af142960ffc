"""Build geowave_spark.zip for spark-submit --py-files.

    python tools/package.py [out.zip]
    spark-submit --py-files geowave_spark.zip your_job.py
"""

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "geowave_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "geowave_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
