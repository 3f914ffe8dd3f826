"""Build the fgcspark.zip shipped to executors via --py-files.

Deploy story per BASELINE.json north_rule: `spark-submit --py-files
fgcspark.zip fgcspark/cli.py <job> ...` on a multi-executor cluster.
The archive contains only the package's .py files (no tests, no
__pycache__, no data), so the artifact is a few hundred KB and ships
in the submit handshake.

Usage:  python scripts/make_pyfiles.py [out.zip]   (default dist/fgcspark.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "fgcspark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "fgcspark.zip"
    print(build(dest))
