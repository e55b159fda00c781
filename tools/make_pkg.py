"""Build the --py-files zip for spark-submit.

    python tools/make_pkg.py [out.zip]        # default: gtbs_pkg.zip

Zips the `gliner_transbronchialbiopsy_spark` package (source only, no
caches) so executors can import it:

    spark-submit --master local[32] --py-files gtbs_pkg.zip \
        tools/run_kg_job.py --input ... --workdir ... --cpus 32
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "gliner_transbronchialbiopsy_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "gtbs_pkg.zip"
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
                n += 1
    print(f"wrote {out} ({n} files)")


if __name__ == "__main__":
    main()
