"""Package sparkcdc for cluster submission (north rule: "run via
spark-submit --py-files on multi-executor clusters").

    python tools/make_pyfiles.py [out.zip]      # default dist/sparkcdc.zip
    spark-submit --master <cluster> \
        --py-files dist/sparkcdc.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        -m sparkcdc -- --log s3a://bucket/wal --table s3a://bucket/tbl

The zip carries only the package (no tests/tools); executors then import
sparkcdc for the Arrow UDFs that pickle by reference, and the driver runs
the same engine code path exercised by the local test suite.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "sparkcdc")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "sparkcdc.zip")
    path = build(out)
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    print(f"wrote {path} ({len(names)} modules)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
