"""Build dist/engine.zip for `spark-submit --py-files` (north rule).

The zip contains the `indian_address_parser_spark` package only — jobs are
submitted as plain files, test/bench assets stay out. Executors unpack the
zip onto their PYTHONPATH, so everything the Arrow UDFs import on workers
(core/, operators/, functions/) must live inside the package — it does.

Usage:
  python scripts/package.py
  spark-submit --py-files dist/engine.zip jobs/run_pipeline.py \
      --input /data/pages --work-dir /data/er_run
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "indian_address_parser_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
