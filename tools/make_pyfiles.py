"""Build the --py-files artifact for cluster submission.

Produces dist/ocds_entity_extract_spark.zip containing the package only
(no tests, no caches) — the artifact a real deployment ships with

    spark-submit --py-files dist/ocds_entity_extract_spark.zip \
        tools/submit_job.py <n_pages> [out_dir]

Executors unpack the zip onto their PYTHONPATH, so every pandas/Arrow UDF
(functions/, operators/) resolves inside the executor's Python worker
without the repo checkout being present on the cluster.

Usage: python tools/make_pyfiles.py  [-> prints the artifact path]
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "ocds_entity_extract_spark"


def build(out_dir: pathlib.Path | None = None) -> pathlib.Path:
    out_dir = out_dir or (ROOT / "dist")
    out_dir.mkdir(exist_ok=True)
    out = out_dir / "ocds_entity_extract_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
