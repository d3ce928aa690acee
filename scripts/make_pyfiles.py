"""Package grate_spark for ``spark-submit --py-files``.

Builds a deterministic zip of the library (sources only, stable order,
fixed timestamps) so the same artifact ships to every executor:

    python scripts/make_pyfiles.py [out.zip]      # default dist/grate_spark.zip
    spark-submit --py-files dist/grate_spark.zip scripts/submit_replay.py ...

On a real cluster this is the whole deployment story — the engine is
pure Python over pyspark; no native builds, no wheels.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> list[str]:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    names: list[str] = []
    pkg = os.path.join(REPO, "grate_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                names.append(os.path.relpath(full, REPO))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in names:
            # fixed timestamp -> byte-identical artifact for identical
            # sources (reproducible deploys)
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as f:
                z.writestr(info, f.read())
    return names


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "dist", "grate_spark.zip")
    names = build(out)
    print(f"{out}: {len(names)} files, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
