#!/usr/bin/env python
"""Extract contents of tabular files to stdout, one tab-joined line per
row — the reference CLI analog (cmd/grater/main.go:16-57).

USAGE: python scripts/grater.py [-v] file1.xls file2.xlsx file3.tsv ...

``-v`` prints the per-row type tags line before each row, matching the
reference's debug mode. Errors go to stderr and processing continues
with the next file, like the reference. Pure-library path — no Spark
session; the same extractors the Spark UDTF runs per blob.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Extracts contents of the tabular files to stdout")
    ap.add_argument("-v", action="store_true", dest="debug",
                    help="debug log (print type-tag lines)")
    ap.add_argument("files", nargs="+", metavar="file")
    args = ap.parse_args(argv)

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from grate_spark.extract import extract_blob

    rc = 0
    for fn in args.files:
        try:
            with open(fn, "rb") as fh:
                res = extract_blob(fn, fh.read())
        except Exception as e:  # reference: print error, continue
            print(e, file=sys.stderr)
            rc = 1
            continue
        for t in res.tables:
            for cells, types, _formats in t.rows:
                if args.debug:
                    print("\t".join(types))
                print("\t".join(cells))
    return rc


if __name__ == "__main__":
    sys.exit(main())
