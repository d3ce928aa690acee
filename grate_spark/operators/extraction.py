"""The extraction UDTF: file blobs -> sheet rows, as ``mapInPandas``.

One blob row fans out to N (sheet, row) rows. All parsing happens inside
the Arrow batch (vectorized transfer, per-file python decode — the file is
the irreducible sequential unit; parallelism is across files/partitions).
Corrupt or unrecognized blobs become error rows, never task failures
(errs.go error-chain analog).

Scale notes:
- the input should be pre-filtered to tabular paths *before* this
  operator (Catalyst pushes that into the scan; see cdc.pipeline)
- repartition/salting for hot repos happens upstream; this operator is
  embarrassingly parallel per partition and holds one file grid at a
  time per output chunk
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

EXTRACT_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("fmt", StringType()),
    StructField("sheet", StringType()),
    StructField("sheet_idx", IntegerType()),
    StructField("row_id", LongType()),
    StructField("cells", ArrayType(StringType())),
    # compact per-cell type tags: one char per cell (see TYPE_CODES);
    # a dense array<string> here triples row-conversion + storage cost
    # for data that is one of 8 enum values
    StructField("types", StringType()),
    # NULL when every cell is General (the overwhelmingly common case)
    StructField("formats", ArrayType(StringType())),
    StructField("error", StringType()),
])

# type-name -> tag char (grate.go:32-35 names); expand_types() inverts
TYPE_CODES = {"blank": " ", "integer": "i", "float": "f", "string": "s",
              "boolean": "b", "date": "d", "hyperlink": "h",
              "static": "m"}
TYPE_NAMES = {v: k for k, v in TYPE_CODES.items()}

_OUT_COLS = [f.name for f in EXTRACT_SCHEMA.fields]

# rows per yielded pandas chunk: bounds executor memory independently of
# how many rows one giant workbook expands to
_CHUNK_ROWS = 8192


_GC_TUNED = False


def _tune_worker_gc() -> None:
    """Extraction allocates millions of short-lived objects per batch;
    with default thresholds CPython's gen2 collector rescans the whole
    heap (pandas/pyarrow imports = ~200k live objects) every ~70k
    allocations. The decoder graph is cycle-free, so freeze the
    baseline heap and stretch the thresholds — 2-3x extraction
    throughput on long-running workers. ONCE per worker process:
    reused workers (spark.python.worker.reuse) run many tasks, and the
    full collect+freeze costs tens of ms per call — per-task it was
    pure fixed cost on the ingest path."""
    global _GC_TUNED
    if _GC_TUNED:
        return
    _GC_TUNED = True
    import gc
    gc.collect()
    gc.freeze()
    gc.set_threshold(200000, 100, 100)


def _extract_batches(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
    # imports inside the worker process
    from grate_spark.extract import ExtractError, NotInFormat, extract_blob

    _tune_worker_gc()

    buf: list[tuple] = []

    def flush():
        nonlocal buf
        out = pd.DataFrame(buf, columns=_OUT_COLS)
        buf = []
        return out

    for pdf in batches:
        repos = pdf["repo"].to_numpy()
        paths = pdf["path"].to_numpy()
        commits = (pdf["commit"].to_numpy() if "commit" in pdf
                   else [""] * len(pdf))
        contents = pdf["content"].to_numpy()
        langs = (pdf["lang"].to_numpy() if "lang" in pdf
                 else [None] * len(pdf))

        for repo, path, commit, content, lang in zip(
                repos, paths, commits, contents, langs):
            try:
                res = extract_blob(path, content, lang)
            except (NotInFormat, ExtractError) as e:
                buf.append((repo, path, commit, None, None, -1, -1,
                            None, None, None,
                            f"{type(e).__name__}: {e}"))
                continue
            except Exception as e:  # never fail the task on one blob
                buf.append((repo, path, commit, None, None, -1, -1,
                            None, None, None, f"internal: {e!r}"))
                continue
            for si, table in enumerate(res.tables):
                if table.hidden:
                    # xls List() excludes hidden sheets (xls/sheets.go:15-23)
                    continue
                for rid, (cells, types, formats) in enumerate(table.rows):
                    tstr = "".join(TYPE_CODES.get(t, "?") for t in types)
                    fmts = formats if any(f != "General" for f in formats) \
                        else None
                    buf.append((repo, path, commit, res.fmt, table.name,
                                si, rid, cells, tstr, fmts, None))
                    if len(buf) >= _CHUNK_ROWS:
                        yield flush()
    if buf:
        yield flush()


def unwrap_content(df: DataFrame,
                   keep: tuple[str, ...] = ()) -> DataFrame:
    """JVM-side base64 unwrap of the blob column (whole-stage codegen):
    binary blobs arrive base64-encoded in the string content column
    (the repo-table contract), and decoding them before the Arrow hop
    ships raw bytes — ~25% less transfer for binary formats and zero
    Python-side base64 work. The magic-byte gate mirrors
    ``decode_content``: only payloads that decode to a CFB/ZIP
    signature are treated as base64; everything else crosses as its
    UTF-8 bytes and takes the text path unchanged. ``keep``: extra
    columns to carry through (e.g. lineage/bucket columns)."""
    from ..extract import CFB_MAGIC, ZIP_MAGIC

    cols = [c for c in ("repo", "path", "commit", "lang", "content")
            if c in df.columns] + [c for c in keep if c in df.columns]
    out = df.select(*cols)
    if "content" in cols:
        raw = F.try_to_binary(F.trim(F.col("content")), F.lit("base64"))
        is_wb = ((F.substring(raw, 1, 8) == F.lit(CFB_MAGIC))
                 | (F.substring(raw, 1, 4) == F.lit(ZIP_MAGIC)))
        unwrapped = (F.when(raw.isNotNull() & is_wb, raw)
                     .otherwise(F.col("content").cast("binary"))
                     .alias("content"))
        out = out.select(*[F.col(c) for c in cols if c != "content"],
                         unwrapped)
    return out


def extract_files(df: DataFrame) -> DataFrame:
    """blob rows (repo, path, commit?, lang?, content) -> sheet rows.

    Column pruning: only the needed input columns cross into Arrow;
    base64 unwrap happens JVM-side (see ``unwrap_content``).
    """
    return unwrap_content(df).mapInPandas(_extract_batches,
                                          schema=EXTRACT_SCHEMA)


def with_content_sha(df: DataFrame, col: str = "content_sha256") -> DataFrame:
    """sha256 over the tab-joined rendered cells — the per-row invariant
    (computed JVM-side; stays inside whole-stage codegen)."""
    return df.withColumn(col, F.sha2(F.concat_ws("\t", F.col("cells")), 256))


def expand_types(df: DataFrame, out: str = "type_names") -> DataFrame:
    """Decode the compact per-cell type string back to the reference's
    type-name vector (Types(), grate.go:32-35) as array<string>."""
    mapping = F.create_map(*[
        x for ch, name in TYPE_NAMES.items()
        for x in (F.lit(ch), F.lit(name))])
    return df.withColumn(
        out, F.transform(F.split(F.col("types"), ""),
                         lambda c: F.element_at(mapping, c)))
