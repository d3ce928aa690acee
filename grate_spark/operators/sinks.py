"""File-export sinks: the grate2tsv output analog (SURVEY §2.B18).

The engine's primary sink is the transactional lake (cdc.lake); this
module supplies the reference CLI's artifact layout for interop — one
TSV per (path, sheet) under an md5-bucketed 2-level directory tree
(cmd/grate2tsv/main.go:186-229: ``results/<md5[0:2]>/<md5[2:4]>/``,
"to make our filesystems more responsive").

Spark-first: rows are rendered and laid out with pure Catalyst
expressions; the write is one ``partitionBy`` text write, no driver
loops. At 100 TB you would not use this (object stores don't need
directory fan-out) — it exists for parity and for exporting samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_tsv(rows: DataFrame, out_dir: str,
               drop_blank: bool = True) -> None:
    """Write extraction rows as grate2tsv-style TSV files.

    Layout: ``out_dir/b1=<md5[0:2]>/b2=<md5[2:4]>/name=<path>.<sheet>/``
    with one text part per (path, sheet), rows in row_id order,
    cells tab-joined. ``drop_blank`` mirrors the CLI's default -b flag.
    """
    out = rows.filter(F.col("error").isNull())
    if drop_blank:
        out = out.filter(F.exists("cells", lambda x: x != ""))
    digest = F.md5(F.element_at(F.split(F.col("path"), "/"), -1))
    name = F.concat_ws(".", F.col("path"), F.col("sheet"))
    out = (out.select(
        F.substring(digest, 1, 2).alias("b1"),
        F.substring(digest, 3, 2).alias("b2"),
        F.regexp_replace(name, "[/=]", "_").alias("name"),
        F.col("row_id"),
        F.concat_ws("\t", F.col("cells")).alias("value"))
        .repartition("b1", "b2", "name")
        .sortWithinPartitions("b1", "b2", "name", "row_id")
        .drop("row_id"))
    (out.write.partitionBy("b1", "b2", "name")
        .mode("overwrite").text(out_dir))
