"""Post-extraction transforms: the grate2tsv-analog row/cell operators
and typed Scan views — all pure Catalyst expressions (no UDFs).

- ``drop_blank_rows``    grate2tsv -b: drop rows whose every cell is ""
                         (cmd/grate2tsv/main.go:40,233-249)
- ``sanitize_cells``     grate2tsv -r/-w: collapse [ \\n\\r\\t]+ to one
                         space and trim, per cell
                         (cmd/grate2tsv/main.go:38-39,161-164)
- ``typed_column``       the Scan operator (grate.go:40-44): extract one
                         cell position as bool/int64/float64/string/
                         timestamp with the reference's parse semantics
                         (simple/simple.go:74-108)
- ``non_empty_sheets``   IsEmpty filter analog (commonxl/sheet.go:225)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 24-literal bool table (commonxl/cell.go:111-116)
_TRUE_LITERALS = ("true", "t", "yes", "y", "1", "on")
_FALSE_LITERALS = ("false", "f", "no", "n", "0", "off")


def drop_blank_rows(rows: DataFrame) -> DataFrame:
    """Keep rows with at least one non-empty cell (default-on in the
    reference batch pipeline; off for golden parity)."""
    return rows.filter(F.exists("cells", lambda x: x != ""))


def sanitize_cells(rows: DataFrame, col: str = "cells") -> DataFrame:
    """Whitespace-collapse + trim every cell (I24)."""
    return rows.withColumn(
        col,
        F.transform(col, lambda x: F.trim(
            F.regexp_replace(x, r"[ \n\r\t]+", " "))))


# strict-Scan tag acceptance per target (commonxl/sheet.go:178-222:
# the runtime cell type must equal the scan target). All string-valued
# cell shapes satisfy *string: plain 's', hyperlink 'h', merged-static
# 'm', and blank ' ' (a BlankCell's Value() is "" — commonxl/cell.go:
# 58-63, 254-261).
_STRICT_TAGS = {"bool": "b", "int": "i", "float": "f",
                "timestamp": "d", "string": "shm "}


def typed_column(rows: DataFrame, position: int, target: str,
                 out: str = "value", strict: bool = False) -> DataFrame:
    """Scan one 1-based cell position into a typed column.

    ``target``: bool | int | float | string | timestamp.

    Default (lenient) mode is the `simple` Scan (simple/simple.go:
    74-108): values are parsed from the rendered string; parse failures
    are NULL; the bool literal table matches the reference.

    ``strict=True`` is the `commonxl` Scan (commonxl/sheet.go:178-222):
    the CELL TYPE must match the target. A mismatch — including a
    position past the row's width — sets ``<out>_mismatch`` true and
    yields a NULL value (the row-level analog of the reference's scan
    error), so a user porting strict-Scan code sees the mismatch
    instead of a silent NULL.
    """
    if target not in _STRICT_TAGS:
        raise ValueError(
            f"typed_column: unsupported target {target!r}; expected one "
            f"of {sorted(_STRICT_TAGS)} (grate.go:40-44 scan targets)")
    cell = F.try_element_at("cells", F.lit(position))
    if target == "bool":
        low = F.lower(cell)
        typed = (F.when(low.isin(*_TRUE_LITERALS), F.lit(True))
                 .when(low.isin(*_FALSE_LITERALS), F.lit(False)))
    elif target == "int":
        typed = cell.try_cast("bigint")
    elif target == "float":
        typed = cell.try_cast("double")
    elif target == "timestamp":
        typed = cell.try_cast("timestamp")
    else:
        typed = cell
    df = rows.withColumn(out, typed)
    if strict:
        tag = F.substring("types", F.lit(position), F.lit(1))
        allowed = list(_STRICT_TAGS.get(target, ""))
        ok = (F.length(tag) == 1) & tag.isin(*allowed)
        df = (df.withColumn(out + "_mismatch", ~F.coalesce(ok,
                                                           F.lit(False)))
              .withColumn(out, F.when(ok, F.col(out))))
    return df


def non_empty_sheets(rows: DataFrame) -> DataFrame:
    """Drop sheets that are empty per the reference rule: a sheet whose
    grid is at most 1x1 (grate2tsv skips them)."""
    stats = (rows.groupBy("repo", "path", "sheet")
             .agg(F.max(F.size("cells")).alias("_w"),
                  F.count("*").alias("_h")))
    keep = stats.filter((F.col("_w") > 1) | (F.col("_h") > 1)) \
        .select("repo", "path", "sheet")
    return rows.join(F.broadcast(keep), ["repo", "path", "sheet"])
