"""Driver-contract rehearsal: every queries() entry vs its DuckDB oracle.

Mirrors the per-round correctness gate (row count + column names +
order-insensitive values) so mismatches surface locally first.
"""

import datetime as dt
import decimal
import math

import pytest

from tests.conftest import SF_DIR


def _norm(v):
    if v is None:
        return None
    # Tag floats so int vs float mismatches fail here like they fail the
    # driver's raw-value hash (1435 == 1435.0 in Python, but hashes differ).
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return ("f", round(v, 6))
    if isinstance(v, decimal.Decimal):
        return ("f", round(float(v), 6))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def all_queries():
    from grate_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", all_queries())
def test_query_vs_oracle(spark, duck, name):
    from grate_spark.queries import QUERIES

    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    got_cols = sdf.columns
    got_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    want_cols = [d[0] for d in res.description]
    want_rows = res.fetchall()

    got, gcols = _rowset(got_cols, got_rows)
    want, wcols = _rowset(want_cols, want_rows)
    assert gcols == wcols, f"{name}: column mismatch {gcols} vs {wcols}"
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} vs {len(want)}")
    for g, w in zip(got, want):
        assert g == w, f"{name}: row mismatch\n got {g}\nwant {w}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"repo", "path", "sheet", "row_id", "cells",
            "content_sha256", "error"} <= set(df.columns)
    assert all(r.error is None for r in rows)


def test_queries_oracle_keys_align():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10
