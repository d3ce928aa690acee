"""Changelog consumer: keep a downstream table in sync via changes().

The CDC-out half of the lake contract [Iceberg: a CDF/incremental-scan
consumer; Delta: MERGE driven by table_changes]: a downstream lake (a
serving copy, a derived store, another region) polls the upstream
changelog and applies the delta — cost O(delta), never O(table), both
on the read side (``LakeCatalog.changes`` unions only the files the
polled commits added) and on the write side (one MoR merge of the
delta's keys).

Consumer checkpointing rides the DOWNSTREAM lake's own transactional
checkpoint map (key ``sync:<table>`` -> last upstream version), so the
delta apply and the cursor advance commit atomically: a crashed
consumer re-polls the same window and the MoR merge re-applies it
idempotently (same rows, same keys — latest-wins makes the replay a
no-op for converged keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .lake import LakeCatalog


def sync_from_changes(src: LakeCatalog, dst: LakeCatalog,
                      name: str, dst_name: str | None = None,
                      n_buckets: int = 32,
                      on_non_incremental: str = "raise") -> dict:
    """Poll upstream ``name`` and apply everything committed since the
    last sync to ``dst_name`` (default: same name). Returns stats.

    Per-key resolution inside the window: the LAST commit touching a
    key wins wholesale (a merge re-extracts a key's full row set, and
    a delete emits the key with no rows), so the whole window applies
    as ONE exactly-once MoR merge — no per-version replay loop.

    ``on_non_incremental``: what to do when the window has no
    row-level incremental form — a wholesale `replace` commit (no
    delta exists) or a window mixing append and merge ops on one table
    (no single idempotent apply order). ``"raise"`` (default)
    propagates the error; ``"recopy"`` falls back to replacing the
    downstream table with the upstream snapshot AS OF the polled
    version (pinned, so racing upstream commits stay ahead of the
    advanced cursor and apply on the next poll) — always
    consistent, cost O(table) (the documented price of a replace; the
    Iceberg/Delta CDF contract is the same: snapshot-replacing commits
    force consumers to re-read).
    """
    dst_name = dst_name or name
    ckpt_key = f"sync:{dst_name}"
    from_v = int(dst.checkpoint().get(ckpt_key, 0))
    to_v = src.current_version()
    if to_v <= from_v:
        return {"applied": False, "from_version": from_v,
                "to_version": from_v, "n_keys": 0}

    src_t = src.manifest()["tables"].get(name)
    if src_t is None:
        raise KeyError(f"sync: no such upstream table {name!r}")
    key_cols = list(src_t["key_cols"])

    def _recopy() -> dict:
        # pin the snapshot to to_v: reading the live manifest would let
        # an upstream commit racing the recopy land rows the cursor
        # hasn't covered, and the next poll would apply them twice
        # (append windows would then hold duplicates forever)
        rows = src.read(name, manifest=src.manifest_at(to_v))
        n = rows.count()
        txn = dst.begin()
        txn.create_or_replace(dst_name, rows, tuple(key_cols),
                              n_buckets=n_buckets)
        txn.set_checkpoint({ckpt_key: to_v})
        txn.commit()
        return {"applied": True, "from_version": from_v,
                "to_version": to_v, "n_keys": n, "recopied": True}

    # op kinds come from the manifests' op journal (driver-side JSON,
    # zero Spark scans) — the apply strategy is decided BEFORE any
    # plan is built or data file is touched
    kinds = src.window_op_kinds(name, from_v, to_v)
    if "replace" in kinds or {"merge", "append"} <= kinds:
        # no single idempotent incremental form: a wholesale replace
        # has no row-level delta, and a window mixing append + merge
        # ops on one table has no consistent one-shot apply order
        if on_non_incremental == "recopy":
            return _recopy()
        raise ValueError(
            f"sync: window v({from_v}, {to_v}] holds "
            f"{sorted(kinds)} ops on {name!r} — no incremental form; "
            "sync each commit range separately (or pass "
            "on_non_incremental='recopy')")
    delta = src.changes(name, from_v, to_v)

    # append-only tables accumulate rows per key upstream (and write no
    # markers), so folding their 'insert' changes into a last-commit-
    # wins MoR merge would keep only the newest append per key and
    # silently diverge. Inserts replay as an append instead.
    if kinds == {"append"}:
        rows = delta.drop("_change_type", "_commit_version")
        n_rows = rows.count()
        txn = dst.begin()
        txn.append(dst_name, rows, key_cols=tuple(key_cols),
                   n_buckets=n_buckets)
        txn.set_checkpoint({ckpt_key: to_v})
        txn.commit()
        return {"applied": True, "from_version": from_v,
                "to_version": to_v, "n_keys": n_rows}

    # last-writer-wins per key across the window: keep only each key's
    # rows from its newest _commit_version (one aggregation + one
    # co-keyed join, both delta-sized)
    last = (delta.groupBy(*key_cols)
            .agg(F.max("_commit_version").alias("_commit_version")))
    winners = delta.join(last, key_cols + ["_commit_version"], "inner")

    new_rows = (winners.filter(F.col("_change_type") != "delete")
                .drop("_change_type", "_commit_version"))
    all_keys = winners.select(*key_cols).distinct()
    n_keys = all_keys.count()

    txn = dst.begin()
    txn.merge_replace_keys(dst_name, new_rows, all_keys,
                           tuple(key_cols), n_buckets=n_buckets)
    txn.set_checkpoint({ckpt_key: to_v})
    txn.commit()
    return {"applied": True, "from_version": from_v,
            "to_version": to_v, "n_keys": n_keys}
