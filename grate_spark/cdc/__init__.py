"""CDC / incremental-ingest engine layer.

The reference (pbnjay/grate) is a single-process extraction library; this
package supplies the engine the north rule requires around it: a change-
event log tail, exactly-once key-partitioned MERGE/upsert into lake
tables, schema evolution, checkpoint/resume with per-partition lineage,
and ingest metrics.

Modules:
- ``lake``     transactional multi-table lake over parquet (atomic
               manifest commits — the sandbox stand-in for an Iceberg
               catalog; same commit semantics, swap-in point documented)
- ``events``   deterministic change-event generators (fixtures + synthetic)
- ``pipeline`` the replay loop: offset-bounded scan -> filter -> extract
               -> latest-per-key -> MERGE + checkpoint + metrics
- ``bench``    replay throughput harness used by bench.py
"""
