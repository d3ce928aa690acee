"""grate_spark: a PySpark-native CDC/extraction analytics engine.

Tails a change-event log over a source-code-repository table, extracts
tabular artifacts (.xls/.xlsx/.csv/.tsv) inside vectorized Arrow UDFs,
and applies keyed MERGE/upserts into versioned lake tables with
exactly-once semantics, schema evolution, checkpoints, and metrics.

Capability reference: pbnjay/grate (format semantics); architecture is
Spark-first (DataFrame/Catalyst; Python only inside Arrow UDF batches).
"""

__version__ = "0.1.0"
