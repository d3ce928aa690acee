"""Training-data pipeline operators over the documents/embeddings tables.

Engine-layer additions beyond the reference (which is a file-extraction
library): the operations a large-scale training-data pipeline needs —
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search (brute-force cosine, IVF-bucketed ANN), text analysis (language
ID, quality scoring, token counting, fingerprinting), and multimodal
binary-column plumbing.

Every operator is expressed with Catalyst-evaluable built-ins (higher-
order array functions, window, joins) so plans stay in whole-stage
codegen; the only Python is the multimodal Arrow UDF. BMP/PNG/WAV
decode is real (pure-stdlib, operators/media_codecs.py); codec-library
formats (JPEG/MP3/video) stay stubbed — those libs are absent here. Cross-engine determinism for the DuckDB oracles comes from one
shared hash primitive: ``bigint(hex(md5(seed|value))[0:15])``, identical
in Spark (`conv`) and DuckDB (`'0x' cast`).
"""

from pyspark.sql import functions as F


def md5_bigint_expr(value_sql: str, seed: int | str) -> str:
    """Spark SQL: 60-bit deterministic hash of a string expression."""
    return (f"cast(conv(substring(md5(concat('{seed}|', {value_sql})),"
            f"1,15),16,10) as bigint)")


def md5_bigint_sql(value_sql: str, seed: int | str) -> str:
    """DuckDB SQL: the identical 60-bit hash."""
    return (f"CAST(('0x' || substr(md5('{seed}|' || {value_sql}),1,15)) "
            f"AS BIGINT)")


def word_shingles_expr(text_col: str, n: int = 3,
                       from_tokens: bool = False) -> str:
    """Spark SQL: word n-gram shingle array.

    Pass ``from_tokens=True`` with a TOKENS-array column name when the
    caller has already split the text — inlining ``split()`` into the
    lambda would re-split the text once per token reference (O(words^2)
    per document; measured 2x on the whole minhash pipeline).
    """
    toks = text_col if from_tokens else f"split({text_col}, ' ')"
    concat = "concat(" + ", ' ', ".join(f"{toks}[i+{j}]"
                                        for j in range(n)) + ")"
    # NB callers must filter size(tokens) >= n first: Spark's sequence()
    # counts DOWN when stop < start, unlike DuckDB's empty range()
    return (f"transform(sequence(0, size({toks})-{n}), "
            f"i -> {concat})")


def word_shingles_sql(text_col: str, n: int = 3,
                      from_tokens: bool = False) -> str:
    """DuckDB SQL: the identical shingle array (1-based lists)."""
    toks = text_col if from_tokens else f"str_split({text_col}, ' ')"
    concat = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (f"list_transform(range(1, len({toks})-{n - 2}), "
            f"i -> {concat})")
