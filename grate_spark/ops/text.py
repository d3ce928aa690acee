"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions (regexp_count / split / higher-order
functions) with exact DuckDB oracle equivalents — single scan, one
map-side projection each, aggregation only where the query asks for
rollups. At 100 TB these are the cheap per-document feature passes that
run fused with the extraction scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import md5_bigint_expr, md5_bigint_sql, word_shingles_expr, \
    word_shingles_sql
from ..queries_util import spread, table

SAMPLE_DOCS = 60

# language -> marker-token regex (n-gram heuristic: function words).
# The synthetic corpus is English-ish for every lang label, so accuracy
# is reported, not asserted — the operator is the mechanism.
LANG_MARKERS = {
    "en": r"\b(the|a|of|and|to|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|ne)\b",
    "es": r"\b(el|la|los|y|es|no)\b",
    "zh": r"(的|是|了|在|和)",
}
_LANGS = sorted(LANG_MARKERS)  # deterministic tie order


def langid_predictions(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    scores = [F.regexp_count("text", F.lit(LANG_MARKERS[lg]))
              .alias(f"score_{lg}") for lg in _LANGS]
    scored = docs.select("doc_id", F.col("lang").alias("lang_actual"),
                         *scores)
    # argmax with deterministic ties: first lang (sorted) with max score
    best = F.greatest(*[F.col(f"score_{lg}") for lg in _LANGS])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lg}") == best, F.lit(lg))
          for lg in _LANGS])
    return (scored.withColumn("lang_pred", pred)
            .withColumn("correct",
                        (F.col("lang_pred") == F.col("lang_actual"))
                        .cast("int"))
            .select("doc_id", "lang_actual", "lang_pred", "correct",
                    *[f"score_{lg}" for lg in _LANGS])
            .filter(F.col("doc_id") < SAMPLE_DOCS)
            .orderBy("doc_id"))


def _langid_sql() -> str:
    score_defs = ",\n       ".join(
        f"len(regexp_extract_all(text, '{LANG_MARKERS[lg]}')) "
        f"AS score_{lg}" for lg in _LANGS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in _LANGS) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} THEN '{lg}'" for lg in _LANGS) \
        + " END"
    cols = ", ".join(f"score_{lg}" for lg in _LANGS)
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_actual,
       {score_defs}
  FROM documents
)
SELECT doc_id, lang_actual, {pred} AS lang_pred,
       CAST(({pred}) = lang_actual AS INT) AS correct, {cols}
FROM scored WHERE doc_id < {SAMPLE_DOCS}
ORDER BY doc_id
"""


LANGID_PREDICTIONS_SQL = _langid_sql()


def quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality features + composite score per doc, rolled up
    by lang (length, mean word length, stopword ratio, punct ratio).
    The scan is spread first: the sf tables are single-row-group files
    (one scan task), and the per-row regexes are the cost."""
    docs = spread(table(spark, sf, "documents"))
    n_tokens = F.size(F.split("text", " "))
    n_stop = F.regexp_count("text", F.lit(r"\b(the|a|of|and|to|in)\b"))
    n_punct = F.regexp_count("text", F.lit(r"[.,;:!?]"))
    feats = docs.select(
        "doc_id", "lang",
        F.col("n_chars").alias("len_chars"),
        n_tokens.alias("n_tokens"),
        ((F.col("n_chars") - n_tokens + 1) / n_tokens.cast("double"))
        .alias("mean_word_len"),
        (n_stop / n_tokens.cast("double")).alias("stopword_ratio"),
        (n_punct / F.col("n_chars").cast("double")).alias("punct_ratio"))
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.2)

    def r4(c):
        # explicit half-up at 4 decimals: identical in both engines
        # (round() half-way semantics differ between Spark and DuckDB)
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (feats.withColumn("quality", score)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 r4(F.avg("quality")).alias("avg_quality"),
                 r4(F.avg("mean_word_len")).alias("avg_word_len"),
                 r4(F.avg("stopword_ratio")).alias("avg_stop"))
            .orderBy("lang"))


QUALITY_SCORES_SQL = r"""
WITH feats AS (
  SELECT doc_id, lang, n_chars AS len_chars,
         len(str_split(text, ' ')) AS n_tokens,
         (n_chars - len(str_split(text, ' ')) + 1)
           / CAST(len(str_split(text, ' ')) AS DOUBLE) AS mean_word_len,
         len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b'))
           / CAST(len(str_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
         len(regexp_extract_all(text, '[.,;:!?]'))
           / CAST(n_chars AS DOUBLE) AS punct_ratio
  FROM documents
), q AS (
  SELECT *,
         least(n_tokens / 100.0, 1.0) * 0.5
           + least(stopword_ratio * 5, 1.0) * 0.3
           + (1 - least(punct_ratio * 10, 1.0)) * 0.2 AS quality
  FROM feats
)
SELECT lang, count(*) AS n_docs,
       floor(avg(quality) * 10000 + 0.5) / 10000 AS avg_quality,
       floor(avg(mean_word_len) * 10000 + 0.5) / 10000 AS avg_word_len,
       floor(avg(stopword_ratio) * 10000 + 0.5) / 10000 AS avg_stop
FROM q GROUP BY lang ORDER BY lang
"""


def token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword pieces (letter runs / digit
    runs / single other chars) per doc, rolled up by source. Spread
    first: single-row-group scan, regex-per-row cost (see
    quality_scores)."""
    docs = spread(table(spark, sf, "documents"))
    ws = F.size(F.split("text", " "))
    bpe = F.regexp_count("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
    return (docs.select("source", ws.alias("ws_tokens"),
                        bpe.alias("bpe_pieces"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("ws_tokens").alias("total_ws_tokens"),
                 F.sum("bpe_pieces").alias("total_bpe_pieces"))
            .orderBy("source"))


TOKEN_COUNTS_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(sum(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS total_bpe_pieces
FROM documents GROUP BY source ORDER BY source
"""


def doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling word-3-gram fingerprint: the minimum shingle hash is the
    document's content fingerprint (winnowing's selection rule with one
    global window); identical-content docs collide exactly."""
    docs = (table(spark, sf, "documents")
            .withColumn("toks", F.split("text", " "))
            .filter(F.size("toks") >= 3)
            .withColumn("shingles",
                        F.expr(word_shingles_expr("toks", 3,
                                                  from_tokens=True))))
    fp = F.expr(f"array_min(transform(shingles, s -> "
                f"{md5_bigint_expr('s', 'fp')}))")
    return (docs.select("doc_id", fp.alias("fingerprint"))
            .filter(F.col("doc_id") < SAMPLE_DOCS)
            .orderBy("doc_id"))


DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       list_min(list_transform({word_shingles_sql('text', 3)},
                s -> {md5_bigint_sql('s', 'fp')})) AS fingerprint
FROM documents
WHERE len(str_split(text, ' ')) >= 3 AND doc_id < {SAMPLE_DOCS}
ORDER BY doc_id
"""
