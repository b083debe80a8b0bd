"""Text-analysis operators: token counting, quality scoring, language
ID heuristic, document fingerprinting — all narrow projections (no
shuffle except the final agg-free scan), JVM-side only.

At 10^12 docs these are the cheapest pipeline stages: pure map
operators that fuse into the parquet scan under whole-stage codegen,
with column pruning keeping the scan at (doc_id, text).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# marker-word sets for the n-gram/stopword language-ID heuristic; the
# corpus is synthetic English-ish CS text, so the discriminative power
# is in the tie-break — the point is the operator shape (argmax over
# per-language marker hit counts), which is what a real lang-ID does
LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "und", "nicht"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "y"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (4-char pieces,
    ceil(len/4) per token — a deterministic stand-in for a tokenizer's
    piece count that stays SQL-exact)."""
    docs = _docs(spark, sf_dir)
    w = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct"),
        F.expr(
            "aggregate(split(text, ' '), 0L, (acc, x) -> acc + CAST(ceil(length(x) / 4.0) AS LONG))"
        ).alias("n_subwords"),
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(list_sum([CAST(ceil(length(x) / 4.0) AS BIGINT)
                      for x in string_split(text, ' ')]) AS BIGINT) AS n_subwords
FROM documents
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean token length ×100 (integer-exact),
    stopword hits, distinct-token ratio ×1000 (integer-exact). Ratios
    are emitted as integer-scaled values so the oracle comparison
    never depends on float formatting."""
    docs = _docs(spark, sf_dir)
    w = F.split("text", " ")
    n = F.size(w)
    stop_hits = F.size(
        F.expr(
            "filter(split(text, ' '), x -> x in ("
            + ",".join(f"'{s}'" for s in STOPWORDS)
            + "))"
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        n.cast("bigint").alias("n_tokens"),
        ((F.length("text") - (n - 1)) * 100 / n).cast("bigint").alias("mean_tok_len_x100"),
        stop_hits.cast("bigint").alias("stop_hits"),
        (F.size(F.array_distinct(w)) * 1000 / n).cast("bigint").alias("distinct_ratio_x1000"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST((length(text) - (len(w) - 1)) * 100 // len(w) AS BIGINT) AS mean_tok_len_x100,
       CAST(len(list_filter(w, x -> x IN ({",".join(f"''{s}''" for s in STOPWORDS)})))
            AS BIGINT) AS stop_hits,
       CAST(len(list_distinct(w)) * 1000 // len(w) AS BIGINT) AS distinct_ratio_x1000
FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
""".replace("''", "'")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax over per-language marker-word hit counts; deterministic
    lexicographic tie-break."""
    docs = _docs(spark, sf_dir)
    score_cols = []
    for lang, marks in sorted(LANG_MARKERS.items()):
        inlist = ",".join(f"'{m}'" for m in marks)
        score_cols.append(
            F.expr(f"size(filter(split(text, ' '), x -> x in ({inlist})))").alias(
                f"sc_{lang}"
            )
        )
    scored = docs.select("doc_id", *score_cols)
    structs = [
        F.struct(F.col(f"sc_{lang}").alias("s"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.array_max(F.array(*structs))
    return scored.select(
        "doc_id",
        best.getField("l").alias("lang_pred"),
        best.getField("s").cast("bigint").alias("score"),
    )


def _lang_id_sql() -> str:
    scores = ",\n       ".join(
        "len(list_filter(w, x -> x IN ("
        + ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"))) AS sc_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    # argmax with (score, lang) max — lexicographically larger lang
    # wins ties, matching Spark's struct array_max ordering
    structs = ", ".join(f"(sc_{lang}, '{lang}')" for lang in sorted(LANG_MARKERS))
    return f"""
WITH scored AS (
  SELECT doc_id, {scores}
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
best AS (
  SELECT doc_id, list_max([{structs}]) AS b FROM scored
)
SELECT doc_id, b[2] AS lang_pred, CAST(b[1] AS BIGINT) AS score FROM best
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    md5 → 16-hex prefix (the rolling-hash analog as one digest)."""
    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select(
        "doc_id", F.substring(F.md5(norm), 1, 16).alias("fp16")
    )


FINGERPRINT_SQL = r"""
SELECT doc_id, substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp16
FROM documents
"""


def queries():
    return {
        "token_count": token_count,
        "text_quality": text_quality,
        "lang_id": lang_id,
        "text_fingerprint": fingerprint,
    }


def oracles():
    return {
        "token_count": TOKEN_COUNT_SQL,
        "text_quality": TEXT_QUALITY_SQL,
        "lang_id": _lang_id_sql(),
        "text_fingerprint": FINGERPRINT_SQL,
    }
