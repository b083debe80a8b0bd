"""Corpus curation — the composite training-data pipeline query:
language gate → length gate → lexical-diversity gate → exact-dup
representative gate, each doc labeled with the FIRST failing reason
(or 'kept'). This is the end-to-end flow the individual operators in
textstats/dedup exist for, expressed as ONE plan with a single
shuffle (the duplicate-cluster window on md5(text)); everything else
is codegen projections fused into the scan.

Gates (deterministic, integer-exact so the oracle matches bit-for-bit):
  lang         predicted language (marker-word argmax) must be 'en'
  too_short    n_tokens < MIN_TOKENS
  low_diversity distinct-token ratio ×1000 < MIN_DIVERSITY_X1000
  duplicate    not the min-doc_id representative of its md5 cluster
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .textstats import LANG_MARKERS

MIN_TOKENS = 10
MIN_DIVERSITY_X1000 = 150
KEEP_LANG = "en"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", F.split("text", " ").alias("w")
    )
    structs = []
    for lang in sorted(LANG_MARKERS):
        inlist = ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
        structs.append(
            F.struct(
                F.expr(f"size(filter(w, x -> x in ({inlist})))").alias("s"),
                F.lit(lang).alias("l"),
            )
        )
    n = F.size("w")
    feat = docs.select(
        "doc_id",
        F.array_max(F.array(*structs)).getField("l").alias("lang_pred"),
        n.cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct("w")) * 1000 / n)
        .cast("bigint")
        .alias("diversity_x1000"),
        F.md5("text").alias("fp"),
    )
    wnd = Window.partitionBy("fp")
    feat = feat.withColumn("cluster_id", F.min("doc_id").over(wnd))
    reason = (
        F.when(F.col("lang_pred") != KEEP_LANG, "lang")
        .when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("diversity_x1000") < MIN_DIVERSITY_X1000, "low_diversity")
        .when(F.col("doc_id") != F.col("cluster_id"), "duplicate")
        .otherwise("kept")
    )
    return feat.select(
        "doc_id", "lang_pred", "n_tokens", "diversity_x1000",
        "cluster_id", reason.alias("reason"),
    )


def _curate_oracle_sql() -> str:
    scores = ",\n         ".join(
        "len(list_filter(w, x -> x IN ("
        + ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"))) AS sc_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    structs = ", ".join(f"(sc_{lang}, '{lang}')" for lang in sorted(LANG_MARKERS))
    return f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
scored AS (
  SELECT doc_id, text, w, {scores} FROM base
),
feat AS (
  SELECT doc_id,
         list_max([{structs}])[2] AS lang_pred,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) * 1000 // len(w) AS BIGINT) AS diversity_x1000,
         min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id
  FROM scored
)
SELECT doc_id, lang_pred, n_tokens, diversity_x1000, cluster_id,
       CASE WHEN lang_pred != '{KEEP_LANG}' THEN 'lang'
            WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
            WHEN diversity_x1000 < {MIN_DIVERSITY_X1000} THEN 'low_diversity'
            WHEN doc_id != cluster_id THEN 'duplicate'
            ELSE 'kept' END AS reason
FROM feat
"""


def queries():
    return {"corpus_curate": corpus_curate}


def oracles():
    return {"corpus_curate": _curate_oracle_sql()}
