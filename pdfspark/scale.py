"""Scale mechanics: explicit skew salting, checkpoint/lineage tables,
resumable bucketed execution (SURVEY.md §4.2, north_rule).

Three thin app-level pieces ride on built-in Spark (everything else is
AQE + Arrow + Catalyst; no custom rules):

1. ``salt_by_size`` — AQE skew handling does NOT cover UDF stages, so
   large-PDF skew in the mapInPandas extract stage is handled with an
   explicit (size_class, salt) repartition: a handful of 100 MB docs
   must not serialize one task (SURVEY §4.2(a)).
2. ``lineage`` table — per-bucket checkpoint/metrics rows
   (FIXTURES.md §5): (bucket, status, doc_count, bytes_in, spans_out,
   wall_ms, attempt).
3. ``run_checkpointed`` — bucket-granular commit + resume: an
   interrupted run reprocesses only buckets without a 'done' lineage
   row (resume = anti-join of pending vs completed; kill-and-rerun is
   tested in tests/test_scale.py).

Iceberg: the north rule targets Iceberg tables; this sandbox has no
Iceberg jars on the classpath (import-gated below), so the warehouse
falls back to directory-partitioned parquet with identical layout and
commit granularity. On a real cluster set
``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` and
``USE_ICEBERG=1`` — the write paths switch to ``writeTo(...).append()``.
"""

from __future__ import annotations

import os
import tempfile
import time
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return os.environ.get("USE_ICEBERG", "0") == "1"
    except Exception:
        return False


def append_table(df: DataFrame, spark: SparkSession, target: str, partition_col: str) -> None:
    """Sink dispatch: Iceberg `writeTo(...).append()` when the catalog
    is on the classpath (real cluster), identical-layout partitioned
    parquet otherwise (this sandbox). `target` is a table name in the
    Iceberg case, a directory path in the parquet case."""
    if have_iceberg(spark):
        df.writeTo(target).append()
    else:
        df.write.mode("append").partitionBy(partition_col).parquet(target)


def overwrite_partitions(
    df: DataFrame, spark: SparkSession, target: str, partition_col: str
) -> None:
    """Idempotent per-partition commit: only the partitions present in
    `df` are replaced; everything else is untouched. This is the write
    mode for retryable units of work — a retried bucket REPLACES its
    partition instead of appending duplicates (Iceberg
    `overwritePartitions()`; parquet dynamic partition overwrite)."""
    if have_iceberg(spark):
        df.writeTo(target).overwritePartitions()
    else:
        sess = df.sparkSession
        prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(partition_col).parquet(target)
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


# ---------------------------------------------------------------------------
# 1. Skew salting
# ---------------------------------------------------------------------------


def salt_spans_by_size(
    spans_df: DataFrame,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 4096,
) -> DataFrame:
    """Skew-salt BEFORE the expensive UDF stages, using the spans
    array itself as the size proxy (payload bytes are linear in total
    span text). Shuffling here moves the small spans rows — not the
    generated payload bytes — and both generation and extraction then
    run pipelined in ONE stage with no further exchange (measured
    2.3× faster than salting the payload stream between them).

    size_class = log4 bucket of the total text length; salt spreads
    same-class docs. At 1000 executors this is the only shuffle in the
    whole extraction pipeline.

    Partition count: data-driven at scale (≈ input_bytes / 128 MB,
    which at 100 TB is tens of thousands of partitions ≫ cores, so
    waves amortize stragglers). At bench scale that formula resolves
    to ≈ one task per core, which measurement confirms is fastest —
    size_class co-location keeps waves homogeneous, so extra waves
    only add scheduling overhead."""
    sc = spans_df.sparkSession.sparkContext
    n = num_partitions or max(sc.defaultParallelism, 8)
    if "text" in spans_df.columns:
        # r9: synth_spans_df keeps the source text column, and the
        # spans aggregate below is a closed form of the text length
        # (see salt_docs_by_size — same k/est identity, pinned by the
        # synthesis-lockstep tests). Computing est from text lets
        # Catalyst prune the struct synthesis out of plans whose
        # downstream consumers (generate_payloads text path) never
        # read `spans`; size_class/salt and hence the partitioning are
        # IDENTICAL either way.
        k = "CAST(ceil(length(text) / 80.0) AS BIGINT)"
        est = F.expr(f"length(text) + 64L * {k} + 96L * ({k} DIV 3)")
    else:
        est = F.expr(
            "aggregate(spans, 0L, (acc, s) -> acc + coalesce(length(s.text), 32L) + 64L)"
        )
    salted = spans_df.withColumn(
        "size_class",
        F.floor(F.log2(F.greatest(est, F.lit(2))) / 2).cast("int"),
    ).withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
    return salted.repartition(n, "size_class", "salt").drop("salt", "size_class")


def salt_docs_by_size(
    docs_df: DataFrame,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 4096,
) -> DataFrame:
    """Text-frame twin of :func:`salt_spans_by_size` (r9, guide §4:
    ship only the columns the Python stage needs). The span synthesis
    is deterministic in ``text`` (engine._SPANS_EXPR ==
    codec.synth_spans_py), so the per-doc size estimate — and with it
    size_class, salt, and the resulting partitioning — is computed
    CLOSED-FORM from the text length instead of materializing the
    spans array first:

        k       = ceil(len/CHUNK)            text chunks
        n_media = k div 3                    media spans (i%3==2)
        est     = len + 64·k + (32+64)·n_media

    which is exactly aggregate(spans, acc + coalesce(length(text),32)
    + 64) over the synthesized spans. Same shuffle, ~4× fewer bytes
    (no struct array), and the generate stage synthesizes spans
    in-Python from the text it already holds."""
    sc = docs_df.sparkSession.sparkContext
    n = num_partitions or max(sc.defaultParallelism, 8)
    k = "CAST(ceil(length(text) / 80.0) AS BIGINT)"
    est = F.expr(f"length(text) + 64L * {k} + 96L * ({k} DIV 3)")
    salted = docs_df.withColumn(
        "size_class",
        F.floor(F.log2(F.greatest(est, F.lit(2))) / 2).cast("int"),
    ).withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
    return salted.repartition(n, "size_class", "salt").drop("salt", "size_class")


def salt_by_size(
    payloads: DataFrame,
    num_partitions: Optional[int] = None,
    salt_buckets: int = 4096,
) -> DataFrame:
    """Repartition the payload stream on (size_class, salt) ahead of
    the extract UDF stage.

    size_class is a log4 size bucket computed at generation time;
    hashing (size_class, salt) spreads same-class docs evenly, so a skewed
    tail of huge documents fans out across tasks instead of landing in
    one. At 1000 executors, num_partitions ≈ 2-3× total cores; locally
    AQE re-coalesces small outputs afterwards.
    """
    sc = payloads.sparkSession.sparkContext
    n = num_partitions or max(sc.defaultParallelism * 3, 8)
    # salt cardinality must be ≫ partition count: with only a handful
    # of distinct (size_class, salt) keys, hash partitioning goes
    # Poisson-lumpy and single partitions straggle
    salted = payloads.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )
    return salted.repartition(n, "size_class", "salt").drop("salt")


# ---------------------------------------------------------------------------
# 2 + 3. Lineage + resumable bucketed run
# ---------------------------------------------------------------------------

LINEAGE_SCHEMA = (
    "bucket int, status string, doc_count long, bytes_in long, "
    "spans_out long, wall_ms long, attempt int"
)


def _has_lineage(lineage_dir: str) -> bool:
    return os.path.isdir(lineage_dir) and any(
        f.endswith(".parquet") for f in os.listdir(lineage_dir)
    )


def completed_buckets(spark: SparkSession, lineage_dir: str) -> set[int]:
    if not _has_lineage(lineage_dir):
        return set()
    rows = (
        spark.read.parquet(lineage_dir)
        .where(F.col("status") == "done")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r.bucket for r in rows}


def bucket_attempts(spark: SparkSession, lineage_dir: str) -> dict[int, int]:
    """Max attempt recorded per bucket (any status) — the retry
    counter carried into the next run's lineage rows."""
    if not _has_lineage(lineage_dir):
        return {}
    rows = (
        spark.read.parquet(lineage_dir)
        .groupBy("bucket")
        .agg(F.max("attempt").alias("a"))
        .collect()
    )
    return {r.bucket: r.a for r in rows}


def run_checkpointed(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_buckets: int = 8,
    variant: str = "mixed",
    buckets_per_commit: int = 4,
    fail_after: Optional[int] = None,
    fail_before_commit: bool = False,
    replicate: int = 1,
    sink: str = "parquet",
) -> int:
    """Extraction over bucket(doc_id) groups with per-group commit.

    ``sink="null"`` runs the IDENTICAL per-bucket-group loop (same
    corpus scans, bucket filters, salting, generation, extraction,
    same group scheduling) but discards each group's result through
    Spark's noop datasource — no span parquet, no lineage, no
    read-back stats, no resume state. This is the compute-only twin
    used to split compute wall from sink wall in deployment-surface
    scaling runs (BENCH/BASELINE.md).

    Resume semantics: rerunning with the same out_dir skips buckets
    already marked done (anti-join of pending vs lineage). A bucket is
    done only when its lineage row lands; the span data itself is
    written with per-partition OVERWRITE, so a crash in the window
    between the data write and the lineage commit leaves a bucket that
    the next run simply rewrites — no duplicate rows, ever. Returns
    the number of buckets processed THIS run. ``fail_after`` injects a
    crash after N buckets (for the kill-and-rerun test);
    ``fail_before_commit`` moves the injected crash INTO the
    data-written/lineage-pending window to exercise exactly that
    non-atomic gap.
    """
    from .engine import (
        extract, generate_payloads, load_documents, replicate_docs,
        synth_spans_df,
    )

    lineage_dir = os.path.join(out_dir, "lineage")
    data_dir = os.path.join(out_dir, "spans")
    # resume-config guard: a rerun with different corpus-shaping
    # parameters would silently mix scales/variants in the output
    # (completed buckets skip, new buckets run at the new settings) —
    # pin the shape on first run, refuse mismatched resumes
    null_sink = sink == "null"
    cfg = {"replicate": int(replicate), "variant": variant,
           "n_buckets": int(n_buckets),
           # corpus identity: resuming against a different --sf-dir
           # would mix corpora across buckets just as silently as a
           # variant mismatch — pin the realpath too
           "sf_dir": os.path.realpath(sf_dir)}
    cfg_path = os.path.join(out_dir, "_job_config.json")
    if null_sink:
        cfg_path = None  # compute-only: no resume state of any kind
    elif os.path.exists(cfg_path):
        import json as _json

        with open(cfg_path) as f:
            prev_cfg = _json.load(f)
        # pre-r6 sidecars lack sf_dir: compare only the keys they pinned
        chk = {k: v for k, v in cfg.items() if k in prev_cfg}
        if prev_cfg != chk:
            raise ValueError(
                f"resume config mismatch: out_dir was written with "
                f"{prev_cfg}, this run requests {chk} — use a fresh "
                f"--out or repeat the original parameters"
            )
    else:
        import json as _json

        os.makedirs(out_dir, exist_ok=True)
        # temp-file + rename: a crash mid-write must not leave a
        # truncated sidecar that poisons every future resume
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".jobcfg")
        with os.fdopen(fd, "w") as f:
            _json.dump(cfg, f)
        os.replace(tmp, cfg_path)
    done = set() if null_sink else completed_buckets(spark, lineage_dir)
    attempts = {} if null_sink else bucket_attempts(spark, lineage_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    # record that this run is attempting the pending buckets BEFORE
    # doing the work: a crash mid-group leaves 'attempted' rows, so
    # the next run's lineage shows the true attempt count
    if pending and not null_sink:
        spark.createDataFrame(
            [
                (int(b), "attempted", 0, 0, 0, 0, int(attempts.get(b, 0)) + 1)
                for b in pending
            ],
            LINEAGE_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(lineage_dir)
        attempts = {b: attempts.get(b, 0) + 1 for b in pending} | {
            b: a for b, a in attempts.items() if b not in pending
        }
    processed = 0
    for i in range(0, len(pending), buckets_per_commit):
        group = pending[i : i + buckets_per_commit]
        t0 = time.monotonic()
        docs = load_documents(spark, sf_dir)
        if replicate > 1:
            # deterministic in-plan corpus scale-up (scaling/stress
            # runs at the deployment surface — no data files written)
            docs = replicate_docs(docs, replicate)
        docs = docs.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        docs = docs.where(F.col("bucket").isin([int(b) for b in group]))
        spans = synth_spans_df(docs.drop("bucket"))
        payloads = generate_payloads(spans, variant)
        payloads = salt_by_size(payloads)
        extracted = extract(payloads).withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        if null_sink:
            # compute-only twin: the SAME per-group plan (corpus scan,
            # bucket filter, salt, generate, extract) discarded through
            # the noop datasource — no data, no lineage, no read-back
            extracted.write.format("noop").mode("overwrite").save()
            processed += len(group)
            continue
        overwrite_partitions(extracted, spark, data_dir, "bucket")
        if fail_before_commit and fail_after is not None and (
            processed + len(group) >= fail_after
        ):
            raise RuntimeError(
                f"injected failure after data write, before lineage commit "
                f"(buckets {group})"
            )
        # stats come from the data actually committed (read-back of the
        # just-written partitions) — NOT a re-execution of the full
        # generate+extract pipeline, which would double the work
        stats = (
            spark.read.parquet(data_dir)
            .where(F.col("bucket").isin([int(b) for b in group]))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("doc_count"),
                F.sum(F.length(F.to_json("spans"))).alias("bytes_in"),
                F.sum(F.size("spans")).alias("spans_out"),
            )
            .collect()
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage_rows = [
            (int(r.bucket), "done", int(r.doc_count), int(r.bytes_in or 0),
             int(r.spans_out or 0), wall_ms, int(attempts.get(int(r.bucket), 1)))
            for r in stats
        ]
        # empty buckets still need a done row so resume skips them
        seen = {r[0] for r in lineage_rows}
        lineage_rows += [
            (int(b), "done", 0, 0, 0, wall_ms, int(attempts.get(b, 1)))
            for b in group
            if b not in seen
        ]
        spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(lineage_dir)
        processed += len(group)
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return processed
