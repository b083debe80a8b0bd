"""Scale mechanics: salting plan shape + checkpoint/lineage resume
(kill-and-rerun must not recompute completed buckets) — north_rule
'resumable from checkpoint with per-partition lineage + metrics'."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE
from pdfspark.engine import generate_payloads, load_documents, synth_spans_df
from pdfspark.scale import completed_buckets, run_checkpointed, salt_by_size


def test_salt_by_size_spreads_partitions(spark):
    docs = load_documents(spark, SF_SMOKE).limit(64)
    payloads = generate_payloads(synth_spans_df(docs), "classic")
    salted = salt_by_size(payloads, num_partitions=8)
    assert salted.rdd.getNumPartitions() == 8
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    # no single partition should hold everything
    assert max(r["count"] for r in sizes) < 64


def test_checkpoint_resume_after_kill(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    # first run crashes after 4 buckets committed
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            spark, SF_SMOKE, out, n_buckets=8, buckets_per_commit=2, fail_after=4
        )
    done_first = completed_buckets(spark, os.path.join(out, "lineage"))
    assert len(done_first) == 4

    # rerun: only the remaining buckets are processed
    n2 = run_checkpointed(spark, SF_SMOKE, out, n_buckets=8, buckets_per_commit=2)
    assert n2 == 4
    done = completed_buckets(spark, os.path.join(out, "lineage"))
    assert done == set(range(8))

    # third run: nothing left to do
    assert run_checkpointed(spark, SF_SMOKE, out, n_buckets=8) == 0

    # output covers every document exactly once
    spans = spark.read.parquet(os.path.join(out, "spans"))
    n_docs = load_documents(spark, SF_SMOKE).count()
    assert spans.select("doc_id").distinct().count() == n_docs
    assert spans.count() == n_docs  # one row per doc

    # lineage metrics are real
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    row = lin.agg(F.sum("doc_count").alias("d"), F.sum("spans_out").alias("s")).first()
    assert row.d == n_docs and row.s > 0


def test_crash_between_data_write_and_lineage_commit(spark, tmp_path):
    """The non-atomic window: span data committed, lineage row not.
    Resume must REWRITE (partition overwrite), not append — exactly
    one row per doc at the end, never duplicates."""
    out = str(tmp_path / "ckpt_window")
    with pytest.raises(RuntimeError, match="before lineage commit"):
        run_checkpointed(
            spark, SF_SMOKE, out, n_buckets=8, buckets_per_commit=2,
            fail_after=2, fail_before_commit=True,
        )
    # the crashed group's data IS on disk but its lineage row is not
    done_first = completed_buckets(spark, os.path.join(out, "lineage"))
    assert len(done_first) == 0
    assert spark.read.parquet(os.path.join(out, "spans")).count() > 0

    n2 = run_checkpointed(spark, SF_SMOKE, out, n_buckets=8, buckets_per_commit=2)
    assert n2 == 8  # every bucket reprocessed (none had committed lineage)

    spans = spark.read.parquet(os.path.join(out, "spans"))
    n_docs = load_documents(spark, SF_SMOKE).count()
    assert spans.count() == n_docs  # no duplicates from the rewrite
    assert spans.select("doc_id").distinct().count() == n_docs


def test_skew_large_docs_spread_across_partitions(spark, tmp_path):
    """skew_large family (FIXTURES §3): 0.1%-style oversized docs must
    not concentrate: after salt_by_size, no partition should carry more
    than ~2 of the 8 planted giants (they differ in salt, so they
    spread), and the byte-heaviest partition must hold well under the
    giants' combined weight."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    giants = (
        docs.limit(8)
        .withColumn("doc_id", F.col("doc_id") + 900000)
        .withColumn("text", F.expr("repeat(text, 120)"))  # ~100-200× spans
    )
    both = docs.unionByName(giants)
    payloads = generate_payloads(synth_spans_df(both), "classic")
    salted = salt_by_size(payloads, num_partitions=8)
    per_part = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.sum(F.length("payload")).alias("bytes"),
            F.sum((F.col("doc_id") >= 900000).cast("int")).alias("giants"),
        )
        .collect()
    )
    assert sum(r.giants for r in per_part) == 8
    assert max(r.giants for r in per_part) <= 3  # salted spread
    total = sum(r.bytes for r in per_part)
    assert max(r.bytes for r in per_part) < 0.55 * total


def test_iceberg_dispatch_mocked(spark, monkeypatch):
    """Dress rehearsal for a jar-equipped cluster: with the catalog
    'present', both sinks must route through DataFrameWriterV2
    (writeTo().append() / overwritePartitions()) and never touch the
    parquet fallback."""
    import pdfspark.scale as scale

    calls = []

    class FakeWriter:
        def __init__(self, target):
            self.target = target

        def append(self):
            calls.append(("append", self.target))

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.target))

    monkeypatch.setattr(scale, "have_iceberg", lambda s: True)
    df = spark.range(3)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, t: FakeWriter(t), raising=True
    )
    scale.append_table(df, spark, "iceberg.db.spans", "bucket")
    scale.overwrite_partitions(df, spark, "iceberg.db.spans", "bucket")
    assert calls == [
        ("append", "iceberg.db.spans"),
        ("overwritePartitions", "iceberg.db.spans"),
    ]


def test_lineage_attempt_counter(spark, tmp_path):
    from pdfspark.scale import bucket_attempts

    out = str(tmp_path / "att")
    with pytest.raises(RuntimeError):
        run_checkpointed(spark, SF_SMOKE, out, n_buckets=4,
                         buckets_per_commit=2, fail_after=2)
    # crashed run: 2 buckets done (attempt 1), 2 left 'attempted'
    att = bucket_attempts(spark, os.path.join(out, "lineage"))
    assert set(att) == {0, 1, 2, 3} and set(att.values()) == {1}
    run_checkpointed(spark, SF_SMOKE, out, n_buckets=4)
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    done = {r.bucket: r.attempt for r in lin.where(F.col("status") == "done").collect()}
    assert len(done) == 4
    # the two buckets finished on the second run carry attempt 2
    assert sorted(done.values()) == [1, 1, 2, 2]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketing evidence for the 100 TB co-located-join story: two
    tables bucketed+sorted on the join key must SortMergeJoin with
    ZERO Exchange (and zero Sort) in the physical plan — the shuffle
    happens once at write time, then every future join on that key is
    free. (Broadcast is suppressed with a merge hint so the test pins
    the bucketed path, not the small-table shortcut.)"""
    docs = load_documents(spark, SF_SMOKE).select("doc_id", "text")
    dim = load_documents(spark, SF_SMOKE).select("doc_id", "n_chars")
    try:
        docs.write.bucketBy(8, "doc_id").sortBy("doc_id").mode(
            "overwrite"
        ).saveAsTable("tb_docs")
        dim.write.bucketBy(8, "doc_id").sortBy("doc_id").mode(
            "overwrite"
        ).saveAsTable("tb_dim")
        joined = (
            spark.table("tb_docs")
            .hint("merge")
            .join(spark.table("tb_dim"), "doc_id")
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness too: every doc matched exactly once
        assert joined.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_docs")
        spark.sql("DROP TABLE IF EXISTS tb_dim")


def test_checkpointed_replicate_scales_rows(spark, tmp_path):
    """--replicate K (r5, the deployment-surface scaling knob):
    in-plan corpus replication doubles the extracted span rows
    deterministically and keeps resume semantics (second run is a
    no-op)."""
    from pdfspark.scale import run_checkpointed

    out1 = str(tmp_path / "base")
    out2 = str(tmp_path / "repl")
    run_checkpointed(spark, SF_SMOKE, out1, n_buckets=4)
    run_checkpointed(spark, SF_SMOKE, out2, n_buckets=4, replicate=2)
    base = spark.read.parquet(f"{out1}/spans").count()
    repl = spark.read.parquet(f"{out2}/spans").count()
    assert repl == 2 * base
    assert run_checkpointed(spark, SF_SMOKE, out2, n_buckets=4, replicate=2) == 0


def test_checkpointed_resume_config_guard(spark, tmp_path):
    """A resume with different corpus-shaping parameters must be
    REFUSED (it would silently mix scales/variants across buckets);
    identical parameters resume as a no-op."""
    import pytest as _pytest

    from pdfspark.scale import run_checkpointed

    out = str(tmp_path / "guarded")
    run_checkpointed(spark, SF_SMOKE, out, n_buckets=2, replicate=2)
    assert run_checkpointed(spark, SF_SMOKE, out, n_buckets=2, replicate=2) == 0
    with _pytest.raises(ValueError, match="resume config mismatch"):
        run_checkpointed(spark, SF_SMOKE, out, n_buckets=2, replicate=4)
    with _pytest.raises(ValueError, match="resume config mismatch"):
        run_checkpointed(spark, SF_SMOKE, out, n_buckets=2, variant="classic",
                         replicate=2)


def test_checkpointed_resume_guard_pins_sf_dir(spark, tmp_path):
    """r6 (ADVICE): resuming against a DIFFERENT --sf-dir must be
    refused too — mixed corpora across buckets is the same silent
    failure as a variant mismatch. Also: the sidecar must be valid
    JSON (written via temp+rename, never truncated)."""
    import json

    import pytest as _pytest

    from pdfspark.scale import run_checkpointed

    out = str(tmp_path / "sfguard")
    run_checkpointed(spark, SF_SMOKE, out, n_buckets=2)
    with open(f"{out}/_job_config.json") as f:
        cfg = json.load(f)
    assert cfg["sf_dir"] == os.path.realpath(SF_SMOKE)
    other = tmp_path / "othersf"
    other.mkdir()
    os.symlink(
        os.path.join(SF_SMOKE, "documents.parquet"),
        other / "documents.parquet",
    )
    with _pytest.raises(ValueError, match="resume config mismatch"):
        run_checkpointed(spark, str(other), out, n_buckets=2)
    # pre-r6 sidecar (no sf_dir) still resumes on matching legacy keys
    with open(f"{out}/_job_config.json", "w") as f:
        json.dump({k: cfg[k] for k in ("replicate", "variant", "n_buckets")}, f)
    assert run_checkpointed(spark, SF_SMOKE, out, n_buckets=2) == 0


def test_null_sink_runs_plan_without_output(spark, tmp_path):
    """r6 (--sink null): the identical pipeline plan through the noop
    datasource — nothing written, no resume state, full compute."""
    from pdfspark.scale import run_checkpointed

    out = str(tmp_path / "nullsink")
    n = run_checkpointed(spark, SF_SMOKE, out, n_buckets=4, sink="null")
    assert n == 4
    assert not os.path.exists(out)  # no sidecar, no spans, no lineage
