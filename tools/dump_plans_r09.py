"""Dump explain("formatted") plans for the r9-touched queries.

Usage: python tools/dump_plans_r09.py <outdir> <suffix> [name ...]
Writes <outdir>/<query>_<suffix>.txt for each query (default: the
r9-touched set). Run from the repo root whose tree should be planned.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

TOUCHED = [
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_skipped_buckets",
    "html_main_text",
    "html_block_stats",
    "benchmark_contamination",
    "corpus_curate",
    "pdf_roundtrip_interleaved",
    "pdf_roundtrip_encrypted",
    "pdf_metadata",
    "pdf_malformed_policy",
    "pdf_attachments",
    "pdf_salvage",
    "pdf_dates",
    "pdf_span_geometry",
    "pdf_outlines",
    "pdf_links",
    "pdf_form_fields",
    "media_meta",
    "bm25_topk",
    "dedup_simhash",
]

SF = "/root/testdata/sf0.001"


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or TOUCHED
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as se
    from pdfspark.session import get_spark

    spark = get_spark(app_name="dump-plans-r09")
    qs = se.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # plan-only dump; never fail the sweep
            text = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
