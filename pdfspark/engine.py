"""The Spark pipeline: spans synthesis → payload generation →
extraction (SURVEY.md §7 Milestones 1-2; BASELINE.json input_hint).

Dataflow (all vectorized — the ONLY Python surfaces are mapInPandas
stages over Arrow batches; no row-wise udf() anywhere, per input_hint):

    documents(doc_id, text, ...)                      [driver parquet]
      → synth_spans_df      pure Spark SQL expressions (JVM, codegen)
      → interleaved table (doc_id, spans[])           [input_hint shape]
      → generate_payloads   mapInPandas → (doc_id, payload, size_class)
      → salt_by_size        explicit skew repartition  (scale.py)
      → extract             mapInPandas → (doc_id, status, error, spans[])
      → explode to rows for comparison / sinks

The per-document kernel state (xref maps, object caches) lives inside
one mapInPandas batch pass per document and never crosses an executor
boundary (SURVEY §1.3, §3 'boundaries').
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .codec import build_pdf, variant_for
from .scale import salt_docs_by_size  # no cycle: scale's engine uses are lazy

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"
SPANS_SCHEMA = f"array<{SPAN_STRUCT}>"
PAYLOAD_SCHEMA = "doc_id bigint, payload binary, size_class int"
EXTRACT_SCHEMA = f"doc_id bigint, status string, error string, spans {SPANS_SCHEMA}"
ROWS_SCHEMA = "doc_id bigint, offset int, kind string, text string, media_ref string"

CHUNK = 80  # must match codec.synth_spans_py and the oracle SQL

# ---------------------------------------------------------------------------
# Stage 1 — spans synthesis (pure Spark SQL; mirrors codec.synth_spans_py
# and __spark_entry__._SPANS_ORACLE_SQL — lockstep asserted by tests)
# ---------------------------------------------------------------------------

# chunking uses ONE linear regexp pass per document: per-chunk
# substring(text, i*80+1, 80) is O(len) per call on UTF8String (char
# indexing scans), i.e. O(len²/80) per doc — a 200 KB giant costs
# ~1 s of JVM time per call site. regexp_extract_all('(?s).{1,80}')
# yields identical chunks (greedy 80-char bites, dotall) in O(len).
_SPANS_EXPR = f"""
filter(
  flatten(transform(
    regexp_extract_all(text, '(?s).{{1,{CHUNK}}}', 0),
    (c, i) -> array(
      named_struct(
        'kind', 'text',
        'text', c,
        'media_ref', cast(null as string),
        'offset', cast(i + i div 3 as int)),
      IF(i % 3 = 2,
         named_struct(
           'kind', 'media',
           'text', cast(null as string),
           'media_ref', concat('m', substring(
               md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 16)),
           'offset', cast(i + i div 3 + 1 as int)),
         cast(null as {SPAN_STRUCT}))
    )
  )),
  x -> x is not null)
"""


def synth_spans_df(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) → (doc_id, text, spans) — the
    interleaved input table of BASELINE.json input_hint, built entirely
    JVM-side (whole-stage codegen; no Python).

    The source ``text`` column rides along (r9): spans are a pure
    function of text (lockstep-pinned against codec.synth_spans_py),
    so downstream stages that only need text — salt_spans_by_size's
    closed-form size estimate, generate_payloads' in-worker synthesis —
    let Catalyst prune the struct array out of the plan entirely, while
    consumers of ``spans`` (spans_rows, the doc_spans SQL view) are
    unaffected."""
    return docs.select("doc_id", "text", F.expr(_SPANS_EXPR).alias("spans"))


def replicate_docs(docs: DataFrame, k: int) -> DataFrame:
    """Deterministic k× corpus scale-up for stress/scaling runs:
    replica r of doc d becomes doc_id d*k + r (same text). Pure JVM
    explode — no data files written, fully reproducible."""
    if k <= 1:
        return docs
    return docs.select(
        F.explode(F.expr(f"sequence(0, {k - 1})")).alias("r"),
        (F.col("doc_id") * k).alias("base"),
        "text",
    ).select((F.col("base") + F.col("r")).alias("doc_id"), "text")


def spans_rows(spans_df: DataFrame) -> DataFrame:
    """(doc_id, spans[]) → exploded comparison rows."""
    return spans_df.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.offset", "s.kind", "s.text", "s.media_ref")


# ---------------------------------------------------------------------------
# Stage 2 — payload generation (mapInPandas; the reference's produce()
# path S3 run as a vectorized batch stage)
# ---------------------------------------------------------------------------


def _spans_to_tuples(spans) -> list[tuple]:
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def _parse_byte_size(v: str) -> int:
    """Spark size strings: plain bytes or <n><k|m|g>[b] suffix."""
    s = str(v).strip().lower().rstrip("b")
    mult = 1
    if s and s[-1] in "kmg":
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[s[-1]]
        s = s[:-1]
    return int(float(s) * mult)


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate how many partitions a FILE SCAN frame will produce,
    mirroring Spark's own split math (FilePartition.maxSplitBytes:
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))) — raw
    file COUNT does not bound partition count, because many small
    files are bin-packed into one split. Local (file:) paths are
    statted; for remote schemes (s3/hdfs — can't stat cheaply from the
    driver) fall back to file count as an optimistic upper bound, so
    the caller treats the whole estimate as a heuristic."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    files = df.inputFiles()
    if not files:
        return 0
    conf = df.sparkSession.conf
    max_pb = _parse_byte_size(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_byte_size(conf.get("spark.sql.files.openCostInBytes", "4m"))
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return len(files)
        try:
            total += os.path.getsize(unquote(u.path)) + open_cost
        except OSError:
            return len(files)
    cores = df.sparkSession.sparkContext.defaultParallelism
    split = min(max_pb, max(open_cost, total // max(cores, 1)))
    return max(1, math.ceil(total / max(split, 1)))


def ensure_parallelism(df: DataFrame, factor: int = 3) -> DataFrame:
    """A single small parquet file scans as ONE partition — which
    would serialize every downstream mapInPandas stage. If the scan is
    under-partitioned relative to the cluster, hash-repartition on
    doc_id up front (at 10^12-doc scale the source is already
    thousands of multi-split files and this is a no-op).

    The decision uses `inputFiles()` metadata + Spark's split-packing
    formula (_estimated_scan_partitions) — NOT
    `df.rdd.getNumPartitions()`, which under AQE would materialize
    every upstream shuffle stage eagerly (the work then runs twice).
    A frame with no input files (in-memory/derived) is assumed
    under-partitioned and repartitioned; callers that already
    repartitioned pass ensure=False."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        est = _estimated_scan_partitions(df)
    except Exception:
        est = 0
    if est < target:
        return df.repartition(target, "doc_id")
    return df


def generate_payloads(
    spans_df: DataFrame, variant: str = "mixed", ensure: bool = True
) -> DataFrame:
    """(doc_id, spans) or (doc_id, text) → (doc_id, payload, size_class).

    Two accepted input shapes (r9, guide §4 — pass only the columns
    the function needs):
    - a TEXT frame carrying a ``text`` column (with or without a
      derived ``spans`` column — synth_spans_df emits both): spans are
      synthesized in-Python per document (codec.synth_spans_py — the
      lockstep mirror of engine._SPANS_EXPR, so payload bytes are
      identical), which skips the JVM struct synthesis and ships ~4×
      fewer bytes through Arrow; a spans column present alongside text
      is pruned out of the plan by Catalyst. NB this makes ``text``
      authoritative: a frame whose spans were NOT derived from its
      text by the canonical synthesis must drop the text column to
      take the struct path.
    - a spans-only frame (doc_id, spans[]): spans cross the Arrow
      boundary as struct arrays and payloads build from the structs.

    size_class = log4 bucket of payload length — the explicit skew
    column consumed by scale.salt_by_size when salting post-generation
    (the checkpointed sink path); the flagship pipeline salts BEFORE
    this stage instead (scale.salt_spans_by_size /
    scale.salt_docs_by_size)."""
    # NB: ensure_parallelism inspects df.rdd, which under AQE
    # materializes upstream shuffle stages eagerly (the work then runs
    # twice). Callers that already repartitioned pass ensure=False.
    from_text = "text" in spans_df.columns
    if from_text:
        spans_df = spans_df.select("doc_id", "text")
    if ensure:
        spans_df = ensure_parallelism(spans_df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codec import synth_spans_py

        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            if from_text:
                for did, text in zip(ids, pdf["text"]):
                    v = variant_for(int(did), variant)
                    payloads.append(
                        build_pdf(str(did), synth_spans_py(str(did), text), v)
                    )
            else:
                for did, spans in zip(ids, pdf["spans"]):
                    v = variant_for(int(did), variant)
                    payloads.append(
                        build_pdf(str(did), _spans_to_tuples(spans), v)
                    )
            sizes = [max(len(p), 1).bit_length() // 2 for p in payloads]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "size_class": sizes}
            )

    return spans_df.mapInPandas(gen, schema=PAYLOAD_SCHEMA)


# ---------------------------------------------------------------------------
# Stage 3 — extraction (mapInPandas; the parseEverything analog X10 +
# text-op layer)
# ---------------------------------------------------------------------------


def extract(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, status, error, spans[]).

    PERMISSIVE per-document fault policy (§2.8): malformed payloads
    yield status='error' and never spans, never a failed stage."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_spans  # import inside worker

        for pdf in batches:
            out_status, out_err, out_spans = [], [], []
            for payload in pdf["payload"]:
                status, err, spans = extract_spans(bytes(payload))
                out_status.append(status)
                out_err.append(err)
                out_spans.append(
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in spans
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "status": out_status,
                    "error": out_err,
                    "spans": out_spans,
                }
            )

    return payloads.mapInPandas(ker, schema=EXTRACT_SCHEMA)


FLAT_SCHEMA = "doc_id bigint, offset int, kind string, text string, media_ref string"


def extract_flat(
    payloads: DataFrame,
    lenient: bool = False,
    reading_order: bool = False,
    infer_spaces: bool = False,
) -> DataFrame:
    """Row-oriented extraction: emits exploded span rows directly.

    Functionally extract() + explode, but the kernel stage yields FLAT
    Arrow columns — no per-row list-of-dict building, no nested
    struct-array conversion through Arrow, no JVM-side Generate. For
    comparison/row sinks this is the fast path; extract() remains the
    grouped (spans[]) form for document-shaped sinks.

    ``lenient=True`` turns on §C.2 xref reconstruction (broken or
    missing startxref chains salvaged by whole-file object scan).
    ``reading_order=True`` (r8) orders tagged documents' spans by
    structure-tree traversal (ISO 32000-1 §14.8 logical reading
    order) instead of content paint order; untagged docs unchanged.
    ``infer_spaces=True`` (r8) turns on §9.10-adjacent word-boundary
    inference (spaces from positioning-only glyph gaps)."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_spans
        from .kernel.errors import ParserSettings

        settings = ParserSettings(allow_reconstruction=True) if lenient else None

        for pdf in batches:
            ids, offs, kinds, texts, refs = [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                status, _err, spans = extract_spans(
                    bytes(payload), settings, reading_order=reading_order,
                    infer_spaces=infer_spaces,
                )
                if status != "ok":
                    continue
                for (k, t, m, o) in spans:
                    ids.append(did)
                    offs.append(o)
                    kinds.append(k)
                    texts.append(t)
                    refs.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "offset": offs,
                    "kind": kinds,
                    "text": texts,
                    "media_ref": refs,
                }
            )

    return payloads.mapInPandas(ker, schema=FLAT_SCHEMA)


META_SCHEMA = (
    "doc_id bigint, status string, error string, title string, author string, "
    "subject string, keywords string, creator string, producer string, "
    "creation_date string, mod_date string, trapped string, version string, "
    "lang string, page_mode string, page_layout string, page_count int, "
    "encrypted boolean, creation_ts timestamp"
)

_META_COLS = [
    "title", "author", "subject", "keywords", "creator", "producer",
    "creation_date", "mod_date", "trapped", "version", "lang", "page_mode",
    "page_layout", "page_count", "encrypted", "creation_ts",
]


def extract_metadata(payloads: DataFrame) -> DataFrame:
    """Metadata-only kernel (M3/M7/M9/M10) — split from extract() so
    metadata queries never decode content streams (the lazy-page
    optimization, SURVEY §4.1)."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_meta

        names = ("doc_id", "status", "error", *_META_COLS)
        for pdf in batches:
            # columnar assembly (r9): pd.DataFrame from per-column
            # lists skips the per-row dict → per-cell inference path
            data = {c: [] for c in names}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                status, err, meta = extract_meta(bytes(payload))
                meta = meta or {}
                data["doc_id"].append(did)
                data["status"].append(status)
                data["error"].append(err)
                for c in _META_COLS:
                    data[c].append(meta.get(c))
            yield pd.DataFrame(data)

    return payloads.mapInPandas(ker, schema=META_SCHEMA)


# ---------------------------------------------------------------------------
# End-to-end pipelines
# ---------------------------------------------------------------------------


def load_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def roundtrip_rows(
    spark,
    sf_dir: str,
    variant: str = "mixed",
    salt: bool = True,
    reading_order: bool = False,
    infer_spaces: bool = False,
) -> DataFrame:
    """Flagship pipeline: synth → generate → (salt) → extract →
    exploded span rows. Correct iff output == synth_spans rows (the
    round-trip identity; oracle = the same synthesis in DuckDB SQL).

    With ``variant='tagged', reading_order=True`` the identity is the
    READING-ORDER contract (r8): the generator paints marked-content
    sections in scrambled (two-column) order, so the identity holds
    only when extraction re-sequences by structure-tree traversal."""
    from .scale import salt_docs_by_size

    # r9: ship (doc_id, text) to the Python stages — spans synthesize
    # in-worker (generate_payloads text path, byte-identical payloads)
    # instead of materializing struct arrays JVM-side and Arrow-
    # transferring them. Same single pre-generation salt Exchange,
    # ~4× fewer shuffled/transferred bytes.
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    if salt:
        # skew-salt the (cheap) text rows BEFORE generation: one
        # shuffle total; generate → extract then pipeline in one stage
        docs = salt_docs_by_size(docs)
    payloads = generate_payloads(docs, variant, ensure=not salt)
    return extract_flat(
        payloads, reading_order=reading_order, infer_spaces=infer_spaces
    )


GEO_SCHEMA = (
    "doc_id bigint, offset int, kind string, x double, y double, "
    "w double, h double"
)


def extract_geometry(payloads: DataFrame, tj_kerning: bool = False) -> DataFrame:
    """Geometry-widened flat extraction: span-start device-space
    (x, y) projected through Tm × CTM by the interpreter, plus the
    box where derivable (media: CTM scale; text: h = font size).
    Same single-UDF-stage shape as extract_flat. ``tj_kerning=True``
    counts TJ kern displacements toward span width (§9.4.3)."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_spans_geo

        for pdf in batches:
            ids, offs, kinds, xs, ys, ws, hs = [], [], [], [], [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                status, _err, spans = extract_spans_geo(
                    bytes(payload), tj_kerning=tj_kerning
                )
                if status != "ok":
                    continue
                for (k, _t, _m, o, x, y, w, h) in spans:
                    ids.append(did)
                    offs.append(o)
                    kinds.append(k)
                    xs.append(x)
                    ys.append(y)
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids, "offset": offs, "kind": kinds,
                    "x": xs, "y": ys, "w": ws, "h": hs,
                }
            )

    return payloads.mapInPandas(ker, schema=GEO_SCHEMA)


def salvage_rows(spark, sf_dir: str, encrypted: bool = False) -> DataFrame:
    """Reconstruction pipeline (driver query `pdf_salvage`): every
    payload is generated WITHOUT its startxref chain, and lenient
    extraction must still recover the exact span sequence — the §C.2
    whole-file-scan path, oracled like any other roundtrip.
    ``encrypted=True`` (driver query `pdf_salvage_encrypted`) breaks
    cipher- and layout-rotated ENCRYPTED docs instead: reconstruction
    must harvest /Encrypt, unlock, then expand the object streams."""
    from .scale import salt_docs_by_size

    variant = (
        "malformed:no_startxref_encrypted"
        if encrypted
        else "malformed:no_startxref"
    )
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), variant, ensure=False)
    return extract_flat(payloads, lenient=True)


def geometry_rows(
    spark, sf_dir: str, variant: str = "classic", tj_kerning: bool = False
) -> DataFrame:
    """Span-geometry pipeline: the roundtrip path with the
    geometry-widened extractor (driver query `pdf_span_geometry`;
    `pdf_span_geometry_kerned` passes tj_kerning=True)."""
    from .scale import salt_docs_by_size

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), variant, ensure=False)
    return extract_geometry(payloads, tj_kerning=tj_kerning)


def status_rows(spark, sf_dir: str, modulo: int = 17) -> DataFrame:
    """Malformed-family pipeline: every doc_id % modulo == 0 gets a
    malformed payload (kind rotates) — those must land status='error'
    with zero spans (FileHandlingTest contract §5.2)."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codec import synth_spans_py

        kinds = ("noise", "only_header", "header_eof", "zerosized", "no_startxref")
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for did, text in zip(ids, pdf["text"]):
                did = int(did)
                if did % modulo == 0:
                    v = f"malformed:{kinds[(did // modulo) % len(kinds)]}"
                else:
                    v = variant_for(did, "mixed")
                payloads.append(
                    build_pdf(str(did), synth_spans_py(str(did), text), v)
                )
            sizes = [max(len(p), 1).bit_length() // 2 for p in payloads]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads, "size_class": sizes})

    payloads = salt_docs_by_size(docs).mapInPandas(gen, schema=PAYLOAD_SCHEMA)

    # r9: the query only needs (status, span COUNT) — emit them
    # directly from the kernel stage instead of shipping every span as
    # an Arrow struct array through Python→JVM just to size() it
    # (guide §4: pass/return only what the consumer needs).
    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_spans

        for pdf in batches:
            ids, sts, ns = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                status, _err, spans = extract_spans(bytes(payload))
                ids.append(did)
                sts.append(status)
                ns.append(len(spans))
            yield pd.DataFrame({"doc_id": ids, "status": sts, "n_spans": ns})

    return payloads.mapInPandas(
        ker, schema="doc_id bigint, status string, n_spans int"
    )


def metadata_rows(spark, sf_dir: str) -> DataFrame:
    """Metadata pipeline over classic-layout payloads; every output
    column is recomputable in ANSI SQL from the documents table (the
    M7/M3 oracle)."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "classic", ensure=False)
    meta = extract_metadata(payloads)
    return meta.select(
        "doc_id", "status", "title", "author", "subject", "keywords",
        "page_count", "page_mode", "page_layout", "encrypted",
    )


ATT_SCHEMA = (
    "doc_id bigint, att_name string, filename string, size int, "
    "content_md5 string"
)


def attachments_rows(spark, sf_dir: str) -> DataFrame:
    """File-attachment extraction (driver query `pdf_attachments`):
    the generator embeds 1-3 deterministic files per doc in a /Names →
    /EmbeddedFiles name tree (both §7.9.6 shapes, raw/flate rotating);
    the kernel walks the tree, decodes each embedded stream and emits
    (name, filename, size, md5) — all recomputable in SQL."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "attachments", ensure=False)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel.extract import parse_document

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    doc = parse_document(bytes(payload))
                    for r in doc.embedded_files():
                        rows.append({"doc_id": did, **r})
                except Exception:
                    continue  # PERMISSIVE per-doc policy (§2.8)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "att_name", "filename", "size", "content_md5",
                ],
            )

    return payloads.mapInPandas(ker, schema=ATT_SCHEMA)


def outlines_rows(spark, sf_dir: str) -> DataFrame:
    """Outline/bookmark extraction (driver query `pdf_outlines`): the
    generator plants a deterministic /Outlines tree (1-3 top items,
    even items carry two children); the kernel's /First→/Next DFS
    emits (pos, level, title) in display order — closed-form SQL."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "navigation", ensure=False)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel.extract import parse_document

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for (pos, level, title) in parse_document(
                        bytes(payload)
                    ).outlines():
                        rows.append(
                            {
                                "doc_id": did, "pos": pos,
                                "level": level, "title": title,
                            }
                        )
                except Exception:
                    continue  # PERMISSIVE per-doc policy (§2.8)
            yield pd.DataFrame(
                rows, columns=["doc_id", "pos", "level", "title"]
            )

    return payloads.mapInPandas(
        ker, schema="doc_id bigint, pos int, level int, title string"
    )


REFERENCE_PDF_DIR = "/root/reference/pdfparse-lib/src/test/resources"
REFERENCE_PDFS = (
    "24c16.pdf",
    "vrml.pdf",
    "Creativecommons-what-is-creative-commons_eng.pdf",
    "loremipsum2.pdf",
    "6licenses-flat.pdf",
    "minimal/1 - minimal by adobe.pdf",
    "minimal/1 - minimal_crlf.pdf",
)


def reference_golden_rows(spark, sf_dir: str) -> DataFrame:
    """Driver query `pdf_reference_golden` (r5): the REAL-PDF surface
    as a driver-oracled query — Spark's binaryFile source over the
    reference's own bundled sample PDFs (third-party writers: Acrobat
    Distiller, Ghostscript, Word, InDesign), metadata + span stats per
    file.  The oracle's metadata columns are the reference's OWN
    golden expectations (ComplexTest.java:16-207 — a genuinely
    external oracle); the span count/digest columns are regression
    pins of this engine's text-op layer (the reference has none).
    ``sf_dir`` is unused (the inputs are the fixed real files) but
    kept for the driver's (spark, sf_dir) calling contract."""
    import os

    paths = [os.path.join(REFERENCE_PDF_DIR, f) for f in REFERENCE_PDFS]
    payloads = spark.read.format("binaryFile").load(paths)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import os as _os

        from .kernel import extract_meta_doc, extract_spans

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                try:  # §2.8 per-file fault policy for the meta pass
                    meta = extract_meta_doc(data)
                except Exception:
                    meta = {
                        "title": "", "author": "", "page_count": 0,
                        "page_mode": "",
                    }
                status, _err, spans = extract_spans(data)
                h = hashlib.md5()
                for (k, t, m, o) in spans:
                    h.update(f"{k}|{t or ''}|{m or ''}|{o}\x1e".encode())
                rows.append(
                    {
                        "fname": _os.path.basename(path),
                        "title": meta["title"],
                        "author": meta["author"],
                        "page_count": meta["page_count"],
                        "page_mode": meta["page_mode"],
                        "status": status,
                        "n_spans": len(spans),
                        "spans_md5": h.hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "fname", "title", "author", "page_count", "page_mode",
                    "status", "n_spans", "spans_md5",
                ],
            )

    return payloads.mapInPandas(
        ker,
        schema="fname string, title string, author string, page_count int,"
        " page_mode string, status string, n_spans bigint, spans_md5 string",
    )


MALFORMED_PDF_DIR = os.path.join(REFERENCE_PDF_DIR, "malformed_pdfs")
MALFORMED_PDFS = (
    "noise.pdf",
    "only_header.pdf",
    "only_header_eof.pdf",
    "zerosizedfile.pdf",
)


def reference_malformed_rows(spark, sf_dir: str) -> DataFrame:
    """Driver query `pdf_malformed_golden` (r6): the reference's own
    malformed corpus (FileHandlingTest.java:32-56 — noise /
    header-only / header+startxref-EOF / zero-length) driven
    end-to-end through the binaryFile source.  The reference's
    contract is must-throw (every file raises EParseError); here each
    must land in the §2.8 error bucket with zero spans, and the error
    CLASS is part of the oracled row.

    DOCUMENTED DIVERGENCE, asserted explicitly: Spark's binaryFile
    source silently DROPS zero-byte files (zerosizedfile.pdf never
    reaches the kernel), so the expected-file list is anti-joined
    against the scan and missing files surface as
    status='dropped_by_source' rows — the divergence is itself an
    oracled fact, not a silent hole.  ``sf_dir`` unused (fixed real
    files; driver calling contract)."""
    payloads = spark.read.format("binaryFile").load(
        os.path.join(MALFORMED_PDF_DIR, "*.pdf")
    )

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os as _os

        from .kernel import extract_spans

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                status, err, spans = extract_spans(bytes(content))
                rows.append(
                    {
                        "fname": _os.path.basename(path),
                        "status": status,
                        "err_class": (err or "").split(":")[0],
                        "n_spans": len(spans),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["fname", "status", "err_class", "n_spans"]
            )

    got = payloads.mapInPandas(
        ker,
        schema="fname string, status string, err_class string,"
        " n_spans bigint",
    )
    expected = spark.createDataFrame(
        [(f,) for f in MALFORMED_PDFS], "fname string"
    )
    dropped = (
        expected.join(got, "fname", "left_anti")
        .select(
            "fname",
            F.lit("dropped_by_source").alias("status"),
            F.lit("zero_byte_file").alias("err_class"),
            F.lit(0).cast("bigint").alias("n_spans"),
        )
    )
    return got.unionByName(dropped)


def mutation_rows(spark, sf_dir: str) -> DataFrame:
    """Driver query `pdf_mutation_golden` (r7): hostile real-corpus
    fuzz as a driver surface.  The reference's seven sample PDFs are
    read through the binaryFile source and each expands in-executor
    into 12 seeded mutants (truncation / startxref corruption /
    bit flips — pdfspark/fuzz.py), every one driven through lenient
    extraction.  The oracle is the pinned per-mutant outcome manifest
    (fuzz_manifest.py): each mutant must land in ok / salvaged /
    error deterministically, with the error CLASS part of the row —
    the reference's must-not-crash contract
    (FileHandlingTest.java:45-55) under web-crawl failure modes.

    r8 breadth: the reference corpus is all classic-layout
    unencrypted, so 8 generator-variant seeds (objstream,
    incremental, hybrid, encrypted, forms, tagged, nospace, classic
    control — fuzz.GEN_FUZZ_VARIANTS) union in, built AND mutated
    in-executor from just their variant names.
    ``sf_dir`` unused (fixed real inputs; driver calling contract)."""
    from .fuzz import GEN_FUZZ_VARIANTS

    schema = (
        "fname string, kind string, seed int, status string,"
        " err_class string, n_spans bigint"
    )
    cols = ["fname", "kind", "seed", "status", "err_class", "n_spans"]
    paths = [os.path.join(REFERENCE_PDF_DIR, f) for f in REFERENCE_PDFS]
    payloads = spark.read.format("binaryFile").load(paths)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os as _os

        from .fuzz import mutant_rows_for

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    mutant_rows_for(_os.path.basename(path), bytes(content))
                )
            yield pd.DataFrame(rows, columns=cols)

    def gen_ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .fuzz import generator_seed_payload, mutant_rows_for

        for pdf in batches:
            rows = []
            for v in pdf["variant"]:
                fname, payload = generator_seed_payload(v)
                rows.extend(mutant_rows_for(fname, payload))
            yield pd.DataFrame(rows, columns=cols)

    gen_seeds = spark.createDataFrame(
        [(v,) for v in GEN_FUZZ_VARIANTS], "variant string"
    ).repartition(len(GEN_FUZZ_VARIANTS))
    return payloads.mapInPandas(ker, schema=schema).unionByName(
        gen_seeds.mapInPandas(gen_ker, schema=schema)
    )


def form_fields_rows(spark, sf_dir: str) -> DataFrame:
    """AcroForm field extraction (driver query `pdf_form_fields`, r5):
    the generator plants 1-5 typed fields (/FT rotating Tx/Btn/Ch),
    nesting the first two under a non-terminal parent whose
    inheritable /FT the kids omit — the kernel's §12.7 DFS rebuilds
    dotted full names and the inheritance chain, emitting (pos, name,
    ftype, value) per terminal field, all closed-form in doc_id."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "acroform", ensure=False)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel.extract import parse_document

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for (pos, name, ftype, value) in parse_document(
                        bytes(payload)
                    ).form_fields():
                        rows.append(
                            {
                                "doc_id": did, "pos": pos, "name": name,
                                "ftype": ftype, "value": value,
                            }
                        )
                except Exception:
                    continue  # PERMISSIVE per-doc policy (§2.8)
            yield pd.DataFrame(
                rows, columns=["doc_id", "pos", "name", "ftype", "value"]
            )

    return payloads.mapInPandas(
        ker,
        schema="doc_id bigint, pos int, name string, ftype string,"
        " value string",
    )


def links_rows(spark, sf_dir: str) -> DataFrame:
    """Link-graph extraction (driver query `pdf_links`): one /Link
    annotation with a /URI action per page; the kernel walks page
    /Annots and emits (page_idx, uri) — the hyperlink projection a
    web-scale pipeline extracts alongside text."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "navigation", ensure=False)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel.extract import parse_document

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for (page_idx, uri) in parse_document(
                        bytes(payload)
                    ).link_uris():
                        rows.append(
                            {"doc_id": did, "page_idx": page_idx, "uri": uri}
                        )
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["doc_id", "page_idx", "uri"])

    return payloads.mapInPandas(
        ker, schema="doc_id bigint, page_idx int, uri string"
    )


PAGE_MODES_ROTATION = (
    "UseNone", "UseOutlines", "UseThumbs", "FullScreen", "UseOC", "UseAttachments",
)


def catalog_fields_rows(spark, sf_dir: str) -> DataFrame:
    """M9 end-to-end: the generator writes catalog /Lang (from the
    documents.lang column) and /PageMode (rotating by doc_id); the
    metadata kernel reads them back. Oracle: the source columns."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text", "lang")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codec import build_pdf, synth_spans_py
        from .kernel.cos import CString, Name

        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for did, text, lang in zip(ids, pdf["text"], pdf["lang"]):
                did = int(did)
                spans = synth_spans_py(str(did), text)
                payloads.append(
                    build_pdf(
                        str(did),
                        spans,
                        "classic",
                        catalog_extra={
                            "Lang": CString.from_text(lang),
                            "PageMode": Name(
                                PAGE_MODES_ROTATION[did % len(PAGE_MODES_ROTATION)]
                            ),
                        },
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "size_class": [1] * len(ids)}
            )

    payloads = salt_docs_by_size(docs).mapInPandas(gen, schema=PAYLOAD_SCHEMA)
    meta = extract_metadata(payloads)
    return meta.select("doc_id", "lang", "page_mode")


PAGE_LABEL_STYLES = ("D", "R", "r", "A", "a")
PL_REP = 4  # text amplification: the raw documents rows cap at 2
# pages; x4 spreads page counts over 1..8 so multi-range schedules,
# the prefix-only range, and the /Kids tree shape all get exercised


def _page_label_ranges(did: int, n_pages: int) -> list:
    """The deterministic §12.4.2 label schedule the generator writes
    and the oracle re-derives: range at page 0 rotates the numbering
    style by doc_id (/St omitted when it would be the default 1);
    docs with >= 3 pages open a second prefixed range at page 2 —
    prefix-only (no /S) when doc_id % 7 == 0."""
    from .kernel.cos import CDict, CString, Name

    r1 = CDict()
    r1[Name("S")] = Name(PAGE_LABEL_STYLES[did % 5])
    st1 = did % 3 + 1
    if st1 != 1:  # exercise the /St default
        r1[Name("St")] = st1
    ranges = [(0, r1)]
    if n_pages >= 3:
        r2 = CDict()
        r2[Name("P")] = CString.from_text(f"x{did % 10}-")
        if did % 7 != 0:  # %7==0 -> prefix-only range
            r2[Name("S")] = Name(PAGE_LABEL_STYLES[(did // 5) % 5])
            r2[Name("St")] = 1
        ranges.append((2, r2))
    return ranges


def page_label_tree(did: int, n_pages: int):
    """/PageLabels number tree for the schedule: doc_id % 4 == 0 with
    two ranges exercises the /Kids + /Limits shape (§7.9.7); the kids
    stay direct dicts (legal — deref handles both). Everything else
    gets a flat /Nums leaf."""
    from .kernel.cos import CDict, Name

    ranges = _page_label_ranges(did, n_pages)
    root = CDict()
    if did % 4 == 0 and len(ranges) == 2:
        kids = []
        for start, d in ranges:
            leaf = CDict()
            leaf[Name("Nums")] = [start, d]
            leaf[Name("Limits")] = [start, start]
            kids.append(leaf)
        root[Name("Kids")] = kids
    else:
        nums = []
        for start, d in ranges:
            nums += [start, d]
        root[Name("Nums")] = nums
    return root


def page_labels_rows(spark, sf_dir: str) -> DataFrame:
    """/PageLabels end-to-end (driver query `pdf_page_labels`): the
    generator writes a §12.4.2 page-label number tree rotating through
    every numbering style, /St starts, a prefix-only range, and both
    tree shapes (flat /Nums vs /Kids leaves with /Limits); the kernel
    walks the tree back into one display label per page. Oracle: the
    same closed-form label schedule in SQL (styles re-derived from
    doc_id, page count from the amplified span formula). EXTENSION —
    the reference reads no number trees (its catalog surface is
    PDFDocCatalog.java's mode/layout/lang trio)."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codec import SPANS_PER_PAGE, build_pdf, synth_spans_py

        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for did, text in zip(ids, pdf["text"]):
                did = int(did)
                spans = synth_spans_py(str(did), str(text) * PL_REP)
                n_pages = max(1, -(-len(spans) // SPANS_PER_PAGE))
                payloads.append(
                    build_pdf(
                        str(did),
                        spans,
                        "classic",
                        catalog_extra={
                            "PageLabels": page_label_tree(did, n_pages)
                        },
                    )
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads,
                 "size_class": [1] * len(ids)}
            )

    payloads = salt_docs_by_size(docs).mapInPandas(gen, schema=PAYLOAD_SCHEMA)

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel.extract import parse_document

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for idx, lab in enumerate(
                        parse_document(bytes(payload)).page_labels()
                    ):
                        rows.append(
                            {"doc_id": did, "page_idx": idx, "label": lab}
                        )
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["doc_id", "page_idx", "label"])

    return payloads.mapInPandas(
        ker, schema="doc_id bigint, page_idx int, label string"
    )



def date_rows(spark, sf_dir: str) -> DataFrame:
    """C5 oracle query: the kernel parses the generator's
    D:YYYYMMDDHHmmSS+02'00' CreationDate and normalizes to UTC; DuckDB
    re-derives the same instant from the md5 the generator used
    (codec._det_date)."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    payloads = generate_payloads(salt_docs_by_size(docs), "classic", ensure=False)
    meta = extract_metadata(payloads)
    return meta.select("doc_id", "creation_date", "creation_ts")


# ---------------------------------------------------------------------------
# S1 — real-file source: spark.read.format("binaryFile") over ad-hoc
# PDFs (the reference's PDFFile.open(File) path, PDFFile.java:52-58)
# ---------------------------------------------------------------------------


def extract_pdf_files(spark, path_glob: str) -> DataFrame:
    """Directory/glob of *.pdf → (path, status, error, spans[]).
    binaryFile scan gives (path, modificationTime, length, content);
    column pruning keeps only (path, content).

    KNOWN LIMIT (verified empirically): Spark's binaryFile source
    silently DROPS zero-byte files at the scan — they never reach the
    kernel's error bucket. At corpus scale, ingest accounting must
    come from an independent listing (or the Iceberg manifest), not
    from this scan's row count."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path_glob)
        .select(F.col("path"), F.col("content").alias("payload"))
    )

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .kernel import extract_spans

        for pdf in batches:
            rows = []
            for path, payload in zip(pdf["path"], pdf["payload"]):
                status, err, spans = extract_spans(bytes(payload))
                rows.append(
                    {
                        "path": path,
                        "status": status,
                        "error": err,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        ker, schema=f"path string, status string, error string, spans {SPANS_SCHEMA}"
    )
