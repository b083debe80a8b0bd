"""Multimodal column plumbing: opaque binary media + typed metadata
(task brief: decode / feature-extract / resize / frame-sample as
vectorized stages over binary columns).

The image/audio codec libraries are not in this container, so the
DECODE step is stubbed (``decode_image_real`` raises
NotImplementedError; ``_fake_decode`` derives deterministic metadata
from the payload's embedded digest). Everything Spark-side is REAL and
exercised: binary column schema, Arrow batch transfer of bytes through
mapInPandas, per-batch shaping, and the downstream typed-metadata
DataFrame. Swapping ``_fake_decode`` for PIL/ffmpeg is a one-function
change.

The media payloads are the generator's pass-through DCT stubs
(codec._media_stub_bytes — F7 Filter_DoNothing semantics): a JPEG
SOI/APP0 magic, 4× the md5 of the media_ref, EOI. Deterministic in
media_ref → the whole pipeline has a DuckDB oracle via md5() SQL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_BYTES_SCHEMA = "doc_id bigint, media_ref string, payload binary"
MEDIA_META_SCHEMA = (
    "doc_id bigint, media_ref string, fmt string, width int, height int, "
    "n_bytes int, thumb_w int, thumb_h int"
)


def decode_image_real(payload: bytes) -> dict:
    """STUB — the real decoder needs an image library not present in
    this container. On a production cluster, replace with e.g.
    PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError(
        "image codec libraries unavailable in this environment; "
        "use _fake_decode (deterministic) for tests/benchmarks"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic decode stand-in: dimensions from the embedded
    digest bytes (payload[4:8]); format from the magic."""
    fmt = "jpeg" if payload[:2] == b"\xff\xd8" else "unknown"
    width = 1 + (int.from_bytes(payload[4:6], "big") % 1024)
    height = 1 + (int.from_bytes(payload[6:8], "big") % 1024)
    return {"fmt": fmt, "width": width, "height": height, "n_bytes": len(payload)}


def media_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media spans of the synthesized interleaved table."""
    from ..engine import load_documents, synth_spans_df

    spans = synth_spans_df(load_documents(spark, sf_dir))
    return (
        spans.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )


def attach_media_bytes(media: DataFrame) -> DataFrame:
    """media_ref → opaque binary payload (the generator's DCT stub),
    Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codec import _media_stub_bytes

        for pdf in batches:
            yield pdf.assign(
                payload=[_media_stub_bytes(m) for m in pdf["media_ref"]]
            )

    return media.mapInPandas(gen, schema=MEDIA_BYTES_SCHEMA)


def decode_media(with_bytes: DataFrame) -> DataFrame:
    """Vectorized decode + resize stage: one Arrow batch of binary
    payloads in, typed metadata out. thumb = fit into 64×64 (integer
    math, oracle-exact)."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, mref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                m = _fake_decode(bytes(payload))
                scale_den = max(m["width"], m["height"])
                rows.append(
                    {
                        "doc_id": did,
                        "media_ref": mref,
                        **m,
                        "thumb_w": max(1, m["width"] * 64 // scale_den),
                        "thumb_h": max(1, m["height"] * 64 // scale_den),
                    }
                )
            yield pd.DataFrame(rows)

    return with_bytes.mapInPandas(ker, schema=MEDIA_META_SCHEMA)


def media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(attach_media_bytes(media_spans(spark, sf_dir)))


def _hex_to_int(hex_expr: str, lo: int, n: int) -> str:
    """Portable hex→int over substr [lo, lo+n) of a hex string —
    identical text runs in Spark SQL and DuckDB."""
    return (
        "("
        + " + ".join(
            f"(instr('0123456789abcdef', substr({hex_expr}, {lo + k}, 1)) - 1)"
            f" * {16 ** (n - 1 - k)}"
            for k in range(n)
        )
        + ")"
    )


def _media_meta_sql() -> str:
    # payload = ffd8ffe0 || md5*4 || ffd9 → bytes[4:6] = md5 hex[1:4],
    # bytes[6:8] = md5 hex[5:8]; n_bytes = 4 + 64 + 2
    w = f"(1 + ({_hex_to_int('md5(media_ref)', 1, 4)}) % 1024)"
    h = f"(1 + ({_hex_to_int('md5(media_ref)', 5, 4)}) % 1024)"
    return f"""
WITH c AS (
  SELECT doc_id, unnest(range(CAST(ceil(length(text)/80.0) AS BIGINT))) AS i
  FROM documents
),
media AS (
  SELECT doc_id,
         'm' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 16)
           AS media_ref
  FROM c WHERE i % 3 = 2
),
dims AS (
  SELECT doc_id, media_ref, {w} AS width, {h} AS height FROM media
)
SELECT doc_id, media_ref, 'jpeg' AS fmt,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       70 AS n_bytes,
       CAST(greatest(1, width * 64 // greatest(width, height)) AS INT) AS thumb_w,
       CAST(greatest(1, height * 64 // greatest(width, height)) AS INT) AS thumb_h
FROM dims
"""


# ---------------------------------------------------------------------------
# Frame sampling (video-shaped media): the container is opaque binary;
# frame decode is stubbed, the sampling plumbing (batch shape, schema,
# determinism) is real
# ---------------------------------------------------------------------------

FRAME_STEP = 4  # sample every 4th frame
FRAMES_SCHEMA = "doc_id bigint, media_ref string, frame_idx int, frame_tag string"


def sample_frames(with_bytes: DataFrame) -> DataFrame:
    """Treat each media payload as a fake container whose frame count
    derives from its digest (1 + hex[9:12] % 48); emit every
    FRAME_STEP-th frame with a deterministic tag (stub for the real
    frame grab — ffmpeg on a production cluster)."""

    def ker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, refs, idxs, tags = [], [], [], []
            for did, mref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                p = bytes(payload)
                # frame count from container bytes [8:10) — which are
                # digest bytes, so the SQL oracle can re-derive them
                # from md5(media_ref) (DuckDB's md5 has no BLOB form)
                n_frames = 1 + int.from_bytes(p[8:10], "big") % 48
                for fi in range(0, n_frames, FRAME_STEP):
                    ids.append(did)
                    refs.append(mref)
                    idxs.append(fi)
                    tags.append(hashlib.md5(f"{mref}:{fi}".encode()).hexdigest()[:8])
            yield pd.DataFrame(
                {"doc_id": ids, "media_ref": refs, "frame_idx": idxs, "frame_tag": tags}
            )

    return with_bytes.mapInPandas(ker, schema=FRAMES_SCHEMA)


def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(attach_media_bytes(media_spans(spark, sf_dir)))


def _media_frames_sql() -> str:
    # payload bytes [8:10) = md5(media_ref) digest bytes [4:6) =
    # hex chars 9..12 → same value from the hex string directly
    n_frames = f"(1 + ({_hex_to_int('md5(media_ref)', 9, 4)}) % 48)"
    return f"""
WITH c AS (
  SELECT doc_id, unnest(range(CAST(ceil(length(text)/80.0) AS BIGINT))) AS i
  FROM documents
),
media AS (
  SELECT doc_id,
         'm' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 16)
           AS media_ref
  FROM c WHERE i % 3 = 2
),
frames AS (
  SELECT doc_id, media_ref,
         unnest(range(0, {n_frames}, {FRAME_STEP})) AS frame_idx
  FROM media
)
SELECT doc_id, media_ref, CAST(frame_idx AS INT) AS frame_idx,
       substr(md5(media_ref || ':' || CAST(frame_idx AS VARCHAR)), 1, 8) AS frame_tag
FROM frames
"""


def queries():
    return {"media_meta": media_meta, "media_frames": media_frames}


def oracles():
    return {"media_meta": _media_meta_sql(), "media_frames": _media_frames_sql()}
