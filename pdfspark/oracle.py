"""Pure-Python single-document oracle (SURVEY.md §7).

The pytest ground truth: runs the same kernel the engine vectorizes,
directly on raw bytes with no Spark — the runnable transcription of
the reference's semantics (the Java reference itself is not runnable
here). Golden metadata assertions for the reference's bundled sample
PDFs are transcribed from ComplexTest.java (tests/test_reference_pdfs.py).
"""

from __future__ import annotations

from .codec import build_pdf, synth_spans_py
from .kernel import extract_meta, extract_spans


def oracle_roundtrip(doc_id: str, text: str, variant: str = "classic"):
    """Generate a payload from synthesized spans and extract it back;
    returns (expected_spans, status, error, got_spans)."""
    spans = synth_spans_py(doc_id, text)
    payload = build_pdf(doc_id, spans, variant)
    status, err, got = extract_spans(payload)
    return spans, status, err, got


def oracle_extract(payload: bytes):
    return extract_spans(payload)


def oracle_meta(payload: bytes):
    return extract_meta(payload)
