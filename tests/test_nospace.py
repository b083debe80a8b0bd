"""Word-boundary inference from glyph geometry (§9.10-adjacent) —
EXTENSION, r8: the reference does no content interpretation at all.
The `nospace` generator variant paints NO space glyph anywhere: every
' ' becomes a positioning-only gap (a −500 TJ kern on even spans, a
`6·len+6 0 Td` jump on odd spans). Extraction with infer_spaces=True
re-inserts one space per rightward gap event that strictly exceeds
θ=1/2 of the word-space displacement ((w₃₂/1000·Tfs + Tc + Tw)·Th)."""

from __future__ import annotations

from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel.extract import extract_spans_doc
from pdfspark.kernel.textops import interpret_content

TEXT = "the quick brown fox jumps over the lazy dog " * 25


def test_nospace_roundtrip_identity():
    for i in range(8):
        did = f"ns{i}"
        spans = synth_spans_py(did, TEXT + "z" * (29 * i))
        got = extract_spans_doc(
            build_pdf(did, spans, "nospace"), infer_spaces=True
        )
        assert got == [(k, t, m, j) for j, (k, t, m, _o) in enumerate(spans)]


def test_nospace_payload_truly_has_no_space_glyphs():
    """Negative control: default extraction of the same payload yields
    space-free text — the spaces exist only as positioning gaps."""
    did = "nsneg"
    spans = synth_spans_py(did, TEXT)
    raw = extract_spans_doc(build_pdf(did, spans, "nospace"))
    texts = [t for k, t, _m, _o in raw if k == "text"]
    assert texts and all(" " not in t for t in texts)


def test_space_runs_and_edges_roundtrip():
    """Consecutive gaps → consecutive spaces; leading/trailing spaces
    inside a chunk survive (one event per former ' ')."""
    text = " lead" + "  dbl   trp " * 40 + "tail "
    did = "nsrun"
    spans = synth_spans_py(did, text)
    got = extract_spans_doc(build_pdf(did, spans, "nospace"), infer_spaces=True)
    assert got == [(k, t, m, j) for j, (k, t, m, _o) in enumerate(spans)]


def test_threshold_is_exactly_half_space_width():
    """θ = 1/2 STRICT, pinned at the boundary: with Tf 12 / w₃₂ 500 /
    Tc 0 / Tw 0 / Th 1 the space displacement is 6.0, so a TJ kern of
    −250 (gap 3.0 == θ·6.0) must NOT become a space, while −251 must.
    Same pin for Td jumps: +3 past the shown width stays glued, +3.0625
    (an exact binary fraction just past θ) splits."""
    res = None  # default font carries no metrics → use /F1 via build?

    def spans_of(content: bytes, resources, resolver):
        return interpret_content(content, resources, resolver, infer_spaces=True)

    # build a real doc to get /F1 resources with metrics
    from pdfspark import codec as C
    from pdfspark.kernel.extract import parse_document

    did = "thr"
    doc = parse_document(build_pdf(did, synth_spans_py(did, "xy"), "classic"))
    page = doc.pages()[0]
    res, resolver = page.resources, doc.parser._resolve

    def txt(content: bytes) -> str:
        sps = spans_of(content, res, resolver)
        return "".join(s[1] for s in sps if s[0] == "text")

    assert txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz [(a) -250 (b)] TJ ET") == "ab"
    assert txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz [(a) -251 (b)] TJ ET") == "a b"
    # Td form: (a) is 6 wide; +9 Td = gap 3 (== θ) stays glued,
    # +9.0625 = gap 3.0625 (> θ, exact binary fraction) splits
    assert txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 10 50 Td (a) Tj 9 0 Td (b) Tj ET") == "ab"
    assert (
        txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 10 50 Td (a) Tj 9.0625 0 Td (b) Tj ET")
        == "a b"
    )
    # a LINE move (y changes) is never a space, however large the jump
    assert txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 10 50 Td (a) Tj 40 -16 Td (b) Tj ET") == "ab"
    # leftward/zero gaps are never spaces
    assert txt(b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz [(a) 250 (b)] TJ ET") == "ab"


def test_scaled_tm_gap_in_text_space():
    """r8 review fix: Td translations are text-space values that land
    in the tlm FRAME (operand × tm scale), while the advance tracker
    accrues text-space units — the frame delta must be divided by
    tm[0] before comparing. With '2 0 0 2' scale, (a) advances 6 text
    units = 12 frame units; a '5 0 Td' (10 frame units) puts the pen
    1 text unit LEFT of the glyph edge, but the pre-fix compare read
    10−6=4 > θ=3 and invented a space. A 0.5-scale matrix mirrors
    the converse (real gaps halved → missed). Rotated frames
    conservatively never fire."""
    from pdfspark import codec as C
    from pdfspark.kernel.extract import parse_document
    from pdfspark.kernel.textops import interpret_content

    did = "thrscale"
    doc = parse_document(build_pdf(did, synth_spans_py(did, "xy"), "classic"))
    page = doc.pages()[0]
    res, resolver = page.resources, doc.parser._resolve

    def txt(content: bytes) -> str:
        sps = interpret_content(content, res, resolver, infer_spaces=True)
        return "".join(s[1] for s in sps if s[0] == "text")

    up = b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 2 0 0 2 50 700 Tm (a) Tj "
    assert txt(up + b"5 0 Td (b) Tj ET") == "ab"     # pen moves LEFT
    assert txt(up + b"6.5 0 Td (b) Tj ET") == "ab"   # gap 0.5 ≤ θ
    assert txt(up + b"9.5 0 Td (b) Tj ET") == "a b"  # gap 3.5 > θ
    down = b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 0.5 0 0 0.5 50 700 Tm (a) Tj "
    assert txt(down + b"9.5 0 Td (b) Tj ET") == "a b"  # gap 3.5 > θ
    assert txt(down + b"6.5 0 Td (b) Tj ET") == "ab"   # gap 0.5 ≤ θ
    rot = b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 0 1 -1 0 50 700 Tm (a) Tj "
    assert txt(rot + b"90 0 Td (b) Tj ET") == "ab"  # rotated: never


def test_mixed_corpus_unchanged_by_inference():
    """infer_spaces on the ORDINARY mixed corpus is a no-op: real
    space glyphs are shown, the −250 form-1 kern sits exactly ON the
    θ boundary, and next-line moves change y."""
    for i in range(5):
        did = f"mix{i}"
        spans = synth_spans_py(did, TEXT)
        pdf = build_pdf(did, spans, ("classic", "crlf", "objstream", "hybrid", "incremental")[i])
        assert extract_spans_doc(pdf, infer_spaces=True) == extract_spans_doc(pdf)
