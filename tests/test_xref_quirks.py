"""Classic-xref-table writer-quirk fixtures: the mislabeled-start
salvage (PDFParser.java:346-352) must fire on BOTH row layouts —
strict 20-byte rows (vectorized path) and 19-byte LF-only rows
(token-wise fallback)."""

from __future__ import annotations

import pytest

from pdfspark.kernel import extract_spans


def _build_broken_start_pdf(strict_rows: bool) -> bytes:
    """Minimal 1-page 'Hi' PDF whose xref subsection claims ``1 6``
    (a 1-indexed writer) but whose first row is the free-list head
    ``0 65535 f`` — every object id must be shifted down by one to
    resolve. strict_rows picks 20-byte (" \\n" EOL) vs 19-byte
    ("\\n" EOL) entries."""
    content = b"BT /F1 12 Tf 72 720 Td (Hi) Tj ET"
    bodies = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_off = len(out)
    eol = b" \n" if strict_rows else b"\n"
    out += b"xref\n1 6\n"  # broken: the free head makes this start=0
    out += b"0000000000 65535 f" + eol
    for off in offsets:
        out += b"%010d 00000 n" % off + eol
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


@pytest.mark.parametrize("strict_rows", [True, False])
def test_broken_start_xref_table_shifted(strict_rows):
    status, err, spans = extract_spans(_build_broken_start_pdf(strict_rows))
    assert status == "ok", err
    assert spans == [("text", "Hi", None, 0)]


def test_honest_start_one_subsection_not_shifted():
    """A subsection genuinely starting at object 1 (first row is an
    in-use entry, not the free head) must NOT be shifted."""
    pdf = _build_broken_start_pdf(True)
    # rewrite the table: drop the free-head row, declare `1 5`
    head, _, tail = pdf.partition(b"xref\n1 6\n0000000000 65535 f \n")
    fixed = head + b"xref\n1 5\n" + tail
    # startxref offset is unchanged (the table moved, so patch it)
    xref_off = fixed.index(b"xref\n1 5\n")
    fixed = fixed[: fixed.rindex(b"startxref")] + b"startxref\n%d\n%%%%EOF\n" % xref_off
    status, err, spans = extract_spans(fixed)
    assert status == "ok", err
    assert spans == [("text", "Hi", None, 0)]
