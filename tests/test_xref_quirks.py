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


def test_corrupt_first_row_stays_typed_error():
    """A corrupt first xref row in a start==1 subsection (non-numeric
    offset/gen) must stay inside the kernel's typed-error contract —
    the broken-first-free probe and the row parse both skip it softly
    instead of leaking ValueError (r2 advisor finding)."""
    pdf = _build_broken_start_pdf(True)
    head, mid, tail = pdf.partition(b"0000000000 65535 f \n")
    assert mid
    # same 20-byte geometry (cols 10 and 16 stay spaces) so the strict
    # vectorized path is taken, but both numeric fields are garbage
    corrupt = head + b"xxxxxxxxxx yyyyy f \n" + tail
    status, err, spans = extract_spans(corrupt)  # PERMISSIVE wrapper
    assert "ValueError" not in (err or "")
    # and the raw parser never raises anything but EParseError
    from pdfspark.kernel.errors import EParseError
    from pdfspark.kernel.xref import Parser

    p = Parser(corrupt)
    try:
        p.parse()
    except EParseError:
        pass


def test_corrupt_nonfirst_row_skipped_softly():
    """Garbage in a NON-first in-use row is skipped with a soft
    structure note; the remaining rows still resolve."""
    pdf = _build_broken_start_pdf(True)
    rows_at = pdf.index(b"0000000000 65535 f \n")
    # corrupt the SECOND row's offset field but keep 'n' flag + geometry
    second = pdf.index(b" n \n", rows_at)  # end of first 'n' row
    start_of_second = second - 16
    corrupt = (
        pdf[:start_of_second] + b"??????????" + pdf[start_of_second + 10 :]
    )
    status, err, spans = extract_spans(corrupt)
    assert "ValueError" not in (err or "")
