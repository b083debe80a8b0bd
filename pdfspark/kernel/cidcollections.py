"""CID → Unicode character-collection tables (ISO 32000-1 §9.7.3).

When a Type0 font's CMap maps codes to CIDs of a REGISTERED character
collection (``/CIDSystemInfo /Registry (Adobe) /Ordering (...)``) and
carries neither bf sections nor a /ToUnicode CMap, text extraction
must translate CIDs through the collection's glyph ordering — the
``chr(cid)`` Identity fallback is only correct for Adobe-Identity.

The reference (agolinko/pdfparse) has no CMap support at all; this
module extends past it.  Only mappings that are stable, public
knowledge are shipped: the Adobe-Japan1 ordering opens with the
proportional Roman set — CIDs 1-95 are exactly U+0020-U+007E in
ASCII order (Adobe-Japan1-7 character collection specification,
Adobe TN #5078).  Fuller tables (the JIS/Unicode rows, Adobe-GB1,
Adobe-KR...) are data files distributed by Adobe (cid2code.txt) that
are not available in this environment — ``register_collection``
exists so a deployment can load them; absent an entry the decoder
keeps the documented CID-as-Unicode fallback.
"""

from __future__ import annotations

from typing import Optional

_COLLECTIONS: dict[str, dict[int, str]] = {
    # CIDs 1..95 = the proportional Roman set, U+0020..U+007E in
    # ASCII order (95 printable ASCII glyphs; CID 1 = space)
    "Japan1": {cid: chr(0x20 + cid - 1) for cid in range(1, 96)},
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
