"""Deterministic spans→PDF generator (SURVEY.md §7 Milestone 0; the
reference's `produce()` path — S3, COSDictionary.java:76-95 et al. —
lifted from single objects to whole documents).

Given one document's spans array it emits a complete PDF byte payload
in one of several structural layouts, each exercising a distinct
kernel path (FIXTURES.md §3 families):

- ``classic``     — classic xref table + trailer         (X2/X3)
- ``crlf``        — same, CRLF EOLs throughout           (B2/B3)
- ``objstream``   — PDF 1.5 xref stream (Flate+Predictor-12, /W
                    /Index) + object streams (/First, N members)
                                                          (X4/X9/F2)
- ``hybrid``      — classic table + /XRefStm pointer      (X3 hybrid)
- ``incremental`` — /Prev chain with a superseding revision AND a
                    generation-precedence decoy           (X3/X5)
- ``filters:<f>`` — content streams encoded with flate / lzw / a85 /
                    ahx / rl / a string of chained filters (F1-F6)
- ``malformed:<kind>`` — noise / only_header / header_eof /
                    zerosized / no_startxref — must be rejected
                    (FileHandlingTest.java:32-56 contract)

Everything is deterministic in (doc_id, spans, variant): no RNG, no
wall clock. The generator runs as a vectorized mapInPandas stage at
table-build time and doubles as the pytest round-trip oracle input.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Optional, Sequence

from .kernel.cos import (
    CDict, CStream, CString, Name, Ref, produce, produce_literal_string,
    serialize_objs,
)
from .kernel.cos import _CTOK as _CTOK_MOD
from .kernel.encodings import WINANSI_CHAR_TO_BYTE

_CTOK_EMIT_CONTENT = getattr(_CTOK_MOD, "emit_content", None)
_CTOK_EMIT_XREF = getattr(_CTOK_MOD, "emit_xref_table", None)
_CTOK_EMIT_XREF_ROWS = getattr(_CTOK_MOD, "emit_xref_rows", None)
from .kernel.filters import (
    a85_encode,
    ahx_encode,
    flate_encode,
    lzw_encode,
    predictor_encode_up,
    rl_encode,
)

# ---------------------------------------------------------------------------
# Deterministic spans synthesis (pure-Python mirror of the SQL in
# __spark_entry__.oracle_sql and the Spark expression in engine.py —
# all three MUST stay in lockstep; tests/test_engine.py asserts it)
# ---------------------------------------------------------------------------

CHUNK = 80
MEDIA_EVERY = 3  # a media span follows every text chunk with i % 3 == 2


def synth_spans_py(doc_id: str, text: str) -> list[tuple[str, Optional[str], Optional[str], int]]:
    """spans := for chunk i: text span at ordinal i + i//3; when
    i%3==2 also a media span at ordinal i + i//3 + 1 with
    media_ref = 'm' + md5(doc_id || ':' || i)[:16]."""
    k = math.ceil(len(text) / CHUNK)
    out = []
    for i in range(k):
        chunk = text[i * CHUNK : (i + 1) * CHUNK]
        out.append(("text", chunk, None, i + i // 3))
        if i % MEDIA_EVERY == 2:
            h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:16]
            out.append(("media", None, "m" + h, i + i // 3 + 1))
    return out


# ---------------------------------------------------------------------------
# Text encoding for content streams
# ---------------------------------------------------------------------------


def _winansi_encode(text: str) -> Optional[bytes]:
    try:  # fast path: pure-ASCII text (the overwhelmingly common case)
        return text.encode("ascii")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in text:
        o = ord(ch)
        if o < 0x80 or (0xA0 <= o <= 0xFF):
            out.append(o)
        elif ch in WINANSI_CHAR_TO_BYTE:
            out.append(WINANSI_CHAR_TO_BYTE[ch])
        else:
            return None
    return bytes(out)


def _show_bytes_simple(text: str) -> Optional[bytes]:
    enc = _winansi_encode(text)
    return None if enc is None else produce_literal_string(enc)


_AGL_REVERSE: Optional[dict] = None


def _agl_reverse() -> dict:
    """char → Adobe glyph name (reverse of the kernel's AGL subset) —
    the generator side of Type3 /Differences encoding."""
    global _AGL_REVERSE
    if _AGL_REVERSE is None:
        from .kernel.textops import _AGL

        _AGL_REVERSE = {v: k for k, v in _AGL.items() if len(v) == 1}
    return _AGL_REVERSE


def _type3_encodable(text: str) -> bool:
    rev = _agl_reverse()
    return all(ch in rev for ch in text)


def _show_bytes_cid(text: str) -> bytes:
    return b"<" + text.encode("utf-16-be").hex().encode("ascii") + b">"


# deterministic ASCII→CJK transliteration (variant cjk:hanzi): a-z →
# U+4E00..U+4E19, mirrored 1:1 by the oracle's translate() — the
# real-CJK no-ToUnicode extraction contract
_HANZI_TRANS = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz",
    "".join(chr(0x4E00 + i) for i in range(26)),
)

# variants cjk:japan1 / cjk:gb1 / cjk:cns1 / cjk:korea1 — embedded
# CMap whose codes map to CIDs of a REGISTERED Adobe character
# collection (NO bf sections, no ToUnicode): extraction must translate
# CIDs through kernel/cidcollections.py, not chr(cid).  Codespace
# <2020>-<207e> → CIDs 1-95 (the spec-documented proportional-Roman
# opening each collection shares); when the variant carries real CJK
# (the a-z transliteration block), a second codespace <e000>-<e019>
# maps to the collection's out-of-band DEMO-SUPPLEMENT CIDs, loaded
# through the cid2code deployment hook.
# (ordering, claimed supplement, translit codepoint base or None,
#  supplement CID base or None, excluded chars)
_COLL_VARIANTS: dict[str, tuple] = {
    "japan1": ("Japan1", 7, None, None, ""),
    "gb1": ("GB1", 5, 0x4E00, 60000, ""),
    "cns1": ("CNS1", 7, 0x9E00, 61000, ""),
    # Korea1 CID 61 (0x5C) is deliberately unshipped (KS X 1003 won
    # sign ambiguity) — backslash spans fall back to the simple font
    "korea1": ("Korea1", 2, 0xAC00, 62000, "\\"),
}


def _collection_cmap(
    ordering: str, supplement: int, cid_base: Optional[int]
) -> bytes:
    extra_cs = b"\n<e000> <e019>" if cid_base is not None else b""
    extra_cr = (
        b"\n<e000> <e019> %d" % cid_base if cid_base is not None else b""
    )
    n = 2 if cid_base is not None else 1
    return (
        b"""%%!PS-Adobe-3.0 Resource-CMap
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Adobe) /Ordering (%s) /Supplement %d >> def
/CMapName /pdfspark-%s-H def
/CMapType 1 def
%d begincodespacerange
<2020> <207e>%s
endcodespacerange
%d begincidrange
<2020> <207e> 1%s
endcidrange
endcmap CMapName currentdict /CMap defineresource pop end end"""
        % (
            ordering.encode(), supplement, ordering.encode(),
            n, extra_cs, n, extra_cr,
        )
    )


def _make_collection_show(
    cp0: Optional[int], exclude: str
) -> "Callable[[str], Optional[bytes]]":
    """Show-bytes encoder for a collection variant: ASCII rides the
    Roman codes <20xx>; the 26-glyph transliteration block (when the
    variant has one) rides the demo-supplement codes <e0xx>; any
    other character punts the whole span to the simple/CID fonts
    (None) — output text is identical either way, only the decode
    path differs."""

    def show(text: str) -> Optional[bytes]:
        out = bytearray()
        for ch in text:
            o = ord(ch)
            if 0x20 <= o <= 0x7E and ch not in exclude:
                out.append(0x20)
                out.append(o)
            elif cp0 is not None and cp0 <= o < cp0 + 26:
                out.append(0xE0)
                out.append(o - cp0)
            else:
                return None
        return b"<" + bytes(out).hex().encode("ascii") + b">"

    return show


def _show_bytes_gbk(text: str) -> Optional[bytes]:
    """Show bytes for the /F3 GBK-EUC-H Type0 font (predefined CMap,
    NO ToUnicode — the extractor must decode via the CMap's byte
    encoding). None when text has chars outside GBK."""
    try:
        return b"<" + text.encode("gbk").hex().encode("ascii") + b">"
    except UnicodeEncodeError:
        return None


def _build_embedded_cmap(chars: Sequence[str]) -> tuple[bytes, dict[str, bytes]]:
    """Fully custom embedded CMap (ISO 32000-1 §9.7.5.3): a mixed
    1-byte ASCII space plus a 2-byte <8140>-<FEFE> space whose codes
    are assigned per unique non-ASCII char, rotating the mapping form
    per char (cidchar with CID = Unicode scalar / bfchar / bfrange) so
    the kernel's codespacerange + cidrange + cidchar + bfchar + bfrange
    parsing is all exercised; deliberately NO ToUnicode on the font.
    Returns (CMap stream bytes, char → 2-byte code map)."""
    code_of: dict[str, bytes] = {}
    cidchars: list[bytes] = []
    bfchars: list[bytes] = []
    bfranges: list[bytes] = []
    for k, ch in enumerate(chars):
        code = bytes((0x81 + k // 0xBF, 0x40 + k % 0xBF))
        code_of[ch] = code
        chex = code.hex().encode("ascii")
        uhex = ch.encode("utf-16-be", "surrogatepass").hex().encode("ascii")
        sec = k % 3
        if sec == 0:
            cidchars.append(b"<%s> %d" % (chex, ord(ch)))
        elif sec == 1:
            bfchars.append(b"<%s> <%s>" % (chex, uhex))
        else:
            bfranges.append(b"<%s> <%s> <%s>" % (chex, chex, uhex))
    parts = [
        b"%!PS-Adobe-3.0 Resource-CMap",
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin\nbegincmap",
        b"/CIDSystemInfo << /Registry (pdfspark) /Ordering (Custom)"
        b" /Supplement 0 >> def",
        b"/CMapName /pdfspark-Custom-H def",
        b"/CMapType 1 def",
        b"2 begincodespacerange\n<00> <7f>\n<8140> <fefe>\nendcodespacerange",
        # 1-byte space: CID == code (covers controls too, lossless)
        b"1 begincidrange\n<00> <7f> 0\nendcidrange",
    ]
    if cidchars:
        parts.append(
            b"%d begincidchar\n" % len(cidchars)
            + b"\n".join(cidchars)
            + b"\nendcidchar"
        )
    if bfchars:
        parts.append(
            b"%d beginbfchar\n" % len(bfchars)
            + b"\n".join(bfchars)
            + b"\nendbfchar"
        )
    if bfranges:
        parts.append(
            b"%d beginbfrange\n" % len(bfranges)
            + b"\n".join(bfranges)
            + b"\nendbfrange"
        )
    parts.append(b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    return b"\n".join(parts), code_of


def _build_chained_embedded_cmap(
    chars: Sequence[str],
) -> tuple[bytes, bytes, dict[str, bytes]]:
    """The SAME logical CMap as _build_embedded_cmap, split across an
    embedded→embedded /UseCMap chain (ISO 32000-1 Table 120): the BASE
    CMap carries both code spaces, the 1-byte cidrange and the k%3==0
    cidchars; the CHILD carries only the bfchar/bfrange sections and
    imports the base (`/pdfspark-Base-H usecmap` + the stream dict's
    /UseCMap ref the extractor follows). The child deliberately has NO
    codespacerange of its own — tokenization must come through the
    inherited spaces, so a broken chain cannot silently pass.
    Returns (base_bytes, child_bytes, char → 2-byte code map)."""
    code_of: dict[str, bytes] = {}
    cidchars: list[bytes] = []
    bfchars: list[bytes] = []
    bfranges: list[bytes] = []
    for k, ch in enumerate(chars):
        code = bytes((0x81 + k // 0xBF, 0x40 + k % 0xBF))
        code_of[ch] = code
        chex = code.hex().encode("ascii")
        uhex = ch.encode("utf-16-be", "surrogatepass").hex().encode("ascii")
        sec = k % 3
        if sec == 0:
            cidchars.append(b"<%s> %d" % (chex, ord(ch)))
        elif sec == 1:
            bfchars.append(b"<%s> <%s>" % (chex, uhex))
        else:
            bfranges.append(b"<%s> <%s> <%s>" % (chex, chex, uhex))

    def _wrap(name: bytes, body: list[bytes]) -> bytes:
        return b"\n".join(
            [
                b"%!PS-Adobe-3.0 Resource-CMap",
                b"/CIDInit /ProcSet findresource begin",
                b"12 dict begin\nbegincmap",
                b"/CIDSystemInfo << /Registry (pdfspark) /Ordering (Custom)"
                b" /Supplement 0 >> def",
                b"/CMapName /%s def" % name,
                b"/CMapType 1 def",
            ]
            + body
            + [
                b"endcmap\nCMapName currentdict /CMap defineresource pop"
                b"\nend\nend"
            ]
        )

    base_body = [
        b"2 begincodespacerange\n<00> <7f>\n<8140> <fefe>\nendcodespacerange",
        b"1 begincidrange\n<00> <7f> 0\nendcidrange",
    ]
    if cidchars:
        base_body.append(
            b"%d begincidchar\n" % len(cidchars)
            + b"\n".join(cidchars)
            + b"\nendcidchar"
        )
    child_body = [b"/pdfspark-Base-H usecmap"]
    if bfchars:
        child_body.append(
            b"%d beginbfchar\n" % len(bfchars)
            + b"\n".join(bfchars)
            + b"\nendbfchar"
        )
    if bfranges:
        child_body.append(
            b"%d beginbfrange\n" % len(bfranges)
            + b"\n".join(bfranges)
            + b"\nendbfrange"
        )
    return (
        _wrap(b"pdfspark-Base-H", base_body),
        _wrap(b"pdfspark-Chained-H", child_body),
        code_of,
    )


def _show_bytes_embedded(text: str, code_of: dict[str, bytes]) -> bytes:
    """Show bytes under the custom embedded CMap: ASCII one byte,
    everything else its assigned 2-byte code."""
    if text.isascii():  # fast path: codes == ordinals, one encode
        return b"<" + text.encode("ascii").hex().encode("ascii") + b">"
    out = bytearray()
    for ch in text:
        o = ord(ch)
        if o < 0x80:
            out.append(o)
        else:
            out += code_of[ch]
    return b"<" + bytes(out).hex().encode("ascii") + b">"


# ---------------------------------------------------------------------------
# Content-stream emission (one BT..ET per text span, one Do per media
# span — the contract interpret_content() inverts)
# ---------------------------------------------------------------------------


_WINANSI_TAB: Optional[bytes] = None


def _winansi_tab() -> bytes:
    """Codepoint→WinAnsi-byte table for the C emitter: index = ord(ch),
    0 = unmapped (the <0x80 / 0xA0-0xFF passthrough ranges are handled
    inline C-side, matching _winansi_encode's precedence)."""
    global _WINANSI_TAB
    if _WINANSI_TAB is None:
        size = max(ord(ch) for ch in WINANSI_CHAR_TO_BYTE) + 1
        tab = bytearray(size)
        for ch, byte in WINANSI_CHAR_TO_BYTE.items():
            tab[ord(ch)] = byte
        _WINANSI_TAB = bytes(tab)
    return _WINANSI_TAB


def _content_for(
    spans: Sequence[tuple],
    image_names: dict[str, str],
    cjk: bool = False,
    embedded_code_of: Optional[dict[str, bytes]] = None,
    form_sink=None,
    type3: bool = False,
    coll_show: Optional[Callable[[str], Optional[bytes]]] = None,
    nospace: bool = False,
) -> tuple[bytes, bool]:
    if (
        _CTOK_EMIT_CONTENT is not None
        and not cjk
        and embedded_code_of is None
        and form_sink is None
        and not type3
        and coll_show is None
        and not nospace
    ):
        # C fast path (structural corpus): byte-parity with the loop
        # below is fuzz-pinned; None = punt (e.g. lone surrogates)
        res = _CTOK_EMIT_CONTENT(
            spans if isinstance(spans, list) else list(spans),
            image_names, _winansi_tab(),
        )
        if res is not None:
            return res
    return _content_for_py(
        spans, image_names, cjk=cjk, embedded_code_of=embedded_code_of,
        form_sink=form_sink, type3=type3, coll_show=coll_show,
        nospace=nospace,
    )


def _nospace_block(text: str, y: int, ordinal: int) -> Optional[bytes]:
    """One span's BT..ET block with NO space glyphs: words painted
    with positioning-only gaps of exactly one space width. Even
    ordinals ride a single TJ array with −500 kern numbers at each
    former ' ' (gap = 500/1000·12·Th₁ = 6 = the w₃₂=500 space
    displacement); odd ordinals ride per-word Tj shows separated by
    `6·len(prev)+6 0 Td` jumps (6 past the shown width). Consecutive
    spaces become consecutive gap events — the extractor's
    one-event-one-space rule reconstructs runs exactly. Returns None
    when any word is not WinAnsi-encodable (caller falls back to a
    plain show WITH spaces)."""
    words = text.split(" ")
    enc = []
    for w in words:
        e = _show_bytes_simple(w)
        if e is None:
            return None
        enc.append(e)
    if ordinal % 2 == 0:
        items: list[bytes] = []
        for k, w in enumerate(words):
            if k:
                items.append(b"-500")
            if w:
                items.append(enc[k])
        return b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 10 %d Td [%s] TJ ET" % (
            y, b" ".join(items),
        )
    ops = [b"BT /F1 12 Tf 0 Tc 0 Tw 100 Tz 10 %d Td" % y]
    for k, w in enumerate(words):
        if k:
            ops.append(b"%d 0 Td" % (6 * len(words[k - 1]) + 6))
        if w:
            ops.append(b"%s Tj" % enc[k])
    ops.append(b"ET")
    return b" ".join(ops)


def _content_for_py(
    spans: Sequence[tuple],
    image_names: dict[str, str],
    cjk: bool = False,
    embedded_code_of: Optional[dict[str, bytes]] = None,
    form_sink=None,
    type3: bool = False,
    coll_show: Optional[Callable[[str], Optional[bytes]]] = None,
    return_parts: bool = False,
    nospace: bool = False,
) -> tuple[bytes, bool]:
    """Returns (content bytes, used_cid_font) — or (parts list, ...)
    with ``return_parts=True``: exactly ONE part per span, in span
    order (the `tagged` variant wraps each part in its own
    marked-content section before scrambling the paint order).
    Show-operator form
    rotates by ordinal to exercise Tj / TJ / ' (ISO 32000-1 §9.4.3).
    ``cjk`` routes GBK-encodable text through /F3 (Type0 + predefined
    GBK-EUC-H CMap, no ToUnicode); ``embedded_code_of`` routes ALL
    text through /F3 as codes under the custom embedded CMap.
    ``form_sink(block_bytes) -> resource_name`` diverts every EVEN
    text span's BT..ET block into a Form XObject; the page content
    then places it with `/name Do` at the same point in the stream,
    so the span ORDER contract is identical (the interpreter recurses
    into forms in encounter order)."""
    parts: list[bytes] = []
    used_cid = False
    y = 720
    for ordinal, (kind, text, media_ref, _off) in enumerate(spans):
        if kind == "media":
            res_name = image_names[media_ref]
            parts.append(b"q 100 0 0 50 10 %d cm /%s Do Q" % (y, res_name.encode()))
            y -= 60
            continue
        if nospace:
            # r8 word-boundary corpus: NO space glyph is ever shown —
            # every ' ' becomes a positioning-only gap of exactly one
            # space width (6 units at Tf 12 / w₃₂=500 / Th=1), even
            # ordinals as TJ kern numbers (−500), odd ordinals as Td
            # jumps past the shown width (6·len+6). Only infer_spaces
            # extraction recovers the text. Non-WinAnsi spans fall to
            # a plain Tj WITH spaces (no gap events fire on a bare
            # show, so the identity still holds for them).
            block = _nospace_block(text or "", y, ordinal)
            if block is not None:
                parts.append(block)
                y -= 16
                continue
        simple = _show_bytes_simple(text or "")
        if coll_show is not None and text:
            # character-collection codes: every encodable span rides
            # /F3 (Roman CIDs + demo-supplement CJK CIDs); everything
            # else falls to /F1//F2
            gbk: Optional[bytes] = coll_show(text)
            _emb = coll_show
        elif embedded_code_of is not None:
            def _emb(t, _c=embedded_code_of):
                return _show_bytes_embedded(t, _c)

            gbk: Optional[bytes] = _emb(text or "")
        else:
            gbk = _show_bytes_gbk(text or "") if cjk else None
            _emb = _show_bytes_gbk
        if gbk is not None:
            font, shown, part_fn = b"/F3", gbk, _emb
        elif simple is None:
            used_cid = True
            font, shown = b"/F2", _show_bytes_cid(text or "")
        elif type3 and _type3_encodable(text or ""):
            # Type3 glyph-procedure font: same byte codes, decoded via
            # the /Differences → AGL name table
            font, shown = b"/F4", simple
        else:
            font, shown = b"/F1", simple
        form = ordinal % 4
        # Every form sets Tc/Tw/Tz EXPLICITLY (text state persists
        # across BT/ET, §9.3.1 — explicit values keep the closed-form
        # geometry oracle free of cross-span state), and every value is
        # an exact binary fraction so width sums are bit-identical
        # between the kernel and the SQL oracle:
        #   form 0: Tc=.25 Tw=.5  Th=1   → w = 6.25·len + .5·spaces
        #   form 1: Tc=0   Tw=0   Th=.5  → w = 3·len   (TJ kern excl.)
        #   form 2: Tc=.125 Tw=0  Th=1   → w = 6.125·len
        #   form 3: " sets Tw=2 Tc=1, Th=.5 → w = 3.5·len + spaces
        if form == 0:
            # Tj plus graphics no-ops the interpreter must skip with
            # their operands (q/cm, §9.3)
            block = (
                b"q 1 0 0 1 0 0 cm BT %s 12 Tf 0.25 Tc 0.5 Tw 100 Tz 10 %d Td %s Tj ET Q"
                % (font, y, shown)
            )
        elif form == 1:
            # split the span across a TJ kerning array (§9.4.3); the
            # extractor must reassemble exactly
            splitter = (
                part_fn
                if gbk is not None
                else (_show_bytes_simple if simple is not None else None)
            )
            if splitter is not None and text and len(text) > 1:
                mid = len(text) // 2
                a = splitter(text[:mid])
                b = splitter(text[mid:])
                block = (
                    b"BT %s 12 Tf 0 Tc 0 Tw 50 Tz 10 %d Td [%s -250 %s] TJ ET"
                    % (font, y, a, b)
                )
            else:
                block = (
                    b"BT %s 12 Tf 0 Tc 0 Tw 50 Tz 10 %d Td [%s] TJ ET"
                    % (font, y, shown)
                )
        elif form == 2:
            block = (
                b"BT %s 12 Tf 0.125 Tc 0 Tw 100 Tz 14 TL 10 %d Td %s ' ET"
                % (font, y, shown)
            )
        else:
            # Tm positioning + the " operator (aw ac string, §9.4.3 —
            # itself SETS Tw=2 Tc=1)
            block = (
                b'BT %s 12 Tf 50 Tz 14 TL 1 0 0 1 10 %d Tm 2 1 %s " ET'
                % (font, y, shown)
            )
        if form_sink is not None and ordinal % 2 == 0:
            parts.append(b"/%s Do" % form_sink(block))
        else:
            parts.append(block)
        y -= 16
    if return_parts:
        return parts, used_cid
    return b"\n".join(parts), used_cid


_FILTER_ENCODERS = {
    "flate": (flate_encode, Name("FlateDecode")),
    "lzw": (lzw_encode, Name("LZWDecode")),
    "a85": (a85_encode, Name("ASCII85Decode")),
    "ahx": (ahx_encode, Name("ASCIIHexDecode")),
    "rl": (rl_encode, Name("RunLengthDecode")),
}


_N_FILTER_EC = Name("Filter")
_N_LENGTH_EC = Name("Length")


def _encode_content(body: bytes, filters: Sequence[str]) -> CStream:
    """Apply encoders in order; /Filter array lists DECODE order =
    reverse of encode order (StreamDecoder.java:180-204 chain)."""
    names: list[Name] = []
    for f in filters:
        enc, name = _FILTER_ENCODERS[f]
        body = enc(body)
        names.insert(0, name)
    d = CDict()
    if len(names) == 1:
        d[_N_FILTER_EC] = names[0]
    elif names:
        d[_N_FILTER_EC] = list(names)
    d[_N_LENGTH_EC] = len(body)
    return CStream(d, body)


# ---------------------------------------------------------------------------
# Document object-graph builder
# ---------------------------------------------------------------------------

_TOUNICODE_IDENTITY = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
/CMapName /Adobe-Identity-UCS def /CMapType 2 def
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange <0000> <FFFF> <0000> endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end"""

SPANS_PER_PAGE = 5
PAGE_TREE_FANOUT = 4


class _Graph:
    """Numbered-object store (the builder's XRefTable inverse)."""

    def __init__(self):
        self.objs: dict[int, object] = {}
        self._next = 1
        self.content_nums: list[int] = []

    def add(self, val) -> int:
        n = self._next
        self._next += 1
        self.objs[n] = val
        return n

    def reserve(self) -> int:
        n = self._next
        self._next += 1
        return n


def _media_stub_bytes(media_ref: str) -> bytes:
    h = hashlib.md5(media_ref.encode()).digest()
    return b"\xff\xd8\xff\xe0" + h * 4 + b"\xff\xd9"


def _media_bmp_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) BI_RGB 24-bit BMP, deterministic in
    media_ref: dims 1-8 px from digest bytes, solid color from digest
    bytes 2-4 — so the decode query's width/height/channel means are
    closed-form SQL over md5(media_ref)."""
    import struct

    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    r, g, b = h[2], h[3], h[4]
    stride = (w * 3 + 3) & ~3
    row = (bytes((b, g, r)) * w) + b"\x00" * (stride - w * 3)
    pixels = row * ht
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, ht, 1, 24, 0, len(pixels),
                      2835, 2835, 0, 0)
    )
    return header + pixels


def _media_png_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) 8-bit RGB PNG, deterministic in media_ref:
    same dims/color contract as _media_bmp_bytes (digest bytes 0-4) —
    zlib is stdlib, so both sides of the oracle stay library-free.
    Scanlines alternate filter None (raw color bytes) and filter Up
    (all-zero residuals against the previous row), so real
    unfiltering runs on every decode."""
    import struct
    import zlib

    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = bytes((h[2], h[3], h[4]))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, ht, 8, 2, 0, 0, 0)
    row = color * w
    scan = b"".join(
        (b"\x02" + b"\x00" * len(row))  # Up residual of a flat image
        if y and y % 2
        else (b"\x00" + row)
        for y in range(ht)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF-flavor LZW encoder (LSB-first; clear/EOD; width grows when
    next_code reaches 2^width, cap 12 then clear) — the inverse of the
    decoder in ops/multimodal._gif_lzw_decode."""
    clear = 1 << min_code
    eod = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1
    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = eod + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w = w + c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # lockstep: the decoder lags one entry (it adds our entry E_t
        # only when reading C_{t+1}), so its table size when reading
        # the NEXT code is next_code − 1; it widens at 2^width
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear)
            table = {bytes([cc]): cc for cc in range(clear)}
            next_code = eod + 1
            width = min_code + 1
        w = c
    if w:
        emit(table[w])
    emit(eod)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _media_gif_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) GIF89a, deterministic in media_ref: same
    dims/color contract as the BMP/PNG twins (digest bytes 0-4) — a
    2-entry global palette whose entry 0 is the color, all pixels
    index 0, real GIF-LZW data sub-blocks. Digest byte 7 rotates the
    INTERLACE flag (late-r8): solid pixels make the pass-order row
    permutation an identity, so the oracle is untouched while the
    decoder's de-interlace branch runs on half the corpus (the
    varied-pixel permutation itself is pinned in pytest)."""
    import struct

    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = bytes((h[2], h[3], h[4]))
    interlace = 0x40 if h[7] % 2 else 0
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, ht, 0x80, 0, 0)  # GCT, 2 entries
    out += color + b"\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, ht, interlace)
    min_code = 2  # spec minimum
    out.append(min_code)
    data = _gif_lzw_encode(b"\x00" * (w * ht), min_code)
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _media_tiff_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) baseline TIFF, deterministic in media_ref:
    same dims/color contract as the BMP/PNG/GIF twins; compression
    rotates none/LZW/PackBits on digest byte 6 (TIFF-LZW IS the
    PDF-flavor MSB early-change LZW and TIFF PackBits IS PDF
    RunLengthDecode — a trailing 0x80 is legal no-op filler there —
    so kernel.filters serves both). The oracle is unchanged by the
    rotation: fmt/dims/means derive from the digest, not the
    compressor."""
    import struct

    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = bytes((h[2], h[3], h[4]))
    comp = (1, 5, 32773)[h[6] % 3]
    pixels = color * (w * ht)
    if comp == 5:
        pixels = lzw_encode(pixels)
    elif comp == 32773:
        pixels = rl_encode(pixels)
    # layout: 8-byte header | pixel strip | IFD
    strip_off = 8
    ifd_off = strip_off + len(pixels)
    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, ht),           # ImageLength
        (258, 3, 3, None),         # BitsPerSample [8,8,8] (external)
        (259, 3, 1, comp),         # Compression
        (262, 3, 1, 2),            # Photometric RGB
        (273, 4, 1, strip_off),    # StripOffsets
        (277, 3, 1, 3),            # SamplesPerPixel
        (278, 3, 1, ht),           # RowsPerStrip
        (279, 4, 1, len(pixels)),  # StripByteCounts
    ]
    bits_off = ifd_off + 2 + len(entries) * 12 + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += pixels
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            out += struct.pack("<HHII", tag, typ, cnt, bits_off)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += struct.pack("<HHH", 8, 8, 8)
    return bytes(out)


# --- baseline JPEG (r5): a real SOF0 encoder, no codec library ------
#
# The lossless-roundtrip trick that makes JPEG oracle-able: per-MCU
# SOLID color + all-ones quantization tables.  The FDCT of a constant
# 8×8 block is DC-only (DC = 8·(v−128), every AC exactly 0), quant 1
# stores it losslessly, and the IDCT of a DC-only block is exactly
# constant again — so the ONLY lossy step is RGB↔YCbCr, which both
# sides implement in the same integer fixed-point arithmetic
# (_jpeg_ycc / _jpeg_rgb below == the SQL mirror in
# ops/multimodal._media_decode_sql).  Entropy coding is REAL canonical
# Huffman (custom minimal tables: every emitted code path is one the
# decoder must genuinely walk).

# DC table: size categories 0..11, all at code length 4 (canonical
# codes 0000..1011).  AC table: the single EOB symbol at length 2.
JPEG_DC_BITS = (0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
JPEG_DC_VALS = tuple(range(12))
JPEG_AC_BITS = (0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
JPEG_AC_VALS = (0x00,)  # EOB


def _jpeg_ycc(r: int, g: int, b: int) -> tuple[int, int, int]:
    """RGB → YCbCr in 16.16 fixed point (floor shift + clamp) — the
    integer mirror of the JFIF float formulas; bit-identical to the
    SQL oracle's expressions."""
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = (8421376 - 11059 * r - 21712 * g + 32768 * b + 32768) >> 16
    cr = (8421376 + 32768 * r - 27439 * g - 5329 * b + 32768) >> 16
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _jpeg_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """YCbCr → RGB, same fixed-point contract (the decoder's inverse;
    numerators offset by 2^24 so floor-shift == non-negative integer
    division in every engine, incl. DuckDB's truncating //)."""
    r = ((65536 * y + 91881 * cr - 11760768 + 32768 + 16777216) >> 16) - 256
    g = (
        (65536 * y - 22554 * cb - 46802 * cr + 8877568 + 32768 + 16777216)
        >> 16
    ) - 256
    b = ((65536 * y + 116130 * cb - 14864640 + 32768 + 16777216) >> 16) - 256
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)  # 1-fill
        return bytes(self.out)

    def rst(self, n: int) -> None:
        """Emit a restart marker (r8, T.81 F.1.2.3): 1-fill pad to the
        byte boundary (put() stuffs a 00 if the pad byte lands on FF),
        then the RAW FFD0+n marker — markers are never stuffed."""
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes((0xFF, 0xD0 + (n & 7)))


def _huff_codes(bits: Sequence[int], vals: Sequence[int]) -> dict:
    """Canonical JPEG Huffman code assignment (T.81 Annex C)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_put_dc(w: _JpegBitWriter, codes: dict, diff: int) -> None:
    mag, cat = abs(diff), 0
    while mag:
        cat += 1
        mag >>= 1
    w.put(*codes[cat])
    if cat:
        w.put(diff if diff >= 0 else diff - 1, cat)  # T.81 F.1.2.1


_JPEG_444_SAMPLING = b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
_JPEG_420_SAMPLING = b"\x01\x22\x00\x02\x11\x00\x03\x11\x00"  # Y 2×2


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    import struct

    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_assemble(
    w: int,
    h: int,
    scan: bytes,
    sampling: bytes = _JPEG_444_SAMPLING,
    dri: Optional[int] = None,
) -> bytes:
    """Shared baseline (SOF0) framing for the generator twins — the
    r8-review dedup of three byte-identical assemblers: all-ones DQT
    table 0, SOF0 with the given per-component sampling bytes, the
    canonical DC+AC DHT pair, an optional DRI segment, the
    single-scan SOS, then the entropy data. Twins differ ONLY in
    sampling / DRI / how they built the scan."""
    import struct

    def dht(cls: int, tid: int, bits: Sequence[int], vals) -> bytes:
        return _jpeg_seg(
            0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        )

    parts = [
        b"\xff\xd8",
        _jpeg_seg(0xFFDB, b"\x00" + b"\x01" * 64),  # table 0, all ones
        _jpeg_seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + sampling),
        dht(0, 0, JPEG_DC_BITS, JPEG_DC_VALS),
        dht(1, 0, JPEG_AC_BITS, JPEG_AC_VALS),
    ]
    if dri is not None:
        parts.append(_jpeg_seg(0xFFDD, struct.pack(">H", dri)))
    parts += [
        _jpeg_seg(0xFFDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"),
        scan,
        b"\xff\xd9",
    ]
    return b"".join(parts)


def _jpeg_bytes(w: int, h: int, mcu_color) -> bytes:
    """Baseline JPEG (SOF0, 4:4:4, all-ones quant): w×h image where
    MCU (i,j) is the solid RGB color ``mcu_color(j, i)``.  Real
    marker segments + real canonical-Huffman entropy data."""
    dc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    bw = _JpegBitWriter()
    mx, my = (w + 7) // 8, (h + 7) // 8
    pred = [0, 0, 0]
    for j in range(my):
        for i in range(mx):
            ycc = _jpeg_ycc(*mcu_color(j, i))
            for c in range(3):
                dc_val = 8 * (ycc[c] - 128)
                _jpeg_put_dc(bw, dc, dc_val - pred[c])
                pred[c] = dc_val
                bw.put(*ac[0x00])  # EOB: all 63 AC are zero
    return _jpeg_assemble(w, h, bw.flush())


def _jpeg_420_bytes(w: int, h: int, mcu_color) -> bytes:
    """Baseline JPEG with 4:2:0 chroma subsampling (r8) — the
    dominant real-world JPEG shape: Y sampled 2×2, Cb/Cr 1×1, MCU =
    16×16 pixels carrying 4 Y blocks + Cb + Cr (T.81 A.2.3). Same
    solid-MCU lossless contract as `_jpeg_bytes` (DC-only blocks,
    all-ones quant): MCU (i,j) is the solid RGB color
    ``mcu_color(j, i)``; downsampled solid chroma upsamples back to
    the identical pixel, so the decoder's means stay the exact
    YCbCr fixed-point roundtrip the SQL oracle mirrors."""
    dc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    bw = _JpegBitWriter()
    mx, my = (w + 15) // 16, (h + 15) // 16
    pred = [0, 0, 0]
    for j in range(my):
        for i in range(mx):
            ycc = _jpeg_ycc(*mcu_color(j, i))
            yv = 8 * (ycc[0] - 128)
            for _ in range(4):  # 4 solid Y blocks per MCU
                _jpeg_put_dc(bw, dc, yv - pred[0])
                pred[0] = yv
                bw.put(*ac[0x00])
            for c in (1, 2):  # one Cb + one Cr block
                v = 8 * (ycc[c] - 128)
                _jpeg_put_dc(bw, dc, v - pred[c])
                pred[c] = v
                bw.put(*ac[0x00])
    return _jpeg_assemble(w, h, bw.flush(), sampling=_JPEG_420_SAMPLING)


def _jpeg_dri_bytes(w: int, h: int, mcu_color, ri: int = 2) -> bytes:
    """Baseline JPEG (SOF0, 4:4:4) WITH restart intervals (r8): a DRI
    segment pins ``ri`` MCUs per interval and a sequence-numbered
    RSTn marker separates intervals in the entropy data — after each
    marker the decoder must byte-align and reset its DC predictions,
    so an encoder-side reset here is load-bearing, not decorative.
    Same solid-MCU lossless contract as `_jpeg_bytes`: MCU (i,j) is
    the solid RGB color ``mcu_color(j, i)``."""
    dc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac = _huff_codes(JPEG_AC_BITS, JPEG_AC_VALS)
    bw = _JpegBitWriter()
    mx, my = (w + 7) // 8, (h + 7) // 8
    pred = [0, 0, 0]
    for m in range(mx * my):
        if m and m % ri == 0:
            bw.rst(m // ri - 1)
            pred = [0, 0, 0]  # F.2.1.3.1: predictions reset at RSTn
        j, i = divmod(m, mx)
        ycc = _jpeg_ycc(*mcu_color(j, i))
        for c in range(3):
            dc_val = 8 * (ycc[c] - 128)
            _jpeg_put_dc(bw, dc, dc_val - pred[c])
            pred[c] = dc_val
            bw.put(*ac[0x00])  # EOB: all 63 AC are zero
    return _jpeg_assemble(w, h, bw.flush(), dri=ri)


# Progressive AC table: the EOBn symbols n<<4 for n = 0..6 (EOB runs
# up to 64+extra blocks — covers every geometry the generator emits),
# all at canonical length 3.
JPEG_PROG_AC_BITS = (0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
JPEG_PROG_AC_VALS = tuple(n << 4 for n in range(7))


def _jpeg_progressive_bytes(w: int, h: int, mcu_color) -> bytes:
    """Progressive JPEG (SOF2) with the same solid-MCU lossless
    contract as the baseline encoder (DC-only blocks, all-ones
    quant).  Real multi-scan structure per T.81 Annex G: interleaved
    DC-first with successive approximation (Al=1), a DC refinement
    scan of raw LSBs (no Huffman), then per-component
    spectral-selection AC bands 1-5 and 6-63 — every band all-zero,
    coded as genuine EOBn runs (run = block count, extension bits
    included), so a decoder must walk DC approximation, refinement
    bit append, band progression AND EOB-run accounting to land on
    the pixels."""
    import struct

    dc = _huff_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    ac = _huff_codes(JPEG_PROG_AC_BITS, JPEG_PROG_AC_VALS)
    mx, my = (w + 7) // 8, (h + 7) // 8
    nblocks = mx * my
    dcvals = []
    for j in range(my):
        for i in range(mx):
            ycc = _jpeg_ycc(*mcu_color(j, i))
            dcvals.append(tuple(8 * (v - 128) for v in ycc))

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return struct.pack(">HH", 0xFFDA, len(body) + 2) + body

    scans: list[bytes] = []
    # scan 1: DC first pass, interleaved, point transform Al=1
    # (arithmetic shift per G.1.2.1)
    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    for b in range(nblocks):
        for c in range(3):
            t = dcvals[b][c] >> 1
            _jpeg_put_dc(bw, dc, t - pred[c])
            pred[c] = t
    scans.append(sos([1, 2, 3], 0, 0, 0, 1) + bw.flush())
    # scan 2: DC refinement — one raw LSB per block per component
    bw = _JpegBitWriter()
    for b in range(nblocks):
        for c in range(3):
            bw.put(dcvals[b][c] & 1, 1)
    scans.append(sos([1, 2, 3], 0, 0, 1, 0) + bw.flush())
    # AC band scans (single-component, all-zero → one EOBn run each)
    for cid in (1, 2, 3):
        for ss, se in ((1, 5), (6, 63)):
            bw = _JpegBitWriter()
            n = nblocks.bit_length() - 1
            bw.put(*ac[n << 4])
            if n:
                bw.put(nblocks - (1 << n), n)
            scans.append(sos([cid], ss, se, 0, 0) + bw.flush())

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(cls: int, tid: int, bits: Sequence[int], vals) -> bytes:
        return seg(
            0xFFC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        )

    dqt = seg(0xFFDB, b"\x00" + b"\x01" * 64)
    sof = seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00",
    )
    return (
        b"\xff\xd8"
        + dqt
        + sof
        + dht(0, 0, JPEG_DC_BITS, JPEG_DC_VALS)
        + dht(1, 0, JPEG_PROG_AC_BITS, JPEG_PROG_AC_VALS)
        + b"".join(scans)
        + b"\xff\xd9"
    )


def _media_jpeg_progressive_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) progressive JPEG, deterministic in
    media_ref — same dims/color contract as the baseline twin (digest
    bytes 0-4), same YCbCr-roundtrip means oracle."""
    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = (h[2], h[3], h[4])
    return _jpeg_progressive_bytes(w, ht, lambda j, i: color)


def _media_jpeg_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) baseline JPEG, deterministic in media_ref:
    same dims/color contract as the BMP/PNG/GIF/TIFF twins (digest
    bytes 0-4).  The decoded channel means are the YCbCr-roundtripped
    color — closed-form over md5(media_ref) because both directions
    are the shared integer fixed-point converters."""
    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = (h[2], h[3], h[4])
    return _jpeg_bytes(w, ht, lambda j, i: color)


def _media_jpeg_420_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) 4:2:0-subsampled baseline JPEG (r8), same
    dims/color contract as the other twins: dims ≤8 keep it a single
    16×16 MCU, solid color, so chroma downsample→replicate is
    lossless and the means oracle is the same YCbCr roundtrip."""
    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = (h[2], h[3], h[4])
    return _jpeg_420_bytes(w, ht, lambda j, i: color)


def _media_jpeg_dri_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) baseline JPEG WITH a restart interval (r8),
    same dims/color contract as the other twins. Dims ≤8 make it a
    single MCU — no RSTn marker fits between intervals, so this twin
    exercises the DRI-segment parse and the RST-aware entropy-data
    skip; the multi-MCU restart machinery (marker sequencing, DC
    prediction resets, byte alignment) is pinned in pytest where the
    geometry is free (tests/test_ops.py)."""
    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    color = (h[2], h[3], h[4])
    return _jpeg_dri_bytes(w, ht, lambda j, i: color, ri=1)


def _media_avi_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) AVI video, deterministic in media_ref — the
    video leg of the multimodal triad (r6, closing the last decode
    stub).  RIFF 'AVI ' container with a full hdrl (avih + strl
    strh/strf) and a movi LIST of 2 + digest[8] % 6 solid-color
    frames.  The codec rotates on digest[9]: even → uncompressed DIB
    ('00db' chunks, raw bottom-up BGR rows with 4-byte stride padding
    — the BMP pixel layout), odd → MJPEG ('00dc' chunks that ARE
    baseline JPEGs from _jpeg_bytes).  Frame k's solid color is the
    base color (digest bytes 2-4) shifted +k mod 256 per channel, so
    every per-frame channel mean stays closed-form SQL over
    md5(media_ref)."""
    import struct

    h = hashlib.md5(media_ref.encode()).digest()
    w = 1 + h[0] % 8
    ht = 1 + h[1] % 8
    n_frames = 2 + h[8] % 6
    mjpg = h[9] % 2 == 1

    frames = []
    for k in range(n_frames):
        r, g, b = (h[2] + k) % 256, (h[3] + k) % 256, (h[4] + k) % 256
        if mjpg:
            frames.append((b"00dc", _jpeg_bytes(w, ht, lambda j, i: (r, g, b))))
        else:
            stride = (w * 3 + 3) & ~3
            row = bytes((b, g, r)) * w + b"\x00" * (stride - w * 3)
            frames.append((b"00db", row * ht))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) % 2 else b"")
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_frame = max(len(fb) for _, fb in frames)
    avih = struct.pack(
        "<10I4x4x4x4x", 40000, max_frame * 25, 0, 0x10, n_frames, 0, 1,
        max_frame, w, ht,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG" if mjpg else b"DIB ", 0, 0, 0, 0,
        1, 25, 0, n_frames, max_frame, 0xFFFFFFFF, 0, 0, 0, w, ht,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, ht, 1, 24,
        struct.unpack("<I", b"MJPG")[0] if mjpg else 0,
        max_frame, 2835, 2835, 0, 0,
    )
    body = (
        b"AVI "
        + lst(b"hdrl",
              chunk(b"avih", avih)
              + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", b"".join(chunk(cc, fb) for cc, fb in frames))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _media_wav_bytes(media_ref: str) -> bytes:
    """A REAL (decodable) PCM-16 mono WAV, deterministic in
    media_ref: sample rate, length and amplitude from digest bytes
    5-7; samples alternate ±A so peak == A exactly — every decoded
    field is closed-form SQL over md5(media_ref)."""
    import struct

    h = hashlib.md5(media_ref.encode()).digest()
    rate = 8000 + (h[5] % 8) * 1000
    n = 16 + h[6] % 240
    amp = 1 + (h[7] * 117) % 30000
    data = struct.pack(
        "<%dh" % n, *((amp if i % 2 == 0 else -amp) for i in range(n))
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# Hot Name spellings + constant dict shapes, hoisted: build_object_graph
# runs once per document and the per-call Name()/setitem churn was a
# measurable slice of generation.  Templates carry placeholder values
# for the per-doc keys (overwrite preserves position → identical bytes).
_N_NAME = Name("Name")
_N_LENGTH = Name("Length")
_N_TYPE = Name("Type")
_N_PAGE = Name("Page")
_N_CONTENTS = Name("Contents")

_IMG_DICT_TEMPLATE = CDict()
_IMG_DICT_TEMPLATE[_N_TYPE] = Name("XObject")
_IMG_DICT_TEMPLATE[Name("Subtype")] = Name("Image")
_IMG_DICT_TEMPLATE[_N_NAME] = Name("x")
_IMG_DICT_TEMPLATE[Name("Width")] = 8
_IMG_DICT_TEMPLATE[Name("Height")] = 8
_IMG_DICT_TEMPLATE[Name("ColorSpace")] = Name("DeviceRGB")
_IMG_DICT_TEMPLATE[Name("BitsPerComponent")] = 8
_IMG_DICT_TEMPLATE[Name("Filter")] = Name("DCTDecode")
_IMG_DICT_TEMPLATE[_N_LENGTH] = 0

# hot per-document Name constants (a Name() call is a str-subclass
# construction — hoisting kills ~40 of them per generated doc)
_N_PARENT = Name("Parent")
_N_KIDS = Name("Kids")
_N_COUNT = Name("Count")
_N_PAGES = Name("Pages")
_N_SIZE = Name("Size")
_N_ROOT = Name("Root")
_N_INFO = Name("Info")
_N_ID = Name("ID")
_N_PREV = Name("Prev")
_N_FILTER = Name("Filter")
_N_FONT = Name("Font")
_N_XOBJECT = Name("XObject")
_N_RESOURCES = Name("Resources")
_N_MEDIABOX = Name("MediaBox")

# /F1 + FontDescriptor: fully constant objects at FIXED numbers (4, 5
# by build_object_graph's reserve order) shared across all documents.
# Constant-width metrics so the extractor can project span WIDTHS
# (glyph-advance sum): a 1-entry /Widths window + /MissingWidth
# covering everything else — 500/1000 em → 0.5 × size per char,
# SQL-expressible, and only TWO numbers to tokenize per document
# (a full 95-entry array measurably slowed structural parse).
_FDESC_CONST = CDict()
_FDESC_CONST[_N_TYPE] = Name("FontDescriptor")
_FDESC_CONST[Name("FontName")] = Name("Helvetica")
_FDESC_CONST[Name("Flags")] = 32
_FDESC_CONST[Name("MissingWidth")] = 500
_F1_CONST = CDict()
_F1_CONST[_N_TYPE] = _N_FONT
_F1_CONST[Name("Subtype")] = Name("Type1")
_F1_CONST[Name("BaseFont")] = Name("Helvetica")
_F1_CONST[Name("Encoding")] = Name("WinAnsiEncoding")
_F1_CONST[Name("FirstChar")] = 32
_F1_CONST[Name("LastChar")] = 32
_F1_CONST[Name("Widths")] = [500]
_F1_CONST[Name("FontDescriptor")] = Ref(5, 0)

# page skeleton: Type/Contents/Parent in final insertion order (the
# copy keeps key positions, so emitted bytes are unchanged)
_PAGE_TEMPLATE = CDict()
_PAGE_TEMPLATE[_N_TYPE] = _N_PAGE
_PAGE_TEMPLATE[_N_CONTENTS] = 0
_PAGE_TEMPLATE[_N_PARENT] = 0

_CATALOG_TEMPLATE = CDict()
_CATALOG_TEMPLATE[_N_TYPE] = Name("Catalog")
_CATALOG_TEMPLATE[_N_PAGES] = Ref(2, 0)  # pages root is always obj 2

_REF_PAGES_ROOT = Ref(2, 0)
_REF_F1 = Ref(4, 0)
_N_F1 = Name("F1")

_N_I_TITLE = Name("Title")
_N_I_AUTHOR = Name("Author")
_N_I_SUBJECT = Name("Subject")
_N_I_KEYWORDS = Name("Keywords")
_N_I_CREATOR = Name("Creator")
_N_I_PRODUCER = Name("Producer")
_N_I_CREATIONDATE = Name("CreationDate")
_N_I_TRAPPED = Name("Trapped")
_N_FALSE = Name("False")
_CS_AUTHOR = CString(b"pdfspark-gen")
_CS_SUBJECT = CString(b"synthetic")
_CS_CREATOR = CString(b"pdfspark")
_CS_PRODUCER = CString(b"pdfspark codec")
_N_XREF = Name("XRef")
_N_W = Name("W")
_N_INDEX = Name("Index")
_N_FLATE = Name("FlateDecode")
_N_OBJSTM = Name("ObjStm")
_N_N = Name("N")
_N_FIRST = Name("First")


def build_object_graph(
    doc_id: str,
    spans: Sequence[tuple],
    content_filters: Sequence[str] = ("flate",),
    info_fields: Optional[dict] = None,
    catalog_extra: Optional[dict] = None,
    xml_metadata: Optional[bytes] = None,
    cjk: bool = False,
    cjk_embedded: bool = False,
    cjk_chained: bool = False,
    forms: bool = False,
    attachments: bool = False,
    navigation: bool = False,
    type3: bool = False,
    acroform: bool = False,
    cid_collection: Optional[str] = None,
    tagged: bool = False,
    nospace: bool = False,
) -> tuple[_Graph, int, int]:
    """spans → COS object graph. Returns (graph, catalog_num, info_num)."""
    g = _Graph()
    catalog_num = g.reserve()       # 1
    pages_root_num = g.reserve()    # 2
    info_num = g.reserve()          # 3
    f1_num = g.reserve()            # 4
    fdesc_num = g.reserve()         # 5 — fixed so /F1 + its descriptor
    # are fully constant objects, shared across documents (read-only:
    # the serializer never mutates, and _crypt_transform deep-copies)

    embedded_code_of: Optional[dict[str, bytes]] = None
    embedded_cmap_bytes: Optional[bytes] = None
    embedded_base_bytes: Optional[bytes] = None
    if cjk_embedded:
        # custom per-document CMap covering every non-ASCII char
        uniq = sorted(
            {ch for (k, t, _m, _o) in spans if k == "text" for ch in (t or "")
             if ord(ch) >= 0x80}
        )
        if cjk_chained:
            # split across an embedded→embedded /UseCMap chain (r4)
            embedded_base_bytes, embedded_cmap_bytes, embedded_code_of = (
                _build_chained_embedded_cmap(uniq)
            )
        else:
            embedded_cmap_bytes, embedded_code_of = _build_embedded_cmap(uniq)

    def _showable_without_cid(t: str) -> bool:
        if cjk_embedded:
            return True  # every char has an assigned code
        if cjk:
            # cjk mode routes everything GBK-encodable through /F3
            try:
                t.encode("gbk")
                return True
            except UnicodeEncodeError:
                return False
        return _winansi_encode(t) is not None

    needs_cid = any(
        k == "text" and not _showable_without_cid(t or "")
        for (k, t, _m, _o) in spans
    )
    f2_num = f2_cmap_num = None
    if needs_cid:
        f2_cmap_num = g.reserve()
        f2_num = g.reserve()

    # image XObjects: one per distinct media_ref, /Name carries the ref
    # (pass-through DCT bytes — Filter_DoNothing semantics, F7).
    # CDict(template) is a C-level copy; overwriting the placeholder
    # keys keeps their insertion position, so the emitted key order is
    # identical to building entry-by-entry.
    image_objs: dict[str, int] = {}
    image_names: dict[str, str] = {}
    for idx, (kind, _t, mref, _o) in enumerate(spans):
        if kind == "media" and mref not in image_objs:
            stub = _media_stub_bytes(mref)
            d = CDict(_IMG_DICT_TEMPLATE)
            d[_N_NAME] = Name(mref)
            d[_N_LENGTH] = len(stub)
            image_objs[mref] = g.add(CStream(d, stub))
            image_names[mref] = f"Im{len(image_names)}"

    # fonts: /F1 + descriptor are the module-level constants (their
    # object numbers are fixed by the reserve order above)
    g.objs[f1_num] = _F1_CONST
    g.objs[fdesc_num] = _FDESC_CONST
    if needs_cid:
        cmap = _encode_content(_TOUNICODE_IDENTITY, ["flate"])
        g.objs[f2_cmap_num] = cmap
        desc = CDict()
        desc[Name("Type")] = Name("Font")
        desc[Name("Subtype")] = Name("CIDFontType2")
        desc[Name("BaseFont")] = Name("Identity")
        desc_num = g.add(desc)
        f2 = CDict()
        f2[Name("Type")] = Name("Font")
        f2[Name("Subtype")] = Name("Type0")
        f2[Name("BaseFont")] = Name("Identity")
        f2[Name("Encoding")] = Name("Identity-H")
        f2[Name("DescendantFonts")] = [Ref(desc_num, 0)]
        f2[Name("ToUnicode")] = Ref(f2_cmap_num, 0)
        g.objs[f2_num] = f2
    f3_num = None
    if cjk_embedded:
        # Type0 + EMBEDDED /Encoding CMap stream (no ToUnicode): the
        # extractor must parse the CMap itself — code spaces, cidrange
        # (1-byte ASCII), cidchar/bfchar/bfrange (2-byte customs);
        # chained docs split this across /UseCMap (Table 120)
        cm = _encode_content(embedded_cmap_bytes, ["flate"])
        cm.dict[Name("Type")] = Name("CMap")
        if embedded_base_bytes is not None:
            bcm = _encode_content(embedded_base_bytes, ["flate"])
            bcm.dict[Name("Type")] = Name("CMap")
            bcm.dict[Name("CMapName")] = Name("pdfspark-Base-H")
            base_num = g.add(bcm)
            cm.dict[Name("CMapName")] = Name("pdfspark-Chained-H")
            cm.dict[Name("UseCMap")] = Ref(base_num, 0)
        else:
            cm.dict[Name("CMapName")] = Name("pdfspark-Custom-H")
        cmap_num = g.add(cm)
        desc3 = CDict()
        desc3[Name("Type")] = Name("Font")
        desc3[Name("Subtype")] = Name("CIDFontType0")
        desc3[Name("BaseFont")] = Name("Custom")
        # per-CID /W: the 1-byte space (CID == code ≤ 0x7F) at the same
        # 500/1000-em the simple font uses — so the geometry oracle's
        # closed-form widths hold for this font too; every other CID
        # falls to /DW 1000 (multi-byte width pins in tests/test_cjk.py)
        desc3[Name("DW")] = 1000
        desc3[Name("W")] = [0, 127, 500]
        desc3_num = g.add(desc3)
        f3 = CDict()
        f3[Name("Type")] = Name("Font")
        f3[Name("Subtype")] = Name("Type0")
        f3[Name("BaseFont")] = Name("Custom")
        f3[Name("Encoding")] = Ref(cmap_num, 0)
        f3[Name("DescendantFonts")] = [Ref(desc3_num, 0)]
        f3_num = g.add(f3)
    elif cid_collection is not None:
        # Type0 + embedded CMap whose codes are CIDs of a registered
        # Adobe character collection (constant stream; /CIDSystemInfo
        # /Ordering, no bf sections, no ToUnicode) — extraction must
        # consult kernel/cidcollections.py (Roman opening + the
        # cid2code-loaded demo supplement when the variant carries CJK)
        ordering, supp, _cp0, cid_base, _excl = _COLL_VARIANTS[cid_collection]
        cmj = _encode_content(_collection_cmap(ordering, supp, cid_base), ["flate"])
        cmj.dict[Name("Type")] = Name("CMap")
        cmj.dict[Name("CMapName")] = Name(f"pdfspark-{ordering}-H")
        cmap_num = g.add(cmj)
        desc3 = CDict()
        desc3[Name("Type")] = Name("Font")
        desc3[Name("Subtype")] = Name("CIDFontType0")
        desc3[Name("BaseFont")] = Name(f"{ordering}Sample")
        csi = CDict()
        csi[Name("Registry")] = CString(b"Adobe")
        csi[Name("Ordering")] = CString(ordering.encode("ascii"))
        csi[Name("Supplement")] = supp
        desc3[Name("CIDSystemInfo")] = csi
        desc3_num = g.add(desc3)
        f3 = CDict()
        f3[Name("Type")] = Name("Font")
        f3[Name("Subtype")] = Name("Type0")
        f3[Name("BaseFont")] = Name(f"{ordering}Sample")
        f3[Name("Encoding")] = Ref(cmap_num, 0)
        f3[Name("DescendantFonts")] = [Ref(desc3_num, 0)]
        f3_num = g.add(f3)
    elif cjk:
        # Type0 + predefined GBK-EUC-H CMap, deliberately NO ToUnicode:
        # the extractor must decode the code bytes via the CMap's own
        # encoding (kernel/textops._PREDEFINED_CMAP_CODECS)
        desc3 = CDict()
        desc3[Name("Type")] = Name("Font")
        desc3[Name("Subtype")] = Name("CIDFontType0")
        desc3[Name("BaseFont")] = Name("STSong-Light")
        desc3_num = g.add(desc3)
        f3 = CDict()
        f3[Name("Type")] = Name("Font")
        f3[Name("Subtype")] = Name("Type0")
        f3[Name("BaseFont")] = Name("STSong-Light")
        f3[Name("Encoding")] = Name("GBK-EUC-H")
        f3[Name("DescendantFonts")] = [Ref(desc3_num, 0)]
        f3_num = g.add(f3)

    font_res = CDict()
    font_res[_N_F1] = _REF_F1
    if needs_cid:
        font_res[Name("F2")] = Ref(f2_num, 0)
    if f3_num is not None:
        font_res[Name("F3")] = Ref(f3_num, 0)
    if type3:
        # /F4: Type3 glyph-procedure font (ISO 32000-1 §9.6.5) — the
        # /Differences → AGL table is the decode path; /CharProcs
        # carries a trivial d0 proc per glyph for spec shape. Width
        # metrics are FontMatrix-scaled and deliberately out of the
        # extraction contract (span w stays null for Type3 spans).
        rev = _agl_reverse()
        t3_chars = sorted(
            {
                ch
                for (k, t, _m, _o) in spans
                if k == "text" and t and _type3_encodable(t)
                for ch in t
            }
        )
        diffs: list = []
        charprocs = CDict()
        for ch in t3_chars:
            gname = rev[ch]
            diffs.append(ord(ch))
            diffs.append(Name(gname))
            proc = CDict()
            body3 = b"0 0 d0"
            proc[Name("Length")] = len(body3)
            charprocs[Name(gname)] = Ref(g.add(CStream(proc, body3)), 0)
        enc4 = CDict()
        enc4[Name("Differences")] = diffs
        f4 = CDict()
        f4[Name("Type")] = Name("Font")
        f4[Name("Subtype")] = Name("Type3")
        f4[Name("FontBBox")] = [0, 0, 64, 64]
        # FontMatrix 1/64: an exact binary fraction WITH ≤6 decimals
        # (the serializer emits %.6f), so glyph widths of 32 give
        # 32·(1/64)·1000 = 500/1000-em — identical advance arithmetic
        # to /F1, keeping the closed-form geometry oracle hash-exact
        f4[Name("FontMatrix")] = [0.015625, 0, 0, 0.015625, 0, 0]
        f4[Name("Encoding")] = enc4
        f4[Name("CharProcs")] = Ref(g.add(charprocs), 0)
        f4[Name("FirstChar")] = 32
        f4[Name("LastChar")] = 126
        f4[Name("Widths")] = [32] * (126 - 32 + 1)
        font_res[Name("F4")] = Ref(g.add(f4), 0)
    xobj_res = CDict()
    for mref, onum in image_objs.items():
        xobj_res[Name(image_names[mref])] = Ref(onum, 0)
    resources = CDict()
    resources[_N_FONT] = font_res
    if image_objs:
        resources[_N_XOBJECT] = xobj_res
    res_num = g.add(resources)

    # Form-XObject sink (variant `forms`): every even text span's
    # BT..ET block becomes its own /Subtype /Form stream, placed by
    # `/FmK Do` — exercises the interpreter's recursion path. Matrix
    # and /Resources rotate: identity matrix / translated matrix /
    # omitted, and own-resources (inline dict sharing the font map) vs
    # inherit-from-page — all four interpreter branches.
    form_counter = [0]

    def form_sink(block: bytes) -> bytes:
        k = form_counter[0]
        form_counter[0] += 1
        d = CDict()
        d[Name("Type")] = Name("XObject")
        d[Name("Subtype")] = Name("Form")
        d[Name("BBox")] = [0, 0, 612, 792]
        if k % 3 == 1:
            d[Name("Matrix")] = [1, 0, 0, 1, 0, 0]
        elif k % 3 == 2:
            # translation shifts device coords, never text content —
            # the roundtrip (kind, text, order) contract is unaffected
            d[Name("Matrix")] = [1, 0, 0, 1, 7, -3]
        if k % 2 == 1:
            own = CDict()
            own[Name("Font")] = font_res  # inline copy of the font map
            d[Name("Resources")] = own
        comp = flate_encode(block)
        d[Name("Filter")] = Name("FlateDecode")
        d[Name("Length")] = len(comp)
        fnum = g.add(CStream(d, comp))
        rname = f"Fm{k}"
        xobj_res[Name(rname)] = Ref(fnum, 0)
        if Name("XObject") not in resources:
            resources[Name("XObject")] = xobj_res
        return rname.encode("ascii")

    coll_show: Optional[Callable[[str], Optional[bytes]]] = None
    if cid_collection is not None:
        _o, _s, _cp0, _cb, _excl = _COLL_VARIANTS[cid_collection]
        coll_show = _make_collection_show(_cp0, _excl)

    # paginate spans → pages + content streams
    page_nums: list[int] = []
    for p0 in range(0, max(len(spans), 1), SPANS_PER_PAGE):
        page_spans = spans[p0 : p0 + SPANS_PER_PAGE]
        if tagged:
            # Tagged PDF (r8, ISO 32000-1 §14.6-14.7): each span's
            # block becomes its own marked-content section
            # `/P <</MCID j>> BDC … EMC` (j = the WITHIN-PAGE LOGICAL
            # index — positions/forms stay tied to it), and the page
            # paints the sections in a SCRAMBLED order (evens then
            # odds — the two-column painting order of a real layout).
            # Only the structure tree built below recovers the
            # logical sequence; raw content order is wrong by
            # construction.
            parts, _ = _content_for_py(
                page_spans, image_names, return_parts=True
            )
            secs = []
            for j, part in enumerate(parts):
                tag = b"/Figure" if page_spans[j][0] == "media" else b"/P"
                secs.append(
                    b"%s <</MCID %d>> BDC\n%s\nEMC" % (tag, j, part)
                )
            paint = list(range(0, len(secs), 2)) + list(range(1, len(secs), 2))
            body = b"\n".join(secs[j] for j in paint)
        else:
            body, _ = _content_for(
                page_spans, image_names, cjk=cjk, embedded_code_of=embedded_code_of,
                form_sink=form_sink if forms else None, type3=type3,
                coll_show=coll_show, nospace=nospace,
            )
        cnum = g.add(_encode_content(body, content_filters))
        g.content_nums.append(cnum)
        # MediaBox/Resources are INHERITED from the pages root (ISO
        # 32000-1 §7.7.3.4) — exercises the M5 inheritance walk the
        # reference skips (PDFPage.java:84-86); /Parent is filled in
        # after the tree is built (the template pins its key position)
        page = CDict(_PAGE_TEMPLATE)
        page[_N_CONTENTS] = Ref(cnum, 0)
        if navigation:
            # one /Link annotation with a /URI action per page
            # (ISO 32000-1 §12.5.6.5 + §12.6.4.7) — the link-graph
            # projection; URI is closed-form in (doc_id, page index)
            page_idx = p0 // SPANS_PER_PAGE
            act = CDict()
            act[Name("S")] = Name("URI")
            act[Name("URI")] = CString.from_text(
                f"https://example.org/{doc_id}/{page_idx}"
            )
            link = CDict()
            link[Name("Type")] = Name("Annot")
            link[Name("Subtype")] = Name("Link")
            link[Name("Rect")] = [0, 0, 100, 20]
            link[Name("A")] = act
            page[Name("Annots")] = [Ref(g.add(link), 0)]
        page_nums.append(g.add(page))

    # page tree: nest intermediate /Pages nodes when fanout exceeded
    # (exercises the ≥3-level DFS of the multipage_tree family, M4)
    def build_tree(nums: list[int], parent: int) -> tuple[list[Ref], int]:
        if len(nums) <= PAGE_TREE_FANOUT:
            return [Ref(n, 0) for n in nums], len(nums)
        kid_refs = []
        total = 0
        for i in range(0, len(nums), PAGE_TREE_FANOUT):
            group = nums[i : i + PAGE_TREE_FANOUT]
            node_num = g.reserve()
            refs, cnt = build_tree(group, node_num)
            node = CDict()
            node[_N_TYPE] = _N_PAGES
            node[_N_PARENT] = Ref(parent, 0)
            node[_N_KIDS] = refs
            node[_N_COUNT] = cnt
            g.objs[node_num] = node
            kid_refs.append(Ref(node_num, 0))
            total += cnt
        return kid_refs, total

    kid_refs, count = build_tree(page_nums, pages_root_num)
    pages_root = CDict()
    pages_root[_N_TYPE] = _N_PAGES
    pages_root[_N_KIDS] = kid_refs
    pages_root[_N_COUNT] = count
    pages_root[_N_MEDIABOX] = [0, 0, 612, 792]
    pages_root[_N_RESOURCES] = Ref(res_num, 0)
    g.objs[pages_root_num] = pages_root
    root_ref = _REF_PAGES_ROOT
    for pn in page_nums:
        g.objs[pn][_N_PARENT] = root_ref

    catalog = CDict(_CATALOG_TEMPLATE)
    if tagged:
        # structure tree (ISO 32000-1 §14.7): /StructTreeRoot →
        # /Document → per-page /Sect → one /P (or /Figure) element
        # per span IN LOGICAL ORDER. Leaves rotate between the two
        # §14.7.4.2 marked-content reference forms: an integer MCID
        # under an element carrying /Pg (even j) and an explicit
        # /MCR dict (odd j). No /ParentTree: that inverse mapping
        # serves renderers resolving content→structure; extraction
        # walks structure→content only (documented gap).
        sect_refs = []
        for pidx, pnum in enumerate(page_nums):
            pg_spans = spans[pidx * SPANS_PER_PAGE : (pidx + 1) * SPANS_PER_PAGE]
            kid_refs2 = []
            for j, (k, _t, _m, _o) in enumerate(pg_spans):
                el = CDict()
                el[_N_TYPE] = Name("StructElem")
                el[Name("S")] = Name("Figure") if k == "media" else Name("P")
                if j % 2 == 0:
                    el[Name("Pg")] = Ref(pnum, 0)
                    el[Name("K")] = j
                else:
                    mcr = CDict()
                    mcr[_N_TYPE] = Name("MCR")
                    mcr[Name("Pg")] = Ref(pnum, 0)
                    mcr[Name("MCID")] = j
                    el[Name("K")] = mcr
                kid_refs2.append(Ref(g.add(el), 0))
            sect = CDict()
            sect[_N_TYPE] = Name("StructElem")
            sect[Name("S")] = Name("Sect")
            sect[Name("Pg")] = Ref(pnum, 0)
            sect[Name("K")] = kid_refs2
            sect_refs.append(Ref(g.add(sect), 0))
        docel = CDict()
        docel[_N_TYPE] = Name("StructElem")
        docel[Name("S")] = Name("Document")
        docel[Name("K")] = sect_refs
        stroot = CDict()
        stroot[_N_TYPE] = Name("StructTreeRoot")
        stroot[Name("K")] = Ref(g.add(docel), 0)
        catalog[Name("StructTreeRoot")] = Ref(g.add(stroot), 0)
        mark_info = CDict()
        mark_info[Name("Marked")] = True
        catalog[Name("MarkInfo")] = mark_info
    if navigation:
        # /Outlines tree (ISO 32000-1 §12.3.3): 1-3 top-level items,
        # every EVEN item carries two children — deterministic in
        # doc_id so the DFS order is closed-form SQL
        n_top = 1 + int(hashlib.md5(doc_id.encode()).hexdigest()[8:10], 16) % 3
        outlines_num = g.reserve()
        top_nums = [g.reserve() for _ in range(n_top)]
        total = 0
        for i, onum in enumerate(top_nums):
            item = CDict()
            item[Name("Title")] = CString.from_text(f"sec{i}")
            item[Name("Parent")] = Ref(outlines_num, 0)
            if i > 0:
                item[Name("Prev")] = Ref(top_nums[i - 1], 0)
            if i + 1 < n_top:
                item[Name("Next")] = Ref(top_nums[i + 1], 0)
            total += 1
            if i % 2 == 0:
                kid_nums = [g.reserve() for _ in range(2)]
                for j, knum in enumerate(kid_nums):
                    kid = CDict()
                    kid[Name("Title")] = CString.from_text(f"sec{i}.{j}")
                    kid[Name("Parent")] = Ref(onum, 0)
                    if j > 0:
                        kid[Name("Prev")] = Ref(kid_nums[j - 1], 0)
                    if j + 1 < 2:
                        kid[Name("Next")] = Ref(kid_nums[j + 1], 0)
                    g.objs[knum] = kid
                item[Name("First")] = Ref(kid_nums[0], 0)
                item[Name("Last")] = Ref(kid_nums[-1], 0)
                item[Name("Count")] = 2
                total += 2
            g.objs[onum] = item
        outl = CDict()
        outl[Name("Type")] = Name("Outlines")
        outl[Name("First")] = Ref(top_nums[0], 0)
        outl[Name("Last")] = Ref(top_nums[-1], 0)
        outl[Name("Count")] = total
        g.objs[outlines_num] = outl
        catalog[Name("Outlines")] = Ref(outlines_num, 0)
    if attachments:
        # /Names → /EmbeddedFiles name tree (ISO 32000-1 §7.9.6 +
        # §7.11.4): 1-3 deterministic attachments per doc; content is
        # the md5 hex of (doc_id:att:k) so the oracle recomputes size
        # and digest in SQL; filter rotates raw/flate per k; the tree
        # uses a /Kids split (with /Limits) when n ≥ 2 and a direct
        # leaf /Names when n == 1 — both §7.9.6 shapes exercised
        n_att = 1 + int(hashlib.md5(doc_id.encode()).hexdigest()[6:8], 16) % 3
        pairs = []  # (name CString, filespec ref)
        for k in range(n_att):
            att_name = f"att{k}.txt"
            content = hashlib.md5(
                f"{doc_id}:att:{k}".encode()
            ).hexdigest().encode("ascii")
            if k % 2 == 0:
                ef = _encode_content(content, ["flate"])
            else:
                d = CDict()
                d[Name("Length")] = len(content)
                ef = CStream(d, content)
            ef.dict[Name("Type")] = Name("EmbeddedFile")
            params = CDict()
            params[Name("Size")] = len(content)
            ef.dict[Name("Params")] = params
            ef_num = g.add(ef)
            fs = CDict()
            fs[Name("Type")] = Name("Filespec")
            fs[Name("F")] = CString.from_text(att_name)
            fs[Name("UF")] = CString.from_text(att_name)
            efd = CDict()
            efd[Name("F")] = Ref(ef_num, 0)
            fs[Name("EF")] = efd
            pairs.append((CString.from_text(att_name), Ref(g.add(fs), 0)))

        def _leaf(sub):
            leaf = CDict()
            leaf[Name("Limits")] = [sub[0][0], sub[-1][0]]
            leaf[Name("Names")] = [x for p in sub for x in p]
            return Ref(g.add(leaf), 0)

        root = CDict()
        if n_att >= 2:
            mid = (n_att + 1) // 2
            root[Name("Kids")] = [_leaf(pairs[:mid]), _leaf(pairs[mid:])]
        else:
            root[Name("Names")] = [x for p in pairs for x in p]
        names_dict = CDict()
        names_dict[Name("EmbeddedFiles")] = Ref(g.add(root), 0)
        catalog[Name("Names")] = names_dict
    if acroform:
        # /AcroForm interactive-form dictionary (ISO 32000-1 §12.7):
        # 1-5 deterministic terminal fields; when ≥2 the first two
        # nest under a non-terminal parent ("grp") that CARRIES the
        # inheritable /FT — kids omit it, so extraction must walk the
        # §12.7.3.1 inheritance chain and build dotted full names.
        # Field types rotate Tx/Btn/Ch; every value is closed-form in
        # (doc_id, k) so the oracle recomputes the whole table in SQL.
        n_fld = 1 + int(hashlib.md5(doc_id.encode()).hexdigest()[12:14], 16) % 5
        nested = n_fld >= 2

        def _leaf_field(k: int, inherit_ft: bool) -> CDict:
            fld = CDict()
            fld[Name("T")] = CString.from_text(f"f{k}")
            if nested and k < 2:
                ftype = "Tx"  # inherited from the parent
            else:
                ftype = ("Tx", "Btn", "Ch")[k % 3]
            if not inherit_ft:
                fld[Name("FT")] = Name(ftype)
            h8 = hashlib.md5(f"{doc_id}:fld:{k}".encode()).hexdigest()
            if ftype == "Tx":
                fld[Name("V")] = CString.from_text(f"v{k}-{h8[:8]}")
            elif ftype == "Btn":
                fld[Name("V")] = Name("Yes" if k % 2 == 0 else "Off")
            else:  # Ch
                fld[Name("V")] = CString.from_text(f"c{h8[:4]}")
                fld[Name("Opt")] = [CString.from_text(f"c{h8[:4]}")]
            # merged widget keys (§12.5.6.19) for spec shape
            fld[Name("Subtype")] = Name("Widget")
            fld[Name("Rect")] = [10, 10 + 20 * k, 200, 26 + 20 * k]
            return fld

        field_refs: list = []
        if nested:
            parent = CDict()
            parent[Name("T")] = CString.from_text("grp")
            parent[Name("FT")] = Name("Tx")  # inherited by both kids
            parent_num = g.reserve()
            kid_refs = []
            for k in (0, 1):
                kid = _leaf_field(k, inherit_ft=True)
                kid[Name("Parent")] = Ref(parent_num, 0)
                kid_refs.append(Ref(g.add(kid), 0))
            parent[Name("Kids")] = kid_refs
            g.objs[parent_num] = parent
            field_refs.append(Ref(parent_num, 0))
            rest = range(2, n_fld)
        else:
            rest = range(0, n_fld)
        for k in rest:
            field_refs.append(Ref(g.add(_leaf_field(k, False)), 0))
        af = CDict()
        af[Name("Fields")] = field_refs
        af[Name("NeedAppearances")] = True
        catalog[Name("AcroForm")] = af
    if xml_metadata is not None:
        # M8: /Metadata XMP stream (PDFDocCatalog.getXMLMetadata :137-145)
        md = CDict()
        md[Name("Type")] = Name("Metadata")
        md[Name("Subtype")] = Name("XML")
        md[Name("Length")] = len(xml_metadata)
        catalog[Name("Metadata")] = Ref(g.add(CStream(md, xml_metadata)), 0)
    for k, v in (catalog_extra or {}).items():
        catalog[Name(k)] = v
    g.objs[catalog_num] = catalog

    info = CDict()
    if info_fields is None:
        # hot path: the default info projection with hoisted keys and
        # constant CStrings shared across documents
        info[_N_I_TITLE] = CString.from_text(f"doc {doc_id}")
        info[_N_I_AUTHOR] = _CS_AUTHOR
        info[_N_I_SUBJECT] = _CS_SUBJECT
        info[_N_I_KEYWORDS] = CString.from_text(f"spans={len(spans)}")
        info[_N_I_CREATOR] = _CS_CREATOR
        info[_N_I_PRODUCER] = _CS_PRODUCER
        info[_N_I_CREATIONDATE] = CString.from_text(_det_date(doc_id))
    else:
        base_info = {
            "Title": f"doc {doc_id}",
            "Author": "pdfspark-gen",
            "Subject": "synthetic",
            "Keywords": f"spans={len(spans)}",
            "Creator": "pdfspark",
            "Producer": "pdfspark codec",
            "CreationDate": _det_date(doc_id),
        }
        base_info.update(info_fields)
        for k, v in base_info.items():
            if v is None:
                continue
            info[Name(k)] = (
                v if isinstance(v, (Name, int, float))
                else CString.from_text(str(v))
            )
    info[_N_I_TRAPPED] = _N_FALSE
    g.objs[info_num] = info
    return g, catalog_num, info_num


def _det_date(doc_id: str) -> str:
    """Deterministic CreationDate exercising the C5 parser — derived
    from the doc_id hash, never from the wall clock."""
    h = int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16)
    day = 1 + h % 28
    hour = (h >> 8) % 24
    minute = (h >> 16) % 60
    return f"D:202401{day:02d}{hour:02d}{minute:02d}33+02'00'"


# ---------------------------------------------------------------------------
# Assemblers
# ---------------------------------------------------------------------------


_FILE_ID_MEMO: tuple = ("", None)


def _file_id(doc_id: str) -> list:
    # one-slot memo: generation is doc-at-a-time and every layout asks
    # for the ID 1-3 times (classic trailer, xref stream, update
    # trailer) — the CStrings are immutable, sharing is safe
    global _FILE_ID_MEMO
    if _FILE_ID_MEMO[0] == doc_id:
        return _FILE_ID_MEMO[1]
    h = hashlib.md5(doc_id.encode()).digest()[:8]
    fid = [CString(h, force_hex=True), CString(h, force_hex=True)]
    _FILE_ID_MEMO = (doc_id, fid)
    return fid


def _crypt_transform(v, num: int, gen: int, handler):
    """Generator-side mirror of Parser._decrypt_value: deep-copy an
    object graph value with strings and stream bytes ciphered under
    the containing object's (num, gen). /Length is rewritten to the
    on-disk (encrypted) byte count — AES grows by IV + PKCS#5 pad."""
    if isinstance(v, CString):
        return CString(handler.encrypt(v.raw, num, gen, True), force_hex=True)
    if isinstance(v, CStream):
        d = _crypt_transform(v.dict, num, gen, handler)
        data = handler.encrypt(v.data, num, gen, False)
        d[Name("Length")] = len(data)
        return CStream(d, data)
    if isinstance(v, CDict):
        out = CDict()
        for k in v:
            out[k] = _crypt_transform(v[k], num, gen, handler)
        return out
    if isinstance(v, list):
        return [_crypt_transform(x, num, gen, handler) for x in v]
    return v


def _build_encryption(g: _Graph, doc_id: str, encryption: Optional[str]):
    """Build the security handler + /Encrypt dict and register the
    dict as its own top-level object (g.encrypt_num). Shared by every
    layout; returns None for unencrypted docs. The /Encrypt dict is
    never packed into an object stream — resolving it must not itself
    require decryption (ISO 32000-1 §7.5.8.2)."""
    handler = None
    if encryption == "pubsec":
        # certificate-based handler (ISO 32000-1 §7.6.5): the 20-byte
        # file-key seed (deterministic in doc_id) is CMS-enveloped for
        # the fixture recipient certificate; extraction opens it with
        # the matching private key.  The envelope itself is the one
        # non-deterministic byte range in any generated payload (CMS
        # randomness) — the correctness contract is decrypted-spans
        # identity, which is unaffected.
        from .kernel.crypt import build_pubsec_handler

        seed = hashlib.md5(doc_id.encode()).digest() + hashlib.md5(
            b"seed2:" + doc_id.encode()
        ).digest()[:4]
        handler = build_pubsec_handler(seed)
        enc = CDict()
        enc[Name("Filter")] = Name("Adobe.PubSec")
        enc[Name("SubFilter")] = Name("adbe.pkcs7.s5")
        enc[Name("V")] = 4
        enc[Name("Length")] = 128
        dcf = CDict()
        dcf[Name("Type")] = Name("CryptFilter")
        dcf[Name("CFM")] = Name("AESV2")
        dcf[Name("Length")] = 16
        dcf[Name("Recipients")] = [
            CString(b, force_hex=True) for b in handler.recipients
        ]
        cf = CDict()
        cf[Name("DefaultCryptFilter")] = dcf
        enc[Name("CF")] = cf
        enc[Name("StmF")] = Name("DefaultCryptFilter")
        enc[Name("StrF")] = Name("DefaultCryptFilter")
        g.encrypt_num = g.add(enc)
    elif encryption in ("aes256", "aes256r5"):
        # AES-256 (V5, ISO 32000-2): file-key cipher, /Perms block;
        # "aes256r5" emits the withdrawn interim R5 layout (single
        # SHA-256 hash) real corpora still contain
        from .kernel.crypt import build_handler_v5, compute_perms

        rev = 5 if encryption == "aes256r5" else 6
        handler = build_handler_v5(
            owner_pwd=b"owner-" + doc_id.encode(),
            user_pwd=b"",
            p=-44,
            seed=doc_id.encode(),
            revision=rev,
        )
        enc = CDict()
        enc[Name("Filter")] = Name("Standard")
        enc[Name("V")] = 5
        enc[Name("R")] = rev
        enc[Name("Length")] = 256
        std = CDict()
        std[Name("Type")] = Name("CryptFilter")
        std[Name("CFM")] = Name("AESV3")
        std[Name("Length")] = 32
        cf = CDict()
        cf[Name("StdCF")] = std
        enc[Name("CF")] = cf
        enc[Name("StmF")] = Name("StdCF")
        enc[Name("StrF")] = Name("StdCF")
        enc[Name("O")] = CString(handler.o, force_hex=True)
        enc[Name("U")] = CString(handler.u, force_hex=True)
        enc[Name("OE")] = CString(handler.oe, force_hex=True)
        enc[Name("UE")] = CString(handler.ue, force_hex=True)
        enc[Name("P")] = -44
        enc[Name("Perms")] = CString(
            compute_perms(-44, True, handler.key, doc_id.encode()), force_hex=True
        )
        g.encrypt_num = g.add(enc)
    elif encryption:
        # standard security handler (crypt.py): "rc4" = V2/R3 128-bit,
        # "aes" = V4/R4 AESV2, both empty user password (extractable);
        # "pwd" = RC4 with a real user password (M10 error-bucket path)
        from .kernel.crypt import build_handler

        aes = encryption == "aes"
        handler = build_handler(
            r=4 if aes else 3,
            owner_pwd=b"owner-" + doc_id.encode(),
            user_pwd=b"user-secret" if encryption == "pwd" else b"",
            p=-44,
            file_id0=hashlib.md5(doc_id.encode()).digest()[:8],
            length_bits=128,
            aes=aes,
        )
        enc = CDict()
        enc[Name("Filter")] = Name("Standard")
        if aes:
            enc[Name("V")] = 4
            enc[Name("R")] = 4
            std = CDict()
            std[Name("Type")] = Name("CryptFilter")
            std[Name("CFM")] = Name("AESV2")
            std[Name("Length")] = 16
            cf = CDict()
            cf[Name("StdCF")] = std
            enc[Name("CF")] = cf
            enc[Name("StmF")] = Name("StdCF")
            enc[Name("StrF")] = Name("StdCF")
        else:
            enc[Name("V")] = 2
            enc[Name("R")] = 3
        enc[Name("Length")] = 128
        enc[Name("O")] = CString(handler.o, force_hex=True)
        enc[Name("U")] = CString(handler.u, force_hex=True)
        enc[Name("P")] = -44
        g.encrypt_num = g.add(enc)
    return handler


def _assemble_classic(
    g: _Graph,
    catalog_num: int,
    info_num: int,
    doc_id: str,
    eol: bytes = b"\n",
    hybrid: bool = False,
    version: bytes = b"1.4",
    encryption: Optional[str] = None,
) -> bytes:
    handler = _build_encryption(g, doc_id, encryption)
    out = bytearray()
    out += b"%PDF-" + version + eol + b"%\xe2\xe3\xcf\xd3" + eol
    nums = sorted(g.objs)
    items = []
    for n in nums:
        body = g.objs[n]
        if handler is not None and n != g.encrypt_num:
            body = _crypt_transform(body, n, 0, handler)
        items.append((n, body))
    blob, offs = serialize_objs(items, eol, len(out))
    out += blob
    offsets: dict[int, int] = dict(zip(nums, offs))

    hybrid_stm_offset = None
    hybrid_omit: set[int] = set()
    if hybrid:
        # omit the last object from the classic table; only the
        # /XRefStm supplies it (forces the hybrid path, X3)
        hybrid_omit = {nums[-1]}
        hybrid_stm_offset = len(out)
        out += _xref_stream_bytes(
            g, offsets, catalog_num, info_num, doc_id, obj_num=g.reserve()
        )

    xref_off = len(out)
    size = max(nums) + 1
    # xref rows are exactly 20 bytes: 2-byte EOL directly after the
    # flag for CRLF writers, ' ' + 1-byte EOL otherwise (ISO §7.5.4)
    row_eol = b"\r\n" if eol == b"\r\n" else b" \n"
    out += b"xref" + eol
    out += b"0 1" + eol + b"0000000000 65535 f" + row_eol
    if _CTOK_EMIT_XREF is not None:
        out += _CTOK_EMIT_XREF(
            [(n, offsets[n], 0) for n in nums if n not in hybrid_omit],
            eol, row_eol,
        )
    else:
        for n in nums:
            if n in hybrid_omit:
                continue
            out += f"{n} 1".encode() + eol
            out += f"{offsets[n]:010d} 00000 n".encode() + row_eol
    trailer = CDict()
    trailer[_N_SIZE] = size
    trailer[_N_ROOT] = Ref(catalog_num, 0)
    trailer[_N_INFO] = Ref(info_num, 0)
    trailer[_N_ID] = _file_id(doc_id)
    if handler is not None:
        trailer[Name("Encrypt")] = Ref(g.encrypt_num, 0)
    if hybrid and hybrid_stm_offset is not None:
        trailer[Name("XRefStm")] = hybrid_stm_offset
    out += b"trailer" + eol + produce(trailer) + eol
    out += b"startxref" + eol + str(xref_off).encode() + eol + b"%%EOF" + eol
    return bytes(out)


def _xref_stream_bytes(
    g: _Graph,
    offsets: dict[int, int],
    catalog_num: int,
    info_num: int,
    doc_id: str,
    obj_num: int,
    compressed: Optional[dict[int, tuple[int, int]]] = None,
    self_offset: Optional[int] = None,
    size: Optional[int] = None,
    encrypt_num: Optional[int] = None,
) -> bytes:
    """Emit one xref-stream object covering `offsets` (type 1) and
    `compressed` (type 2) entries. /W [1 4 2], Flate + Predictor 12
    (the loremipsum2.pdf shape, ComplexTest.java:112-141)."""
    w1, w2, w3 = 1, 4, 2
    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
    for n, off in offsets.items():
        entries[n] = (1, off, 0)
    for n, (cont, idx) in (compressed or {}).items():
        entries[n] = (2, cont, idx)
    entries[obj_num] = (1, self_offset if self_offset is not None else 0, 0)
    max_num = max(max(entries), (size or 0) - 1)
    nums = sorted(entries)
    if _CTOK_EMIT_XREF_ROWS is not None:
        rows, index = _CTOK_EMIT_XREF_ROWS(
            [(n,) + entries[n] for n in nums]
        )
    else:
        rows = bytearray()
        index = []
        run_start = None
        prev = None
        for n in nums:
            if run_start is None:
                run_start, prev = n, n
            elif n == prev + 1:
                prev = n
            else:
                index += [run_start, prev - run_start + 1]
                run_start, prev = n, n
        index += [run_start, prev - run_start + 1]
        for n in nums:
            t, a, b = entries[n]
            rows += (
                t.to_bytes(w1, "big") + a.to_bytes(w2, "big")
                + b.to_bytes(w3, "big")
            )
    row_len = w1 + w2 + w3
    pred = predictor_encode_up(bytes(rows), row_len)
    body = flate_encode(pred)
    d = CDict()
    d[_N_TYPE] = _N_XREF
    d[_N_SIZE] = max_num + 1
    d[_N_W] = [w1, w2, w3]
    d[_N_INDEX] = index
    d[_N_FILTER] = _N_FLATE
    parms = CDict()
    parms[Name("Predictor")] = 12
    parms[Name("Columns")] = row_len
    d[Name("DecodeParms")] = parms
    d[_N_ROOT] = Ref(catalog_num, 0)
    d[_N_INFO] = Ref(info_num, 0)
    d[_N_ID] = _file_id(doc_id)
    if encrypt_num is not None:
        d[Name("Encrypt")] = Ref(encrypt_num, 0)
    d[_N_LENGTH] = len(body)
    out = bytearray()
    out += str(obj_num).encode() + b" 0 obj\n"
    out += produce(CStream(d, body))
    out += b"\nendobj\n"
    return bytes(out)


def _assemble_objstream(
    g: _Graph,
    catalog_num: int,
    info_num: int,
    doc_id: str,
    encryption: Optional[str] = None,
) -> bytes:
    """PDF 1.5 layout: non-stream objects packed into object streams
    (≤25 members each), xref stream with type-2 entries (X4/X9).

    With ``encryption`` this is the standard real-corpus PDF-1.5+
    encrypted shape (§7.5.8.2/§7.6.2): top-level streams and the
    ObjStm containers' bytes are ciphered under their own (num, gen);
    member objects INSIDE an ObjStm are stored plaintext (the
    container decrypt covers them); the xref stream and the /Encrypt
    dict itself are never encrypted."""
    handler = _build_encryption(g, doc_id, encryption)
    out = bytearray()
    out += b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    stream_objs = {n: v for n, v in g.objs.items() if isinstance(v, CStream)}
    plain_objs = {n: v for n, v in g.objs.items() if not isinstance(v, CStream)}
    if handler is not None:
        # the /Encrypt dict stays a top-level uncompressed object
        enc_dict = plain_objs.pop(g.encrypt_num)

    offsets: dict[int, int] = {}
    for n in sorted(stream_objs):
        body = stream_objs[n]
        if handler is not None:
            body = _crypt_transform(body, n, 0, handler)
        offsets[n] = len(out)
        out += str(n).encode() + b" 0 obj\n" + produce(body) + b"\nendobj\n"
    if handler is not None:
        offsets[g.encrypt_num] = len(out)
        out += (
            str(g.encrypt_num).encode() + b" 0 obj\n" + produce(enc_dict) + b"\nendobj\n"
        )

    compressed: dict[int, tuple[int, int]] = {}
    plain_nums = sorted(plain_objs)
    GROUP = 25
    for gi in range(0, len(plain_nums), GROUP):
        members = plain_nums[gi : gi + GROUP]
        cont_num = g.reserve()
        header = bytearray()
        bodies = bytearray()
        rel_offsets = []
        for n in members:
            rel_offsets.append(len(bodies))
            bodies += produce(plain_objs[n]) + b"\n"
        for n, rel in zip(members, rel_offsets):
            header += f"{n} {rel} ".encode()
        first = len(header)
        payload = bytes(header) + bytes(bodies)
        comp = flate_encode(payload)
        if handler is not None:
            # encryption applies to the stored (post-filter) bytes;
            # the parser decrypts first, then FlateDecodes (§7.6.2)
            comp = handler.encrypt(comp, cont_num, 0, False)
        d = CDict()
        d[_N_TYPE] = _N_OBJSTM
        d[_N_N] = len(members)
        d[_N_FIRST] = first
        d[_N_FILTER] = _N_FLATE
        d[_N_LENGTH] = len(comp)
        offsets[cont_num] = len(out)
        out += str(cont_num).encode() + b" 0 obj\n" + produce(CStream(d, comp)) + b"\nendobj\n"
        for idx, n in enumerate(members):
            compressed[n] = (cont_num, idx)

    xref_num = g.reserve()
    xref_off = len(out)
    out += _xref_stream_bytes(
        g,
        offsets,
        catalog_num,
        info_num,
        doc_id,
        obj_num=xref_num,
        compressed=compressed,
        self_offset=xref_off,
        encrypt_num=g.encrypt_num if handler is not None else None,
    )
    out += b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    return bytes(out)


_DECOY_CACHE: dict = {}


def _decoy_stream() -> "CStream":
    # constant content → flate once per process, not once per doc
    if "a" not in _DECOY_CACHE:
        _DECOY_CACHE["a"] = _encode_content(
            b"BT /F1 12 Tf 10 700 Td (DECOY SUPERSEDED) Tj ET", ["flate"]
        )
    return _DECOY_CACHE["a"]


def _decoy_b_stream() -> "CStream":
    if "b" not in _DECOY_CACHE:
        _DECOY_CACHE["b"] = _encode_content(
            b"BT /F1 12 Tf 10 700 Td (GEN DECOY MUST LOSE) Tj ET", ["flate"]
        )
    return _DECOY_CACHE["b"]


def _assemble_incremental(
    g: _Graph, catalog_num: int, info_num: int, doc_id: str, spans: Sequence[tuple]
) -> bytes:
    """Base revision carries a DECOY first content stream; the
    appended revision supersedes it (newest xref section wins,
    first-writer-wins parse order). A second decoy exercises
    generation precedence: the base lists object B at gen 1 (correct)
    and the update lists B at gen 0 (decoy) — gen 1 must win
    (XRefTable.java:37-43)."""
    content_nums = list(g.content_nums)
    if not content_nums:
        return _assemble_classic(g, catalog_num, info_num, doc_id)
    a_num = content_nums[0]
    correct_a = g.objs[a_num]
    decoy = _decoy_stream()
    g.objs[a_num] = decoy

    b_num = content_nums[1] if len(content_nums) > 1 else None
    correct_b = g.objs[b_num] if b_num is not None else None

    # --- base revision (classic), object B written at gen 1 ----------
    out = bytearray()
    out += b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets: dict[int, int] = {}
    gens: dict[int, int] = {}
    for n in sorted(g.objs):
        gen = 1 if n == b_num else 0
        offsets[n] = len(out)
        gens[n] = gen
        out += f"{n} {gen} obj\n".encode() + produce(g.objs[n]) + b"\nendobj\n"
    base_xref_off = len(out)
    size = max(g.objs) + 1
    out += b"xref\n0 1\n0000000000 65535 f \n"
    if _CTOK_EMIT_XREF is not None:
        out += _CTOK_EMIT_XREF(
            [(n, offsets[n], gens[n]) for n in sorted(g.objs)], b"\n", b" \n"
        )
    else:
        for n in sorted(g.objs):
            out += f"{n} 1\n{offsets[n]:010d} {gens[n]:05d} n \n".encode()
    trailer = CDict()
    trailer[_N_SIZE] = size
    trailer[_N_ROOT] = Ref(catalog_num, 0)
    trailer[_N_INFO] = Ref(info_num, 0)
    trailer[_N_ID] = _file_id(doc_id)
    out += b"trailer\n" + produce(trailer) + b"\nstartxref\n"
    out += str(base_xref_off).encode() + b"\n%%EOF\n"

    # --- incremental update: correct A (gen 0), decoy B (gen 0) ------
    upd_offsets: dict[int, int] = {}
    upd_offsets[a_num] = len(out)
    out += f"{a_num} 0 obj\n".encode() + produce(correct_a) + b"\nendobj\n"
    if b_num is not None:
        decoy_b = _decoy_b_stream()
        upd_offsets[b_num] = len(out)
        out += f"{b_num} 0 obj\n".encode() + produce(decoy_b) + b"\nendobj\n"
    upd_xref_off = len(out)
    out += b"xref\n"
    for n in sorted(upd_offsets):
        out += f"{n} 1\n{upd_offsets[n]:010d} 00000 n \n".encode()
    t2 = CDict()
    t2[_N_SIZE] = size
    t2[_N_ROOT] = Ref(catalog_num, 0)
    t2[_N_INFO] = Ref(info_num, 0)
    t2[_N_PREV] = base_xref_off
    t2[_N_ID] = _file_id(doc_id)
    out += b"trailer\n" + produce(t2) + b"\nstartxref\n"
    out += str(upd_xref_off).encode() + b"\n%%EOF\n"
    return bytes(out)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

MALFORMED_KINDS = ("noise", "only_header", "header_eof", "zerosized", "no_startxref")


def build_pdf(
    doc_id: str,
    spans: Sequence[tuple],
    variant: str = "classic",
    info_fields: Optional[dict] = None,
    catalog_extra: Optional[dict] = None,
    xml_metadata: Optional[bytes] = None,
    encrypted: bool = False,
) -> bytes:
    """One document → PDF bytes. ``variant`` selects the structural
    layout (module docstring); ``filters:<f>[+<f>...]`` selects the
    content-stream filter chain; ``malformed:<kind>`` emits a payload
    that must be rejected."""
    if variant.startswith("malformed:"):
        kind = variant.split(":", 1)[1]
        if kind == "noise":
            return hashlib.md5(doc_id.encode()).digest() * 8
        if kind == "only_header":
            return b"%PDF-1.4\n"
        if kind == "header_eof":
            return b"%PDF-1.4\n%%EOF\n"
        if kind == "zerosized":
            return b""
        if kind == "no_startxref":
            body = build_pdf(doc_id, spans, "classic", info_fields)
            i = body.rfind(b"startxref")
            return body[:i] + b"%%EOF\n"
        if kind == "no_startxref_encrypted":
            # broken AND encrypted (r4): cipher + layout rotate as in
            # the `encrypted` variant, then the startxref chain is cut
            # — reconstruction must harvest /Encrypt + /ID, unlock,
            # then expand the (ciphered) object streams
            body = build_pdf(doc_id, spans, "encrypted", info_fields)
            i = body.rfind(b"startxref")
            return body[:i] + b"%%EOF\n"
        raise ValueError(f"unknown malformed kind {kind}")

    content_filters: Sequence[str] = ("flate",)
    layout = variant
    encryption: Optional[str] = "pwd" if encrypted else None
    cjk = False
    cjk_embedded = False
    if variant == "cjk":
        # Type0 + predefined GBK-EUC-H CMap (no ToUnicode) for every
        # GBK-encodable text span — the CID-CMap decode path
        layout = "classic"
        cjk = True
    if variant == "cjk:hanzi":
        # REAL-CJK extraction contract (r6): deterministic a-z →
        # U+4E00.. transliteration, shown via the predefined GBK-EUC-H
        # CMap with NO ToUnicode — the extracted text IS the hanzi and
        # the oracle mirrors the mapping with translate()
        layout = "classic"
        cjk = True
        spans = [
            (k, t.translate(_HANZI_TRANS) if t else t, m, o)
            for (k, t, m, o) in spans
        ]
    cid_collection: Optional[str] = None
    if variant.startswith("cjk:") and variant[4:] in _COLL_VARIANTS:
        # character-collection decode (r6 japan1; r7 gb1/cns1/korea1):
        # codes → collection CIDs via an embedded CMap; no
        # bf/ToUnicode anywhere — only the registered CID→Unicode
        # table recovers the text.  The r7 orderings also
        # transliterate a-z into their 26-glyph CJK block (hanzi /
        # hangul), carried by demo-supplement CIDs loaded through the
        # cid2code deployment hook — real CJK end-to-end
        layout = "classic"
        cid_collection = variant[4:]
        _o, _s, cp0, _cb, _excl = _COLL_VARIANTS[cid_collection]
        if cp0 is not None:
            trans = str.maketrans(
                "abcdefghijklmnopqrstuvwxyz",
                "".join(chr(cp0 + i) for i in range(26)),
            )
            spans = [
                (k, t.translate(trans) if t else t, m, o)
                for (k, t, m, o) in spans
            ]
    cjk_chained = False
    if variant == "cjk:embedded":
        # Type0 + fully custom EMBEDDED CMap stream (no ToUnicode):
        # all text rides codes only the in-file CMap can decode.
        # Half the docs (deterministic in doc_id) split the CMap
        # across an embedded→embedded /UseCMap chain — the child has
        # no codespacerange of its own, so tokenization AND the
        # 1-byte cid section must resolve through the chain
        layout = "classic"
        cjk_embedded = True
        cjk_chained = (
            int(hashlib.md5(doc_id.encode()).hexdigest()[4:6], 16) % 2 == 1
        )
    forms = False
    if variant == "forms":
        # half the text spans render through Form XObjects (/FmK Do)
        # — the interpreter must recurse in encounter order
        layout = "classic"
        forms = True
    attachments = False
    if variant == "attachments":
        # /Names → /EmbeddedFiles name tree with 1-3 deterministic
        # file attachments per doc (both tree shapes, filters rotate)
        layout = "classic"
        attachments = True
    navigation = False
    if variant == "navigation":
        # /Outlines bookmark tree + one /Link URI annotation per page
        layout = "classic"
        navigation = True
    acroform = False
    if variant == "acroform":
        # /AcroForm with 1-5 fields, nested /Kids + inherited /FT
        layout = "classic"
        acroform = True
    tagged = False
    if variant == "tagged":
        # Tagged PDF: content paints sections in scrambled order;
        # /StructTreeRoot carries the logical reading order (r8)
        layout = "classic"
        tagged = True
    nospace = False
    if variant == "nospace":
        # r8: no space glyph anywhere — spaces are positioning-only
        # gaps (TJ kerns / Td jumps); only infer_spaces extraction
        # recovers the text (§9.10-adjacent word-boundary heuristic)
        layout = "classic"
        nospace = True
    type3 = False
    if variant == "type3":
        # AGL-encodable text renders through a /Subtype /Type3
        # glyph-procedure font decoded via /Differences
        layout = "classic"
        type3 = True
    if variant == "pubsec":
        # certificate-based encryption (§7.6.5), both layouts rotated
        h = int(hashlib.md5(doc_id.encode()).hexdigest()[:4], 16)
        encryption = "pubsec"
        layout = ("classic", "objstream")[h % 2]
    if variant == "encrypted":
        # empty-user-password docs, cipher AND layout rotated per doc:
        # the extraction pipeline must decrypt RC4 (V2/R3), AES-128
        # (V4/R4/AESV2) and AES-256 — both R6 and the withdrawn
        # interim R5 (r4) — transparently, in both the classic layout
        # and the PDF-1.5+ object-stream layout (encrypted ObjStm
        # containers — the standard real-corpus pairing the r2
        # advisor flagged as untested)
        h = int(hashlib.md5(doc_id.encode()).hexdigest()[:4], 16)
        encryption = ("rc4", "aes", "aes256", "aes256r5")[h % 4]
        layout = ("classic", "objstream")[(h >> 8) % 2]
    if variant.startswith("filters:"):
        layout = "classic"
        content_filters = tuple(variant.split(":", 1)[1].split("+"))
        if content_filters == ("none",):
            content_filters = ()

    g, cat, info = build_object_graph(
        doc_id, spans, content_filters, info_fields, catalog_extra, xml_metadata,
        cjk=cjk, cjk_embedded=cjk_embedded, cjk_chained=cjk_chained,
        forms=forms, attachments=attachments, navigation=navigation,
        type3=type3, acroform=acroform, cid_collection=cid_collection,
        tagged=tagged, nospace=nospace,
    )
    if layout == "classic":
        return _assemble_classic(g, cat, info, doc_id, encryption=encryption)
    if layout == "crlf":
        return _assemble_classic(g, cat, info, doc_id, eol=b"\r\n")
    if layout == "hybrid":
        return _assemble_classic(g, cat, info, doc_id, hybrid=True)
    if layout == "objstream":
        return _assemble_objstream(g, cat, info, doc_id, encryption=encryption)
    if layout == "incremental":
        return _assemble_incremental(g, cat, info, doc_id, spans)
    raise ValueError(f"unknown variant {variant}")


def variant_for(doc_id: int, mode: str) -> str:
    """Deterministic per-doc variant assignment for mixed-mode tables."""
    if mode == "mixed":
        layouts = ("classic", "crlf", "objstream", "hybrid", "incremental")
        return layouts[doc_id % len(layouts)]
    if mode == "filters_rotate":
        chains = ("flate", "lzw", "a85", "ahx", "rl", "a85+flate", "none", "ahx+rl")
        return f"filters:{chains[doc_id % len(chains)]}"
    return mode
