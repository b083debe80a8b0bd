"""Tagged-PDF logical reading order (ISO 32000-1 §14.6-14.8) —
EXTENSION, r8: the reference has no structure-tree reader; built from
the spec. The `tagged` generator variant paints each span as its own
marked-content section (/P or /Figure <</MCID j>> BDC … EMC) in a
SCRAMBLED two-column order (evens then odds) and records the logical
sequence only under /StructTreeRoot, rotating both §14.7.4.2 leaf
forms (integer MCID under an ancestor /Pg; explicit /MCR dict)."""

from __future__ import annotations

from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel.cos import CDict, Name, Ref
from pdfspark.kernel.extract import extract_spans_doc, parse_document
from pdfspark.kernel.textops import split_marked_sections

TEXT = "lorem ipsum dolor sit amet " * 40  # 14 chunks → 2+ pages


def test_tagged_reading_order_roundtrip():
    """reading_order=True recovers the exact synthesis order."""
    for i in range(8):
        did = f"tag{i}"
        spans = synth_spans_py(did, TEXT + "y" * (37 * i))
        pdf = build_pdf(did, spans, "tagged")
        got = extract_spans_doc(pdf, reading_order=True)
        assert got == [(k, t, m, j) for j, (k, t, m, _o) in enumerate(spans)]


def test_tagged_content_order_is_scrambled():
    """The negative control: WITHOUT reading_order the same payload
    yields a different span sequence (raw paint order) — proving the
    identity above is carried by the structure walk, not by luck."""
    did = "tagneg"
    spans = synth_spans_py(did, TEXT)
    pdf = build_pdf(did, spans, "tagged")
    raw = [s[:3] for s in extract_spans_doc(pdf)]
    logical = [s[:3] for s in extract_spans_doc(pdf, reading_order=True)]
    assert sorted(map(repr, raw)) == sorted(map(repr, logical))  # same set
    assert raw != logical  # different order


def test_untagged_docs_unchanged_by_flag():
    did = "plain0"
    spans = synth_spans_py(did, TEXT)
    pdf = build_pdf(did, spans, "classic")
    assert extract_spans_doc(pdf, reading_order=True) == extract_spans_doc(pdf)


def test_struct_tree_cycle_is_guarded():
    """A /K self-cycle in the structure tree terminates (id-based
    visited set) and still emits the acyclic part."""
    from pdfspark import codec as C

    did = "tagcyc"
    spans = synth_spans_py(did, TEXT)
    g, cat, info = C.build_object_graph(did, spans, tagged=True)
    # find the StructTreeRoot and point its /Document element's /K
    # list back at the Document element itself (a cycle) plus the
    # original kids
    stroot_ref = g.objs[cat][Name("StructTreeRoot")]
    docel_ref = g.objs[stroot_ref.num][Name("K")]
    docel = g.objs[docel_ref.num]
    kids = docel[Name("K")]
    docel[Name("K")] = [docel_ref] + list(kids)
    payload = C._assemble_classic(g, cat, info, did)
    got = extract_spans_doc(payload, reading_order=True)
    assert got == [(k, t, m, j) for j, (k, t, m, _o) in enumerate(spans)]


def test_struct_order_none_when_untagged():
    did = "plain1"
    doc = parse_document(build_pdf(did, synth_spans_py(did, TEXT), "classic"))
    assert doc.struct_order() is None


def test_split_marked_sections_rules():
    """String/hex literals never split; nesting stays inside the
    outer section; gaps come back as mcid=None; a stray EMC at depth
    0 is ignored; an unterminated section runs to EOF."""
    data = (
        b"BT (EMC not an op) Tj ET\n"
        b"/P <</MCID 4>> BDC BT (a) Tj ET "
        b"/Span BMC BT (nested) Tj ET EMC BT (b) Tj ET EMC\n"
        b"EMC\n"
        b"/Figure <</MCID 7>> BDC BT (tail) Tj ET"
    )
    segs = split_marked_sections(data)
    # the stray depth-0 EMC surfaces as an untagged gap holding only
    # the bare operator — zero spans once interpreted, never a split
    assert [m for m, _ in segs] == [None, 4, None, 7]
    assert b"EMC not an op" in segs[0][1]
    assert b"nested" in segs[1][1] and b"(b)" in segs[1][1]
    assert segs[2][1].strip() == b"EMC"
    assert segs[3][1].endswith(b"BT (tail) Tj ET")


def test_unreferenced_and_dangling_mcids_are_permissive():
    """Marked content the tree never references still comes out
    (after the referenced sequence); tree leaves pointing at MCIDs
    that don't exist in content are skipped."""
    from pdfspark import codec as C

    did = "tagdangle"
    spans = synth_spans_py(did, TEXT)
    g, cat, info = C.build_object_graph(did, spans, tagged=True)
    stroot_ref = g.objs[cat][Name("StructTreeRoot")]
    docel_ref = g.objs[stroot_ref.num][Name("K")]
    sects = g.objs[docel_ref.num][Name("K")]
    first_sect = g.objs[sects[0].num]
    kids = list(first_sect[Name("K")])
    # drop the first leaf (its MCID becomes unreferenced content) and
    # append a dangling MCR pointing at MCID 999 (no such content)
    dangle = CDict()
    dangle[Name("Type")] = Name("MCR")
    dangle[Name("Pg")] = first_sect[Name("Pg")]  # the Sect's page
    dangle[Name("MCID")] = 999
    first_sect[Name("K")] = kids[1:] + [Ref(g.add(dangle), 0)]
    payload = C._assemble_classic(g, cat, info, did)
    got = extract_spans_doc(payload, reading_order=True)
    # same multiset of spans, every span emitted exactly once
    exp_set = sorted(repr((k, t, m)) for (k, t, m, _o) in spans)
    assert sorted(repr(s[:3]) for s in got) == exp_set
