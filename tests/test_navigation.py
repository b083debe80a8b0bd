"""Outline trees (§12.3.3) and /Link URI annotations (§12.5 +
§12.6.4.7) — EXTENSION, r4: the reference reads neither."""

from __future__ import annotations

import hashlib
import math

from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel.cos import CDict, Name, Ref
from pdfspark.kernel.extract import parse_document


def test_navigation_variant_outlines_and_links():
    for i in range(8):
        did = f"nav{i}"
        spans = synth_spans_py(did, "words here " * (30 + 40 * i))
        doc = parse_document(build_pdf(did, spans, "navigation"))
        n_top = 1 + int(hashlib.md5(did.encode()).hexdigest()[8:10], 16) % 3
        exp = []
        for t in range(n_top):
            exp.append((len(exp), 0, f"sec{t}"))
            if t % 2 == 0:
                exp.append((len(exp), 1, f"sec{t}.0"))
                exp.append((len(exp), 1, f"sec{t}.1"))
        assert doc.outlines() == exp
        n_pages = max(1, math.ceil(len(spans) / 5))
        assert doc.link_uris() == [
            (p, f"https://example.org/{did}/{p}") for p in range(n_pages)
        ]


def test_outline_cycle_is_guarded():
    """A /Next cycle in the outline list terminates instead of
    looping (id-based visited set)."""
    from pdfspark import codec as C

    spans = synth_spans_py("cyc0", "x" * 60)
    g, cat, info = C.build_object_graph("cyc0", spans)
    a_num, b_num, root_num = g.reserve(), g.reserve(), g.reserve()
    a = CDict(); a[Name("Title")] = C.CString.from_text("a")
    a[Name("Next")] = Ref(b_num, 0)
    b = CDict(); b[Name("Title")] = C.CString.from_text("b")
    b[Name("Next")] = Ref(a_num, 0)  # cycle
    g.objs[a_num], g.objs[b_num] = a, b
    root = CDict(); root[Name("Type")] = Name("Outlines")
    root[Name("First")] = Ref(a_num, 0)
    g.objs[root_num] = root
    g.objs[cat][Name("Outlines")] = Ref(root_num, 0)
    payload = C._assemble_classic(g, cat, info, "cyc0")
    got = parse_document(payload).outlines()
    assert got == [(0, 0, "a"), (1, 0, "b")]


def test_plain_docs_have_no_navigation():
    spans = synth_spans_py("pl0", "y" * 90)
    doc = parse_document(build_pdf("pl0", spans, "classic"))
    assert doc.outlines() == [] and doc.link_uris() == []


def test_form_fields_roundtrip_and_inheritance():
    """AcroForm extraction (r5): dotted full names through the /Kids
    group, /FT inherited from the non-terminal parent, typed values
    (Tx string / Btn name / Ch choice) — matches the generator's
    closed-form contract; plain docs report no fields."""
    import hashlib

    for did in ("0", "1", "12"):
        txt = hashlib.md5(did.encode()).hexdigest() * 4
        doc = parse_document(build_pdf(did, synth_spans_py(did, txt), "acroform"))
        rows = doc.form_fields()
        n = 1 + int(hashlib.md5(did.encode()).hexdigest()[12:14], 16) % 5
        assert len(rows) == n
        for pos, name, ftype, value in rows:
            k = rows.index((pos, name, ftype, value))
            assert pos == k
            h8 = hashlib.md5(f"{did}:fld:{k}".encode()).hexdigest()
            if n >= 2 and k < 2:
                assert name == f"grp.f{k}" and ftype == "Tx"
                assert value == f"v{k}-{h8[:8]}"
            elif k % 3 == 0:
                assert (name, ftype, value) == (f"f{k}", "Tx", f"v{k}-{h8[:8]}")
            elif k % 3 == 1:
                assert (name, ftype) == (f"f{k}", "Btn")
                assert value == ("Yes" if k % 2 == 0 else "Off")
            else:
                assert (name, ftype, value) == (f"f{k}", "Ch", f"c{h8[:4]}")
    assert parse_document(build_pdf("p1", synth_spans_py("p1", "z" * 90), "classic")).form_fields() == []


def test_form_fields_kids_cycle_is_guarded():
    """A /Kids cycle in the field tree terminates via the id-based
    visited set instead of recursing forever."""
    from pdfspark import codec as C

    spans = synth_spans_py("fc0", "x" * 60)
    g, cat, info = C.build_object_graph("fc0", spans)
    a_num, b_num = g.reserve(), g.reserve()
    a = CDict(); a[Name("T")] = C.CString.from_text("a")
    a[Name("Kids")] = [Ref(b_num, 0)]
    b = CDict(); b[Name("T")] = C.CString.from_text("b")
    b[Name("Kids")] = [Ref(a_num, 0)]  # cycle
    g.objs[a_num], g.objs[b_num] = a, b
    af = CDict(); af[Name("Fields")] = [Ref(a_num, 0)]
    g.objs[cat][Name("AcroForm")] = af
    payload = C._assemble_classic(g, cat, info, "fc0")
    assert parse_document(payload).form_fields() == []


def test_form_fields_multi_widget_kids_emit_once():
    """§12.7.3.2: kids WITHOUT /T are widget annotations of a terminal
    field (one per page it renders on) — the field must be emitted
    exactly once, not once per widget."""
    from pdfspark import codec as C

    spans = synth_spans_py("mw0", "x" * 60)
    g, cat, info = C.build_object_graph("mw0", spans)
    w1, w2, f_num = g.reserve(), g.reserve(), g.reserve()
    for wn in (w1, w2):
        wd = CDict()
        wd[Name("Subtype")] = Name("Widget")
        wd[Name("Rect")] = [0, 0, 10, 10]
        wd[Name("Parent")] = Ref(f_num, 0)
        g.objs[wn] = wd
    fld = CDict()
    fld[Name("T")] = C.CString.from_text("one")
    fld[Name("FT")] = Name("Tx")
    fld[Name("V")] = C.CString.from_text("val")
    fld[Name("Kids")] = [Ref(w1, 0), Ref(w2, 0)]
    g.objs[f_num] = fld
    af = CDict()
    af[Name("Fields")] = [Ref(f_num, 0)]
    g.objs[cat][Name("AcroForm")] = af
    payload = C._assemble_classic(g, cat, info, "mw0")
    assert parse_document(payload).form_fields() == [(0, "one", "Tx", "val")]
