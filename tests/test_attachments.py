"""File attachments through the /Names → /EmbeddedFiles name tree
(ISO 32000-1 §7.9.6 name trees + §7.11.3-4 file specifications —
EXTENSION, r4: the reference reads no name trees at all)."""

from __future__ import annotations

import hashlib

from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel.cos import CDict, CString, Name, Ref
from pdfspark.kernel.extract import parse_document


def _doc(did: str, variant: str = "attachments"):
    spans = synth_spans_py(did, "attachment host doc " * 8)
    return parse_document(build_pdf(did, spans, variant))


def test_attachments_roundtrip_all_counts():
    """1-3 deterministic attachments per doc: tree keys, filenames,
    decoded size and md5 all match the generator contract; both tree
    shapes (/Kids split with /Limits for n ≥ 2, direct leaf for n = 1)
    appear across the doc_id range."""
    seen_counts = set()
    for i in range(12):
        did = f"att{i}"
        rows = _doc(did).embedded_files()
        n_exp = 1 + int(hashlib.md5(did.encode()).hexdigest()[6:8], 16) % 3
        assert len(rows) == n_exp
        seen_counts.add(n_exp)
        for k, r in enumerate(rows):
            content = hashlib.md5(f"{did}:att:{k}".encode()).hexdigest()
            assert r["att_name"] == r["filename"] == f"att{k}.txt"
            assert r["size"] == 32
            assert r["content_md5"] == hashlib.md5(content.encode()).hexdigest()
    assert seen_counts == {1, 2, 3}


def test_no_names_dict_is_empty_not_error():
    assert _doc("plain0", "classic").embedded_files() == []


def test_malformed_tree_entries_skipped_softly():
    """Odd /Names arrays, non-dict filespecs and missing /EF streams
    degrade to skipped/partial rows, never a crash (PERMISSIVE)."""
    from pdfspark import codec as C

    spans = synth_spans_py("mal0", "x" * 40)
    g, cat, info = C.build_object_graph("mal0", spans)
    leaf = CDict()
    fs_ok = CDict()
    fs_ok[Name("Type")] = Name("Filespec")
    fs_ok[Name("F")] = CString.from_text("ok.txt")
    # no /EF at all → size 0 row
    leaf[Name("Names")] = [
        CString.from_text("a"),
        Ref(g.add(fs_ok), 0),
        CString.from_text("b"),  # odd tail (no value) → skipped
    ]
    root = CDict()
    root[Name("EmbeddedFiles")] = Ref(g.add(leaf), 0)
    names = CDict()
    names[Name("EmbeddedFiles")] = root[Name("EmbeddedFiles")]
    g.objs[cat][Name("Names")] = names
    payload = C._assemble_classic(g, cat, info, "mal0")
    rows = parse_document(payload).embedded_files()
    assert rows == [
        {
            "att_name": "a",
            "filename": "ok.txt",
            "size": 0,
            "content_md5": hashlib.md5(b"").hexdigest(),
        }
    ]
