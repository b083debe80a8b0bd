"""Opt-in §C.2 xref reconstruction (ParserSettings.allow_reconstruction):
files with a broken or missing startxref/xref chain extract anyway;
the DEFAULT contract (reject, like the reference) is unchanged."""

from __future__ import annotations

import glob
import os

import pytest

from conftest import REF
from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel import extract_spans
from pdfspark.kernel.errors import ParserSettings

LENIENT = ParserSettings(allow_reconstruction=True)
TEXT = "reconstruction corpus text " * 20


def _expected(spans):
    return [(k, t, m, i) for i, (k, t, m, _o) in enumerate(spans)]


@pytest.mark.parametrize("variant", ["classic", "objstream"])
def test_no_startxref_reconstructs(variant):
    spans = synth_spans_py("rx1", TEXT)
    payload = build_pdf("rx1", spans, variant)
    i = payload.rfind(b"startxref")
    broken = payload[:i] + b"%%EOF\n"
    # default contract: reject (reference requires startxref)
    st, err, got = extract_spans(broken)
    assert st == "error" and "startxref" in err
    # lenient: full recovery, exact span sequence
    st2, err2, got2 = extract_spans(broken, LENIENT)
    assert st2 == "ok", (variant, err2)
    assert got2 == _expected(spans)


def test_zeroed_xref_offset_reconstructs():
    spans = synth_spans_py("rx2", TEXT)
    payload = build_pdf("rx2", spans, "classic")
    # corrupt the xref table itself: overwrite 'xref' keyword
    i = payload.rfind(b"\nxref\n")
    broken = payload[:i] + b"\nXXXX\n" + payload[i + 6 :]
    st, _e, _g = extract_spans(broken)
    assert st == "error"
    st2, err2, got2 = extract_spans(broken, LENIENT)
    assert st2 == "ok", err2
    assert got2 == _expected(spans)


def test_reference_no_xref_family_recovers_or_fails_cleanly():
    """The reference's own `no xref` fixtures: default = reject
    (pinned elsewhere); lenient mode must never crash, and the
    text-bearing fixture must actually yield its text."""
    for path in sorted(glob.glob(os.path.join(REF, "minimal", "no xref", "*.pdf"))):
        with open(path, "rb") as f:
            data = f.read()
        st, _err, spans = extract_spans(data, ParserSettings(allow_reconstruction=True))
        assert st in ("ok", "error")
        if os.path.basename(path).startswith("a1"):
            assert st == "ok"
            assert any(k == "text" and t for (k, t, _m, _o) in spans)


def test_noise_still_fails_in_lenient_mode():
    st, _e, _g = extract_spans(b"\x00\x01" * 50, LENIENT)
    assert st == "error"


def test_lenient_mode_never_crashes_on_adversarial_noise():
    """Reconstruction scans the whole file with regexes — adversarial
    byte soup with embedded `obj`/`trailer`/`stream` tokens must come
    back ('ok'|'error'), never raise through the PERMISSIVE wrapper."""
    import random

    rng = random.Random(0xBAD)
    tokens = [b" obj ", b"trailer", b"stream\n", b"endstream", b"<<", b">>",
              b"%PDF-1.4\n", b"0 0 R", b"[", b"(", b"xref\n", b"%%EOF"]
    for trial in range(25):
        chunks = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 60)))]
        for _ in range(rng.randrange(0, 12)):
            chunks.append(rng.choice(tokens))
            chunks.append(bytes(rng.randrange(32, 127) for _ in range(rng.randrange(0, 30))))
        payload = b"%PDF-1.4\n" + b"".join(chunks)
        st, _err, spans = extract_spans(payload, LENIENT)
        assert st in ("ok", "error"), trial
        if st == "error":
            assert spans == []


def test_encrypted_no_startxref_reconstructs():
    """Salvage × encryption (r4): startxref-less ENCRYPTED docs —
    ciphers and layouts rotating per doc_id — reconstruct to the exact
    span sequence. Reconstruction must harvest /Encrypt + /ID from
    the scanned trailers/xref-stream dicts, unlock with the empty
    user password, and only then expand the ciphered object streams."""
    text = "salvage and decrypt " * 12
    lenient = ParserSettings(allow_reconstruction=True)
    seen_layouts = set()
    import hashlib

    for i in range(16):
        did = f"senc{i}"
        h = int(hashlib.md5(did.encode()).hexdigest()[:4], 16)
        seen_layouts.add(("classic", "objstream")[(h >> 8) % 2])
        spans = synth_spans_py(did, text)
        payload = build_pdf(did, spans, "malformed:no_startxref_encrypted")
        assert b"startxref" not in payload
        status, err, got = extract_spans(payload, lenient)
        assert status == "ok", (did, err)
        assert got == spans, did
    assert seen_layouts == {"classic", "objstream"}


def test_encrypted_passworded_broken_doc_still_rejected():
    """A broken doc with a REAL user password: reconstruction harvests
    /Encrypt, the empty-password unlock fails, and the M10 policy
    routes it to the error bucket — same contract as its
    startxref-intact twin, never a crash."""
    spans = synth_spans_py("pw1", "secret text " * 8)
    body = build_pdf("pw1", spans, "classic", encrypted=True)
    cut = body[: body.rfind(b"startxref")] + b"%%EOF\n"
    status, err, got = extract_spans(
        cut, ParserSettings(allow_reconstruction=True)
    )
    assert status == "error" and got == []
    assert "password" in (err or "")
