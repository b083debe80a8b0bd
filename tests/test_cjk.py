"""Predefined CID-CMap decoding (kernel/textops Table 118 registry):
Type0 fonts with a predefined CJK /Encoding and NO /ToUnicode must
still extract text — the CMap family's code bytes ARE a well-known
character encoding."""

from __future__ import annotations

import pytest

from pdfspark.codec import build_pdf, synth_spans_py
from pdfspark.kernel import extract_spans
from pdfspark.kernel.cos import CDict, Name
from pdfspark.kernel.textops import Font

CJK_TEXT = ("数据处理引擎对照测试 中文抽取 spark 分布式 " * 12).strip()


def _expected(spans):
    return [(k, t, m, i) for i, (k, t, m, _o) in enumerate(spans)]


def test_cjk_variant_roundtrips_chinese():
    spans = synth_spans_py("cjk1", CJK_TEXT)
    payload = build_pdf("cjk1", spans, "cjk")
    assert b"GBK-EUC-H" in payload or b"/F3" in payload  # the CMap path is live
    st, err, got = extract_spans(payload)
    assert st == "ok", err
    assert got == _expected(spans)


def test_cjk_variant_roundtrips_ascii():
    # ASCII ⊂ GBK: the driver tables are ASCII, and still route /F3
    spans = synth_spans_py("cjk2", "plain ascii words " * 30)
    st, err, got = extract_spans(build_pdf("cjk2", spans, "cjk"))
    assert st == "ok", err
    assert got == _expected(spans)


def test_cjk_with_encryption_stack():
    spans = synth_spans_py("cjk3", CJK_TEXT)
    payload = build_pdf("cjk3", spans, "cjk", encrypted=False)
    st, _err, got = extract_spans(payload)
    assert st == "ok" and got == _expected(spans)


@pytest.mark.parametrize(
    "cmap,codec,sample",
    [
        ("GBK-EUC-H", "gbk", "汉字抽取"),
        ("GB-EUC-H", "gb2312", "中文"),
        ("ETen-B5-H", "big5", "中華民國"),
        ("90ms-RKSJ-H", "cp932", "日本語テキスト"),
        ("KSCms-UHC-H", "cp949", "한국어 텍스트"),
        ("UniGB-UCS2-H", "utf-16-be", "任意の unicode ✓"),
        ("UniKS-UTF16-V", "utf-16-be", "세로쓰기"),
    ],
)
def test_predefined_cmap_registry(cmap, codec, sample):
    fd = CDict()
    fd[Name("Subtype")] = Name("Type0")
    fd[Name("Encoding")] = Name(cmap)
    f = Font(fd, None)
    assert f.codec == codec
    assert f.decode(sample.encode(codec)) == sample


def test_unknown_predefined_cmap_falls_back():
    fd = CDict()
    fd[Name("Subtype")] = Name("Type0")
    fd[Name("Encoding")] = Name("H")  # ISO-2022 family: unsupported
    f = Font(fd, None)
    assert f.codec is None  # identity UTF-16BE fallback, not a crash
    assert isinstance(f.decode(b"\x00A\x00b"), str)
