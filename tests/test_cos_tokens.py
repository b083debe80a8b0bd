"""Token-level tests — mirrors TestCOSNumber.java:152-274 and
TestCOSString.java:63-181 (SURVEY.md §5.4-5.5)."""

from __future__ import annotations

import random

import pytest

from pdfspark.kernel.cos import (
    CString,
    Name,
    Ref,
    parse_literal_string,
    parse_object,
    produce,
    produce_hex_string,
    produce_literal_string,
)
from pdfspark.kernel.errors import EParseError
from pdfspark.kernel.raw import Raw


def parse_one(b: bytes):
    return parse_object(Raw(b))


# --- number matrix (TestCOSNumber.java:152-274) -----------------------


@pytest.mark.parametrize(
    "src,expected",
    [
        (b"0", 0),
        (b"-0000", 0),
        (b"+1234567890", 1234567890),
        (b"-170", -170),
        (b"4.", 4.0),
        (b"-.002", -0.002),
        (b"34.5", 34.5),
        (b"-3.62", -3.62),
        (b"+123.6", 123.6),
        (b"0.0", 0.0),
        (b"123", 123),
    ],
)
def test_number_values(src, expected):
    got = parse_one(src)
    assert got == expected
    assert isinstance(got, int) == isinstance(expected, int)


@pytest.mark.parametrize("term", [b"]", b">", b"%", b"/", b")", b" ", b"\n"])
def test_number_delimiter_terminated(term):
    # "+1234567890/" style: delimiter ends the token (TestCOSNumber)
    got = parse_one(b"+1234567890" + term)
    assert got == 1234567890


@pytest.mark.parametrize("src", [b"3.14e5", b"1.2.3", b"--5", b"+-1", b"."])
def test_number_malformed(src):
    with pytest.raises(EParseError):
        parse_one(src)


# --- literal strings (TestCOSString.java:63-98) -----------------------


@pytest.mark.parametrize(
    "src,expected",
    [
        (rb"(\0053)", b"\x053"),  # 2 chars: octal 005 then '3'
        (rb"(\053)", b"+"),
        (rb"(\53)", b"+"),
        (rb"(a\nb)", b"a\nb"),
        (rb"(a\tb\rc\fd\be)", b"a\tb\rc\fd\be"),
        (rb"(nested (parens) here)", b"nested (parens) here"),
        (rb"(escaped \( paren)", b"escaped ( paren"),
        (rb"(back\\slash)", b"back\\slash"),
        (rb"(unknown \q escape)", b"unknown q escape"),
        (b"(line\\\ncontinue)", b"linecontinue"),
        (b"(bare\rEOL)", b"bare\nEOL"),
        (b"(bare\r\nEOL)", b"bare\nEOL"),
    ],
)
def test_literal_string(src, expected):
    got = parse_literal_string(Raw(src))
    assert got.raw == expected


def test_hex_string():
    assert parse_one(b"<48656c6C6f>").raw == b"Hello"
    assert parse_one(b"<48 65 6c\n6C 6f>").raw == b"Hello"
    # odd final nibble → <<4 pad (COSString.java:532-568)
    assert parse_one(b"<901fa3>").raw == b"\x90\x1f\xa3"
    assert parse_one(b"<901fa>").raw == b"\x90\x1f\xa0"
    with pytest.raises(EParseError):
        parse_one(b"<90zz>")


# --- round-trip property (TestCOSString.checkProduceParsePair,
#     :148-181 — 99 iterations of seeded random 100-byte payloads) ----


def test_string_produce_parse_roundtrip():
    rng = random.Random(100)  # same seed spirit as the reference
    for _ in range(99):
        raw = bytes(rng.randrange(256) for _ in range(100))
        lit = parse_literal_string(Raw(produce_literal_string(raw)))
        assert lit.raw == raw
        hexed = parse_one(produce_hex_string(raw))
        assert hexed.raw == raw


# --- names (ISO 32000-1 §7.3.5; reference's #xx decode bug fixed) -----


@pytest.mark.parametrize(
    "src,expected",
    [
        (b"/Name1", "Name1"),
        (b"/A;Name_With-Various***Chars?", "A;Name_With-Various***Chars?"),
        (b"/paired#28#29parentheses", "paired()parentheses"),
        (b"/A#42", "AB"),
        (b"/lime#20Green", "lime Green"),
    ],
)
def test_name_escapes(src, expected):
    assert str(parse_one(src)) == expected


def test_name_produce_roundtrip():
    for nm in ["Kids", "lime Green", "A(B)", "x#y", "Im0"]:
        out = produce(Name(nm))
        assert str(parse_one(out)) == nm


# --- composite values + references ------------------------------------


def test_dict_array_ref():
    v = parse_one(b"<< /Type /Page /Kids [3 0 R 4 0 R] /Count 2 /F 1.5 >>")
    assert str(v.get_name("Type")) == "Page"
    assert v["Kids"] == [Ref(3, 0), Ref(4, 0)]
    assert v.get_int("Count") == 2
    assert v["F"] == 1.5


def test_bool_null():
    assert parse_one(b"true") is True
    assert parse_one(b"false") is False
    assert not parse_one(b"null")


def test_packed_dict_no_whitespace():
    # p1 - minimum.pdf style (FileHandlingTest.java:59-72)
    v = parse_one(b"<</Type/Pages/Kids[3 0 R]/Count 1>>")
    assert v["Kids"] == [Ref(3, 0)]


def test_produce_parse_value_roundtrip():
    src = b"<< /A [1 2.5 (s) <0aff> /N true null 7 0 R] /B << /C -4 >> >>"
    v1 = parse_one(src)
    v2 = parse_one(produce(v1))
    assert produce(v1) == produce(v2)


def test_comment_skipped():
    assert parse_one(b"% comment line\n 42") == 42


def test_deref_depth_guard():
    # ≤5 hops (COSDictionary.java:102-110)
    from pdfspark.kernel.cos import CDict

    d = parse_one(b"<< /X 1 0 R >>")
    chain = {i: Ref(i + 1, 0) for i in range(1, 10)}
    with pytest.raises(EParseError):
        d.get_int("X", 0, resolver=lambda r: chain.get(r.num, 5))
