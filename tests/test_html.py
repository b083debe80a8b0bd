"""HTML boilerplate stripping (kernel/htmlops): block heuristics must
classify on MERIT — link density, block length, semantic ancestors —
not just the generator's tag layout."""

from __future__ import annotations

from pdfspark.kernel.htmlops import main_content_blocks, strip_boilerplate
from pdfspark.ops.html import N_TEMPLATE_BOILER_BLOCKS, wrap_html


def test_template_boiler_block_count():
    """Pins the constant the DuckDB oracle depends on."""
    text = "alpha beta gamma delta " * 30
    blocks = main_content_blocks(wrap_html("7", text.strip()))
    dropped = [b for b in blocks if not b["keep"]]
    long_chunks = [b for b in blocks if b["keep"]]
    assert len(dropped) == N_TEMPLATE_BOILER_BLOCKS
    assert all(b["n_chars"] >= 8 and b["link_density"] <= 0.33 for b in long_chunks)
    # boiler chars formula mirrored in HTML_BLOCK_STATS_SQL
    assert sum(b["n_chars"] for b in dropped) == 88 + len("7")


def test_roundtrip_identity_large_ids():
    # ids ≥ 1000 once leaked the <title> as a kept block — pinned
    for doc_id in ("1", "4999", "123456"):
        text = "word " * 100
        got = strip_boilerplate(wrap_html(doc_id, text.strip()))
        exp = "\n".join(
            c
            for c in (text.strip()[i : i + 80].strip() for i in range(0, len(text.strip()), 80))
            if len(c) >= 8
        )
        assert got == exp, doc_id


def test_link_density_drops_menu_without_semantic_tags():
    html = """<html><body>
    <div><a href="/x">Products</a> | <a href="/y">Pricing</a> | <a href="/z">Contact sales</a></div>
    <div>This paragraph is genuine readable content with plenty of words
    and only one <a href="/ref">reference link</a> inside a long run of text.</div>
    </body></html>"""
    blocks = main_content_blocks(html)
    menu, content = blocks[0], blocks[1]
    assert menu["link_density"] > 0.8 and not menu["keep"]
    assert content["link_density"] < 0.2 and content["keep"]


def test_semantic_ancestors_drop_even_long_text():
    html = """<html><body><footer><p>
    This footer paragraph is long enough to pass the length test and has
    no links at all, but it lives under a footer ancestor and must drop.
    </p></footer><p>Real content paragraph, long enough to keep around.</p></body></html>"""
    blocks = main_content_blocks(html)
    assert [b["keep"] for b in blocks] == [False, True]
    assert blocks[0]["ancestor"] == "footer"


def test_script_style_comments_and_entities():
    html = """<html><body>
    <script>document.write("NOT CONTENT not even close to content");</script>
    <style>p { color: red } /* NOT CONTENT */</style>
    <!-- NOT CONTENT either -->
    <p>Fish &amp; chips &lt;taste&gt; great &#33; &#x21;</p>
    </body></html>"""
    out = strip_boilerplate(html)
    assert out == "Fish & chips <taste> great ! !"
    assert "NOT CONTENT" not in out


def test_misnested_and_uppercase_tags_tolerated():
    html = """<HTML><BODY><DIV><P>First real paragraph of the document body.
    </DIV></P><p>Second real paragraph also long enough to keep.</p></BODY>"""
    out = strip_boilerplate(html)
    assert "First real paragraph" in out and "Second real paragraph" in out


def test_short_blocks_dropped():
    html = "<html><body><p>OK</p><p>A genuinely long enough paragraph survives.</p></body></html>"
    blocks = main_content_blocks(html)
    assert [b["keep"] for b in blocks] == [False, True]


def test_link_rows_classification_and_order():
    """r7 outlink graph: template links classify boilerplate, a
    citation inside a healthy paragraph classifies in_main, and a
    link-dominated block (short final chunk) flips to boilerplate on
    the density gate."""
    from pdfspark.kernel.htmlops import link_rows
    from pdfspark.ops.html import wrap_html_linked

    rows = link_rows(wrap_html_linked("3", "word " * 50))  # 250 chars
    assert [r[:2] for r in rows[:6]] == [
        ("/", "Home"), ("/docs", "Docs"), ("/about", "About corp"),
        ("/d/3", "doc 3"), ("/sub", "Subscribe now"),
        ("/promo", "Special offer"),
    ]
    assert all(not r[2] for r in rows[:6])
    assert rows[6] == ("/ref/3-2", "ref 2", True)

    # 161 chars -> 3 chunks, last chunk 1 char: block "d ref 2" is 7
    # chars (< MIN_BLOCK_CHARS) -> the citation is boilerplate
    short = link_rows(wrap_html_linked("9", "w" * 160 + " d"))
    assert short[6][0] == "/ref/9-2" and short[6][2] is False


def test_heading_outline_hierarchy():
    from pdfspark.kernel.htmlops import heading_outline
    from pdfspark.ops.html import wrap_html_sections

    out = heading_outline(wrap_html_sections("5", "x" * 400))  # 5 chunks
    assert out == [
        (0, 1, "doc 5"),
        (1, 2, "Section 1"),
        (2, 3, "Part 1.1"),
        (3, 3, "Part 1.2"),
        (4, 2, "Section 2"),
        (5, 3, "Part 2.1"),
    ]
