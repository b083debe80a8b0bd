"""HTML main-content extraction — boilerplate stripping via DOM-free
block heuristics (north rule: "HTML boilerplate strip … DOM
heuristics" alongside the PDF parse).

No HTML parsing library exists in this sandbox (and none is needed):
the classifier below is a block-scoring heuristic in the
Arc90-readability / boilerpipe family, built from public descriptions
of those algorithms — NOT a port of either:

1. drop <script>/<style>/<noscript>/comment subtrees outright;
2. split the document into TEXT BLOCKS at block-level tag boundaries
   (p, div, li, td, h1-6, article, section, nav, header, footer, …);
3. score each block: text length, link density (chars inside <a> /
   total chars), and the enclosing semantic tag;
4. keep content blocks, drop boilerplate: high link density (menus),
   very short blocks (buttons, copyright lines), and blocks whose
   nearest semantic ancestor is nav/header/footer/aside.

The generator (ops/html.py) wraps corpus text in a deterministic page
with genuinely link-heavy nav, a link-heavy sidebar, a short footer
and an <article> of <p> chunks — the stripper must recover exactly
the article text ON MERIT (the oracle reconstructs it from the
documents table; a misclassification breaks the roundtrip).
"""

from __future__ import annotations

import re

# block-level boundaries (HTML5 content categories, public spec)
_BLOCK_TAGS = (
    "p|div|li|ul|ol|td|th|tr|table|h1|h2|h3|h4|h5|h6|article|section|"
    "nav|header|footer|aside|main|blockquote|pre|figure|figcaption|"
    "form|fieldset|dl|dt|dd|body|html"
)
_DROP_SUBTREE_RE = re.compile(
    r"<(script|style|noscript|svg|iframe|head|title)\b.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_SPLIT_RE = re.compile(rf"(</?(?:{_BLOCK_TAGS})\b[^>]*>)", re.IGNORECASE)
_TAG_NAME_RE = re.compile(rf"</?({_BLOCK_TAGS})\b", re.IGNORECASE)
_A_TEXT_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_WS_RUN_RE = re.compile(r"\s+")

# boilerplate containers: anything inside these is dropped regardless
# of its own score (the "DOM heuristic" part — semantic ancestors)
_BOILER_ANCESTORS = frozenset({"nav", "header", "footer", "aside", "form"})

# thresholds (boilerpipe-family defaults, public literature)
MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 8


_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&nbsp;": " "}
_ENTITY_RE = re.compile("|".join(_ENTITIES) + r"|&#x?[0-9a-fA-F]{1,6};")


def _ent(m: re.Match) -> str:
    s = m.group()
    fixed = _ENTITIES.get(s)
    if fixed is not None:
        return fixed
    body = s[2:-1]
    try:
        return chr(int(body[1:], 16) if body[0] in "xX" else int(body))
    except ValueError:
        return s


def _unescape(s: str) -> str:
    return _ENTITY_RE.sub(_ent, s)


def _block_text(fragment: str) -> tuple[str, int]:
    """(visible text, chars-inside-links) for one inter-boundary
    fragment; inline tags (<a>, <b>, <span>…) are stripped in place.

    Fast path (r9): fragments with no '<' — the overwhelming case,
    one per article paragraph — skip both tag regexes outright, and
    '&'-free text skips entity decoding; both are identity rewrites
    there, so the output is unchanged."""
    if "<" not in fragment:
        text = _unescape(fragment) if "&" in fragment else fragment
        return _WS_RUN_RE.sub(" ", text).strip(" "), 0
    linked = sum(
        len(_ANY_TAG_RE.sub("", m)) for m in _A_TEXT_RE.findall(fragment)
    )
    text = _ANY_TAG_RE.sub("", fragment)
    text = _WS_RUN_RE.sub(" ", _unescape(text)).strip(" ")
    return text, linked


def main_content_blocks(html: str) -> list[dict]:
    """Every text block with its features + keep/drop classification.

    Returns dicts: {text, n_chars, n_linked, link_density, ancestor,
    keep} in document order (empty blocks omitted)."""
    html = _DROP_SUBTREE_RE.sub(" ", html)
    parts = _BLOCK_SPLIT_RE.split(html)
    out: list[dict] = []
    stack: list[str] = []
    # r9: the boiler ancestors currently on `stack`, in stack order —
    # len() is the old boiler_depth, [-1] the old reversed-scan
    # `ancestor`; maintained incrementally instead of re-scanning the
    # stack per block
    boiler_stack: list[str] = []
    for part in parts:
        # _TAG_NAME_RE can only match at '<' — skip the regex for
        # plain text fragments (r9; behavior unchanged)
        m = _TAG_NAME_RE.match(part) if part.startswith("<") else None
        if m is not None:  # a block boundary tag
            name = m.group(1).lower()
            if part.startswith("</"):
                # pop to the matching open tag (tolerates misnesting)
                if name in stack:
                    while stack:
                        top = stack.pop()
                        if top in _BOILER_ANCESTORS:
                            boiler_stack.pop()
                        if top == name:
                            break
            elif not part.rstrip(">").endswith("/"):  # ignore <br/>-style
                stack.append(name)
                if name in _BOILER_ANCESTORS:
                    boiler_stack.append(name)
            continue
        text, linked = _block_text(part)
        # a leading stripped-space block boundary leaves '' — skip
        text = text.strip("\n").strip()
        if not text:
            continue
        n = len(text)
        density = linked / n if n else 1.0
        keep = (
            not boiler_stack
            and n >= MIN_BLOCK_CHARS
            and density <= MAX_LINK_DENSITY
        )
        out.append(
            {
                "text": text,
                "n_chars": n,
                "n_linked": linked,
                "link_density": density,
                "ancestor": boiler_stack[-1] if boiler_stack else "",
                "keep": keep,
            }
        )
    return out


def strip_boilerplate(html: str) -> str:
    """Main content of one HTML document: kept blocks joined by \\n."""
    return "\n".join(b["text"] for b in main_content_blocks(html) if b["keep"])


# ---- r7 EXTENSIONS: link-graph + heading-outline projections ------
# Standalone walkers (the r6-green main_content_blocks walk above must
# stay line-identical for the rotated-out driver rows); same split
# regexes, same thresholds, same stack discipline.

_A_HREF_RE = re.compile(
    r'<a\b[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>',
    re.IGNORECASE | re.DOTALL,
)
_H_RE = re.compile(r"<h([1-6])\b[^>]*>(.*?)</h\1\s*>", re.IGNORECASE | re.DOTALL)


def link_rows(html: str) -> list[tuple]:
    """(href, anchor_text, in_main) per <a href=...>, document order.

    in_main applies the SAME block classification the boilerplate
    stripper uses: a link is main-content iff its enclosing text
    block sits outside every boilerplate ancestor, meets
    MIN_BLOCK_CHARS, and the block's link density is within
    MAX_LINK_DENSITY — the outlink-graph projection a web-scale
    pipeline extracts alongside the main text (anchors in kept blocks
    are citation-grade; nav/aside anchors are template edges)."""
    html = _DROP_SUBTREE_RE.sub(" ", html)
    out: list[tuple] = []
    stack: list[str] = []
    boiler_depth = 0
    for part in _BLOCK_SPLIT_RE.split(html):
        m = _TAG_NAME_RE.match(part)
        if m is not None:
            name = m.group(1).lower()
            if part.startswith("</"):
                if name in stack:
                    while stack:
                        top = stack.pop()
                        if top in _BOILER_ANCESTORS:
                            boiler_depth -= 1
                        if top == name:
                            break
            elif not part.rstrip(">").endswith("/"):
                stack.append(name)
                if name in _BOILER_ANCESTORS:
                    boiler_depth += 1
            continue
        links = _A_HREF_RE.findall(part)
        if not links:
            continue
        text, linked = _block_text(part)
        text = text.strip("\n").strip()
        n = len(text)
        density = linked / n if n else 1.0
        keep = (
            boiler_depth == 0
            and n >= MIN_BLOCK_CHARS
            and density <= MAX_LINK_DENSITY
        )
        for href, anchor in links:
            a = _WS_RUN_RE.sub(" ", _unescape(_ANY_TAG_RE.sub("", anchor))).strip()
            out.append((href, a, keep))
    return out


def heading_outline(html: str) -> list[tuple]:
    """(ord, level, title) per <h1>-<h6> in document order — the
    section-hierarchy projection (the HTML analog of the PDF
    /Outlines tree; same row shape as Document.outlines())."""
    html = _DROP_SUBTREE_RE.sub(" ", html)
    out: list[tuple] = []
    for m in _H_RE.finditer(html):
        title = _WS_RUN_RE.sub(
            " ", _unescape(_ANY_TAG_RE.sub("", m.group(2)))
        ).strip()
        if title:
            out.append((len(out), int(m.group(1)), title))
    return out
