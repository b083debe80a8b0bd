"""Training-data pipeline operators over the corpus tables.

Each module contributes (queries, oracles) pairs to the driver
contract via register_ops_queries / register_ops_oracles.
"""

from __future__ import annotations

from collections.abc import Callable


def register_ops_queries() -> dict[str, Callable]:
    out: dict[str, Callable] = {}
    from . import (
        ann, curate, dedup, html, multimodal, relational, streaming,
        textstats,
    )

    for mod in (
        dedup, ann, textstats, multimodal, html, curate, relational,
        streaming,
    ):
        out.update(mod.queries())
    return out


def register_ops_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    from . import (
        ann, curate, dedup, html, multimodal, relational, streaming,
        textstats,
    )

    for mod in (
        dedup, ann, textstats, multimodal, html, curate, relational,
        streaming,
    ):
        out.update(mod.oracles())
    return out
