"""Error taxonomy + four-tier soft-assert policy.

Re-expresses the reference's fault model (SURVEY.md §2.8):
- ``EParseError`` — hard failure, aborts the document
  (reference: ``exception/EParseError.java``).
- Four soft-assert tiers, each gated by a settings flag
  (reference: ``parser/ParserSettings.java:8-12`` defaults,
  ``parser/Diagnostics.java:20-42`` dispatch): a failed soft assert
  either logs-and-continues or raises, per flag.

At Spark scale every hard failure is caught per document inside the
mapInPandas kernel and becomes ``(status='error', error=msg)`` —
PERMISSIVE-mode semantics; a malformed doc never fails a stage.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

log = logging.getLogger("pdfspark.kernel")


class EParseError(Exception):
    """Hard parse failure — aborts the current document only."""


@dataclass
class ParserSettings:
    """Mirrors reference ``parser/ParserSettings.java`` defaults.

    - ignore syntax / structure / non-supported errors = True
    - ignore data-integrity errors = False
    Bounded-scan constants: eofLookupRange=1024 ("Same as Acrobat",
    ``ParserSettings.java:16``), headerLookupRange=100
    (``ParserSettings.java:14-15``), MAX_SCAN_RANGE=100
    (``ParserSettings.java:6``), startxref reverse-scan 100
    (``PDFParser.java:97``).
    """

    ignore_syntax_errors: bool = True
    ignore_structure_errors: bool = True
    ignore_data_integrity_errors: bool = False
    ignore_unsupported_features: bool = True

    eof_lookup_range: int = 1024
    header_lookup_range: int = 100
    startxref_lookup_range: int = 100
    max_scan_range: int = 100
    # reference COSDictionary.dereference() depth guard (COSDictionary.java:102-110)
    max_deref_depth: int = 5
    # opt-in ISO 32000-1 §C.2 table reconstruction for files whose
    # startxref/xref chain is broken or absent. Default False: the
    # reference REQUIRES startxref (PDFParser.java:97-98), and the
    # malformed-corpus contract (no-xref family must fail) depends on it.
    allow_reconstruction: bool = False

    # --- four-tier soft asserts (Diagnostics.java:20-42) -------------
    def soft_syntax(self, cond: bool, msg: str) -> None:
        if not cond:
            if self.ignore_syntax_errors:
                log.debug("syntax: %s", msg)
            else:
                raise EParseError(msg)

    def soft_structure(self, cond: bool, msg: str) -> None:
        if not cond:
            if self.ignore_structure_errors:
                log.debug("structure: %s", msg)
            else:
                raise EParseError(msg)

    def soft_integrity(self, cond: bool, msg: str) -> None:
        # NB: default ignore_data_integrity_errors=False → integrity
        # failures RAISE by default (ParserSettings.java:11).
        if not cond:
            if not self.ignore_data_integrity_errors:
                raise EParseError(msg)
            log.debug("integrity: %s", msg)

    def soft_supported(self, cond: bool, msg: str) -> None:
        if not cond:
            if self.ignore_unsupported_features:
                log.debug("unsupported: %s", msg)
            else:
                raise EParseError(msg)


DEFAULT_SETTINGS = ParserSettings()
