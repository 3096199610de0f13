"""Dependency-free shared exception types.

``DocumentError`` carries the reference's HTTP-ish status code through
every layer (per-record import results, auth failures, HTTP envelopes —
``Option<T>`` role, ``include/option.h``). It lives here so stdlib-only
modules (``auth``, ``config``) can use it without importing
``manager``'s numpy/pyarrow stack.
"""

from __future__ import annotations


class DocumentError(ValueError):
    """A per-document failure carrying the reference's HTTP-ish code."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
