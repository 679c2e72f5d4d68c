"""Entity surface-form normalization — the ONE definition shared by the
Ray pipeline (``pipelines/kg.py``), the pure-Python oracle (``oracle.py``)
and the KB linker (``state/linker.py``).

The canonicalization groupby keys on :func:`canonical_norm`; pipeline ↔
oracle bit-equality and linker keying all depend on these staying in
lock-step, so they live in exactly one module (advisor round 1).
"""

from __future__ import annotations

import hashlib


def canonical_norm(surface: str) -> str:
    """Surface-form normalization key: lowercase, drop possessive ``'s``,
    strip trailing plural ``s`` runs (words longer than 4 chars)."""
    s = surface.lower().strip()
    if s.endswith("'s"):
        s = s[:-2]
    while s.endswith("s") and len(s) > 4:
        s = s[:-1]
    return s


#: The KB linker keys aliases with the same normalization.
surface_norm = canonical_norm


def canonical_id(norm: str) -> str:
    """Stable canonical entity id (PYTHONHASHSEED-independent)."""
    return "e_" + hashlib.blake2b(norm.encode(), digest_size=8).hexdigest()


def nil_id(norm: str) -> str:
    """NIL (unlinkable) entity id — distinct namespace from canonical ids."""
    return "nil_" + hashlib.blake2b(norm.encode(), digest_size=8).hexdigest()
