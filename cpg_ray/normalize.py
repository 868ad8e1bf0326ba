"""Deterministic normalizers and content-hash IDs.

Reference analogs:
- ``norm_name``: TypeParser.createFrom's deterministic string→Type
  normalization (cpg-core/.../types/TypeParser.java:871-904) and
  ``Util.getSimpleName`` (VariableUsageResolver.java:384) — here a
  surface-form folder (case / whitespace / punctuation).
- ``node_id``: IdentifierPass's sequential ids
  (cpg-analysis/.../IdentifierPass.kt:33-55) replaced by order-free
  content hashes — global counters don't scale and aren't deterministic
  under parallelism (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import hashlib
import re

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)
# Honorifics / corporate suffixes folded away so alias variants of the same
# entity share a norm key ("Dr. Ada Verne" == "ada verne";
# "Acme Labs Inc." == "acme labs").
_STRIP_TOKENS = frozenset(
    {"dr", "mr", "mrs", "ms", "prof", "inc", "ltd", "llc", "gmbh", "corp", "co"}
)


def collapse_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip ends."""
    return _WS.sub(" ", s).strip()


def norm_name(s: str) -> str:
    """Fold a surface form to its normalized key (lowercase, no
    punctuation, honorific/corporate-suffix tokens removed)."""
    s = _PUNCT.sub(" ", s.lower())
    toks = [t for t in s.split() if t not in _STRIP_TOKENS]
    return " ".join(toks)


def content_id(*parts: object) -> str:
    """Deterministic 16-hex content hash id from parts (M4 analog)."""
    h = hashlib.sha1("\x1f".join(str(p) for p in parts).encode("utf-8"))
    return h.hexdigest()[:16]


def char_to_byte_offsets(text: str):
    """Prefix-sum of UTF-8 byte lengths: ``out[i]`` is the byte offset of
    character ``i``; ``out[len(text)]`` is the total byte length.

    Spans in the node/edge/triple tables are UTF-8 byte offsets into the
    extracted text (SARIF Region analog, PhysicalLocation.java:51).

    Vectorized: every UTF-8 character starts at a non-continuation byte
    (top bits != 10), so the char→byte map is one numpy mask over the
    encoded bytes — no per-character Python loop (this was 11% of the
    full-graph extract profile)."""
    import numpy as np

    b = text.encode("utf-8")
    arr = np.frombuffer(b, dtype=np.uint8)
    starts = np.flatnonzero((arr & 0xC0) != 0x80)
    return np.append(starts, len(b)).astype(np.int64)

