"""Surface-form normalization for entity linking.

The reference has no entity-linking stage (its closest analog is the
lowercase label/text normalization at ``evaluate.py:76`` and the
case-insensitive surface matching at ``data/process_nuner.py:22-30``);
the north rule requires mentions to be linked by blocking on
normalized-surface-form hash keys. Every mention produces a small set
of normalization *variants*; mentions sharing any variant belong to the
same canonical entity (connected component over the variant graph).

All functions here are pure and deterministic — the single-threaded
oracle in ``corpus.py`` and the distributed linker in
``stages/linker.py`` call the same code.
"""

from __future__ import annotations

import hashlib
import re

_EDGE_PUNCT = re.compile(r"^[^\w]+|[^\w]+$")
_CAMEL_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile(r"([a-z0-9])([A-Z])")
_SEP = re.compile(r"[-_.\s]+")
_WS = re.compile(r"\s+")


def normalize_primary(text: str) -> str:
    """Lowercase + strip leading/trailing punctuation + collapse spaces."""
    t = _EDGE_PUNCT.sub("", text.strip())
    return _WS.sub(" ", t.lower())


def normalize_ident(text: str) -> str:
    """Code-identifier split: camelCase / snake_case / kebab-case →
    space-joined lowercase words (``HttpClient`` ≡ ``http_client``)."""
    t = _EDGE_PUNCT.sub("", text.strip())
    t = _CAMEL_1.sub(r"\1 \2", t)
    t = _CAMEL_2.sub(r"\1 \2", t)
    t = _SEP.sub(" ", t)
    t = _WS.sub(" ", t.strip().lower())
    # separator collapse can expose new edge punctuation (e.g. control
    # chars next to a stripped '-') — strip once more so the function
    # is idempotent (property-tested)
    return _EDGE_PUNCT.sub("", t)


def variants(text: str) -> list[str]:
    """Ordered, deduplicated normalization variants of a surface form."""
    out: list[str] = []
    for v in (normalize_primary(text), normalize_ident(text)):
        if v and v not in out:
            out.append(v)
    return out


def block_key(variant: str, n_blocks: int = 1 << 16) -> int:
    """Stable hash block for shuffle partitioning (sha1-based so the
    key is identical across processes — Python ``hash()`` is salted)."""
    h = hashlib.sha1(variant.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % n_blocks


def canonical_entity_id(component_variants: set[str]) -> str:
    """Deterministic canonical id: lexicographic min variant."""
    return "ent:" + min(component_variants)
