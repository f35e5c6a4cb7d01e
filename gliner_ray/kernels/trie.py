"""Token-prefix trie over allowed label strings.

Mirrors the reference ``LabelsTrie``
(``gliner/decoding/trie/python_labels_trie.py:89-143``; C++/Cython twin
``trie.cpp:1-170``): used by the constrained label decoder to restrict
generation to valid label-token prefixes. Here it is a standalone
kernel (per-actor cached index, built once in a scorer actor's
``__init__`` when the decoder stage is enabled).
"""

from __future__ import annotations

from typing import Iterable, Sequence


class LabelsTrie:
    __slots__ = ("_root", "_size")

    def __init__(self, sequences: Iterable[Sequence[int]] = ()):
        self._root: dict = {}
        self._size = 0
        for seq in sequences:
            self.add(seq)

    def add(self, seq: Sequence[int]) -> None:
        node = self._root
        for tok in seq:
            node = node.setdefault(tok, {})
        if not node.get(None):
            node[None] = True  # terminal marker
            self._size += 1

    def get(self, prefix: Sequence[int]) -> list[int]:
        """Allowed next tokens after ``prefix`` (empty list = dead end);
        mirrors the reference's ``get`` contract."""
        node = self._root
        for tok in prefix:
            nxt = node.get(tok)
            if nxt is None:
                return []
            node = nxt
        return [t for t in node if t is not None]

    def is_terminal(self, prefix: Sequence[int]) -> bool:
        node = self._root
        for tok in prefix:
            nxt = node.get(tok)
            if nxt is None:
                return False
            node = nxt
        return bool(node.get(None))

    def remove(self, seq: Sequence[int]) -> bool:
        """Remove one sequence; prune empty branches (reference
        ``remove`` semantics). Returns True if it existed."""
        path = []
        node = self._root
        for tok in seq:
            nxt = node.get(tok)
            if nxt is None:
                return False
            path.append((node, tok))
            node = nxt
        if not node.get(None):
            return False
        del node[None]
        self._size -= 1
        for parent, tok in reversed(path):
            if not parent[tok]:
                del parent[tok]
            else:
                break
        return True

    def __len__(self) -> int:
        return self._size
