"""Entity-linking kernels: union-find over normalization variants.

Mentions sharing any normalization variant (``normalize.variants``)
belong to one canonical entity; the canonical id is the lexicographic
minimum variant of the connected component (``ent:<min variant>``),
fully deterministic.

``link_variant_edges`` is the sequential kernel used by both the
in-oracle linker and, per block, by the distributed linker's
``map_groups`` stage (``stages/linker.py``); cross-block components are
resolved there by iterated min-label propagation (SURVEY.md §7.4
"Union-find across partitions").
"""

from __future__ import annotations

from typing import Iterable


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self):
        self.parent: dict[str, str] = {}
        self.rank: dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p == x:
            return x
        root = self.find(p)
        self.parent[x] = root
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        ra_rank = self.rank.get(ra, 0)
        rb_rank = self.rank.get(rb, 0)
        if ra_rank < rb_rank:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if ra_rank == rb_rank:
            self.rank[ra] = ra_rank + 1


def link_variant_edges(edges: Iterable[tuple[str, str]]) -> dict[str, str]:
    """Union variants pairwise; return variant → canonical entity id.

    ``edges`` are (variant_a, variant_b) pairs (a mention's variant list
    contributes a chain). Singleton variants should be passed as
    ``(v, v)`` self-edges so they appear in the output map.
    """
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # canonical id = min variant per component
    comp_min: dict[str, str] = {}
    for v in list(uf.parent):
        root = uf.find(v)
        cur = comp_min.get(root)
        if cur is None or v < cur:
            comp_min[root] = v
    return {v: "ent:" + comp_min[uf.find(v)] for v in uf.parent}
