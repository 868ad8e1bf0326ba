"""Union-find (disjoint set) with path compression + union by size.

Used driver-side over the *small* alias-equivalence edge set during
canonicalization (SURVEY.md §2.9 G7) — the explicit replacement for the
reference's equality-probing canonicalization loop
(TypeResolver.java:83-138), which computes the same equivalence classes
implicitly.  The big data never flows through here: only the entity
vocabulary (thousands of ids), produced by a salted two-phase groupby.
"""

from __future__ import annotations


class UnionFind:
    """Keys may be any hashable, mutually-comparable values; the
    canonical pick is ``min()`` under the keys' OWN ordering (ints
    compare numerically — stringifying ids would make 1000150 < 150)."""

    def __init__(self) -> None:
        self.parent: dict = {}
        self.size: dict = {}

    def add(self, x) -> None:
        if x not in self.parent:
            self.parent[x] = x
            self.size[x] = 1

    def find(self, x):
        self.add(x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def components(self) -> dict:
        out: dict = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return out

    def canonical_map(self) -> dict:
        """member → min(component) — the deterministic canonical pick
        (explicit tie-break; the reference relied on findFirst order,
        SURVEY.md §7.4.1)."""
        cmap: dict = {}
        for members in self.components().values():
            canon = min(members)
            for m in members:
                cmap[m] = canon
        return cmap
