"""Entity-kind lattice — the ``TypeManager.getCommonType`` analog (A5).

The reference computes the common supertype of a set of types as the
lowest common ancestor over their ancestor chains
(TypeManager.java:458-596).  Our engine's "types" are entity kinds with
a small fixed hierarchy:

    entity
    ├── agent
    │   ├── person
    │   └── org
    ├── place
    │   ├── city
    │   └── country
    └── inferred

The lattice is dictionary-small and immutable, so the meet runs
driver-side or inside any task with zero state — exactly the SURVEY
§2.5 A5 mapping ("driver-side over small entity taxonomy").
"""

from __future__ import annotations

PARENT: dict[str, str] = {
    "person": "agent",
    "org": "agent",
    "city": "place",
    "country": "place",
    "agent": "entity",
    "place": "entity",
    "inferred": "entity",
}

_PREFIX_KIND = {"P": "person", "O": "org", "C": "city", "K": "country"}


def kind_of(entity_id: str) -> str:
    """Entity kind from the canonical id prefix; inferred ids
    (``inf:<norm>``) and anything unknown fold to 'inferred'."""
    return _PREFIX_KIND.get(entity_id[:1], "inferred")


def ancestors(kind: str) -> list[str]:
    """kind → [kind, parent, …, 'entity'] (the reference's ancestor set,
    TypeManager.java:458)."""
    chain = [kind]
    while chain[-1] in PARENT:
        chain.append(PARENT[chain[-1]])
    return chain


def common_type(a: str, b: str) -> str:
    """Lowest common ancestor of two kinds (getCommonType for a pair)."""
    if a == b:
        return a
    aa = ancestors(a)
    bs = set(ancestors(b))
    for k in aa:
        if k in bs:
            return k
    return "entity"


def common_kind(kinds) -> str:
    """Fold of :func:`common_type` over a kind set — associative, so a
    distributed partial-fold per batch merges exactly (A5's lattice
    meet over all observed member types)."""
    it = iter(sorted(set(kinds)))
    try:
        acc = next(it)
    except StopIteration:
        return "entity"
    for k in it:
        acc = common_type(acc, k)
    return acc
