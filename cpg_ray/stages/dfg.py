"""Per-document EOG construction with branches + the flow-sensitive DFG
fixpoint (G1/G2/G3 analogs, SURVEY.md §2.9).

Reference analogs:
- :func:`build_eog` — EvaluationOrderGraphPass building branch-labelled
  evaluation-order edges (EvaluationOrderGraphPass.java:87-130; BRANCH
  property Properties.java:43-49): a run of A/B variant blocks is the
  web analog of an if/else — the preceding mention forks to each arm's
  first mention (``branch`` true/false), arms chain internally, arm
  tails join at the next plain mention.
- constant-condition kill — UnreachableEOGPass (UnreachableEOGPass.kt:
  41-97): when the page *declares* which variant was served
  (``data-chosen``), every edge into/within/out of the other arm is
  flagged ``unreachable=true`` — flagged, never dropped, exactly the
  reference's edge-property semantics.
- :func:`flow_sensitive_dfg` — ControlFlowSensitiveDFGPass
  (ControlFlowSensitiveDFGPass.java:96-310): a per-document pass over
  the live EOG tracking, per "variable" (the last token of a mention's
  normalized name), the set of possible defining mentions; strong
  update on redefinition, set-union at joins.  The reference iterates
  to a fixpoint because functions have loops; a document's EOG is a
  DAG whose edges always point forward in mention order, so one pass
  in mention order IS the fixpoint (noted, not hidden).

Everything here is pure per-document computation invoked inside the
extract ``map_batches`` — no shuffle, no cross-document state.
"""

from __future__ import annotations

# An EOG edge: (src_idx, dst_idx, branch, unreachable) over mention
# indexes; branch/unreachable are None where the property does not apply.
EogEdge = tuple[int, int, bool | None, bool | None]


def build_eog(tags: list[tuple[int, str, bool | None] | None]) -> list[EogEdge]:
    """Branch-aware evaluation-order edges over one document's mentions.

    ``tags[i]`` is None for a plain mention, else ``(group_id, arm_label,
    chosen)`` for a mention inside an A/B variant block: ``group_id``
    groups the arms of one fork, ``chosen`` is True/False when the page
    declares the served arm (None = undeclared, both arms live).

    For an all-plain document this degenerates to the linear chain
    ``0→1→…`` with edges in index order — byte-identical to the
    pre-branch EOG (kg_eog_chains/kg_eog_reach semantics unchanged).
    """
    edges: list[EogEdge] = []
    prev_tails: list[tuple[int, bool | None]] = []  # (idx, unreachable)
    i, n = 0, len(tags)
    while i < n:
        if tags[i] is None:
            for t, unr in prev_tails:
                edges.append((t, i, None, unr))
            prev_tails = [(i, None)]
            i += 1
            continue
        gid = tags[i][0]
        arm_order: list[str] = []
        arms: dict[str, dict] = {}
        while i < n and tags[i] is not None and tags[i][0] == gid:
            _g, label, chosen = tags[i]
            if label not in arms:
                arms[label] = {"idxs": [], "chosen": chosen}
                arm_order.append(label)
            arms[label]["idxs"].append(i)
            i += 1
        fork_tails = prev_tails
        new_tails: list[tuple[int, bool | None]] = []
        for pos, label in enumerate(arm_order):
            info = arms[label]
            dead: bool | None = True if info["chosen"] is False else None
            idxs = info["idxs"]
            # branch property on the fork edge only: first arm = True
            # (the "then" arm), later arms = False (the "else" arm)
            bprop = pos == 0
            for t, unr in fork_tails:
                edges.append((t, idxs[0], bprop, True if (dead or unr) else None))
            for a, b in zip(idxs, idxs[1:]):
                edges.append((a, b, None, dead))
            new_tails.append((idxs[-1], dead))
        prev_tails = new_tails or fork_tails
    return edges


def flow_sensitive_dfg_linear(
    norms: list[str], bare: list[bool]
) -> list[tuple[int, int]]:
    """Fast path of :func:`flow_sensitive_dfg` for FORK-FREE documents
    (the common case — most web pages carry no A/B variant blocks): on
    a linear EOG every step strongly updates, so the per-variable value
    sets are always singletons and the environment-copy machinery
    collapses to last-def tracking.  Equivalence with the general
    fixpoint over ``build_eog([None]*n)`` is property-pinned
    (tests/test_properties.py)."""
    last: dict[str, int] = {}
    out: list[tuple[int, int]] = []
    for i, norm in enumerate(norms):
        toks = norm.split()
        if not toks:
            continue
        key = toks[-1]
        j = last.get(key)
        if bare[i]:
            if j is not None:
                out.append((j, i))
        else:
            if j is not None and norms[j] == norm:
                out.append((j, i))
            last[key] = i
    return out


def flow_sensitive_dfg(
    norms: list[str], bare: list[bool], eog_edges: list[EogEdge]
) -> list[tuple[int, int]]:
    """Flow-sensitive DFG over one document: returns (def_idx, use_idx)
    pairs.

    Semantics (per ControlFlowSensitiveDFGPass's value-set tracking):
    - the "variable" a mention defines/uses is the LAST TOKEN of its
      normalized name (the family/site name — "Alric Ash Wickham" and a
      later bare "Wickham" share the variable ``wickham``);
    - a full mention STRONGLY UPDATES its variable (reassignment kills
      earlier bindings — the refinement naive consecutive-norm chaining
      misses);
    - at a join, the incoming environments union (value SETS, so a use
      after an undeclared A/B fork gets one edge per live arm's def);
    - edges flagged ``unreachable`` do not propagate (dead-arm defs
      never reach a live use — the UnreachableEOGPass → DFG interplay);
    - a full re-mention (same norm) is a use of the defs it matches; a
      bare anaphor (``bare[i]``: single-token surface resolved to a
      multi-token norm) uses EVERY def of its variable and defines
      nothing.
    """
    preds: dict[int, list[int]] = {}
    for s, d, _b, unr in eog_edges:
        if not unr:
            preds.setdefault(d, []).append(s)
    n = len(norms)
    env_out: list[dict[str, frozenset[int]]] = [dict() for _ in range(n)]
    out: list[tuple[int, int]] = []
    for i in range(n):
        env: dict[str, set[int]] = {}
        for p in preds.get(i, ()):
            for k, defs in env_out[p].items():
                env.setdefault(k, set()).update(defs)
        toks = norms[i].split()
        key = toks[-1] if toks else None
        cands = sorted(env.get(key, ())) if key else []
        if bare[i]:
            out.extend((d, i) for d in cands)
            env_out[i] = {k: frozenset(v) for k, v in env.items()}
        else:
            out.extend((d, i) for d in cands if norms[d] == norms[i])
            merged = {k: frozenset(v) for k, v in env.items()}
            if key:
                merged[key] = frozenset((i,))
            env_out[i] = merged
    return out
