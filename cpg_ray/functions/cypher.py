"""Textual openCypher-subset front end over the graph query layer —
the reference parses real query strings against its in-memory graph
(cpg-core graph/Graph.kt:86-167 ``executeQuery``: MATCH node/relation
chains, WHERE comparisons on reflective properties, RETURN ... LIMIT);
this module gives the same string surface over the materialized
nodes/edges tables, compiling to the ALREADY-TESTED library operators
(label_filter / prop_filter / rel_chain / topk) instead of a bespoke
executor — the query text is a thin veneer, the distributed semantics
live in one place.

Grammar (case-insensitive keywords)::

    MATCH (a[:Label] [{prop: lit, ...}]) [-[:ETYPE[*lo..hi]]-> (b[:Label])]...
      (chains of fixed-length hops compile to chained hash joins;
       each hop may also point LEFT: (a)<-[:ETYPE]-(b) matches edges
       b→a — direction resolved at compile time by swapping the edge
       ends, the Graph.kt:129-143 INCOMING analog.  An UNDIRECTED hop
       (a)-[:ETYPE]-(b) matches each physical edge in either
       orientation — one row per orientation, self-loops once —
       compiled as the union of the two oriented chains; this EXCEEDS
       the reference, whose BOTH resolution is a TODO (Graph.kt:139).
       Double-headed arrows <-[..]-> and undirected variable-length
       hops still raise.)
    [WHERE a.prop OP literal [AND ...]]
      (filters the base bindings; placed BEFORE any OPTIONAL MATCH —
       openCypher scopes a WHERE that follows OPTIONAL MATCH to the
       optional clause, which we don't implement, so that position
       raises rather than silently filtering base rows.)
    [OPTIONAL MATCH (x)-[:ETYPE]->(y:Label)]
      (x must be bound by the base pattern, y is new and null on miss
       — a left-outer extension of the base bindings with the optional
       hop; either direction; fixed single hop; this EXCEEDS the
       reference, whose executeQuery has no OPTIONAL.  Intra-document
       etypes (AST/EOG/DFG/DFG2/TRIPLE) co-locate by hash(url) and
       merge group-locally — one exchange; cross-document etypes pay
       the global left-outer hash join.  WHERE may reference base
       variables only.)
    RETURN a.prop [AS alias] [, ...] | a | count(a)
    [ORDER BY expr [DESC]] [LIMIT k]

OP ∈ ``= <> < <= > >=``.  Literals: single-quoted strings, ints,
floats, true/false.  ``*lo..hi`` variable-length hops compile onto the
per-document BFS (`graphquery.var_length_reach`) in its FULL mode —
BFS from every node, one row per distinct (src, dst, hops) walk length
in [lo, hi], the recursive-CTE closure semantics — exposing ``hops``
(single-hop patterns only); fixed-length chains of any length compile
to one `rel_chain` segment per hop joined on the shared variable's
node id (hops materialize between joins so two live join stages never
double the aggregator-actor demand — the measured small-cluster hang).

Each pattern variable exposes ``id``, ``name`` and ``url`` column
properties in WHERE/RETURN; single-node patterns expose the full node
schema (``_NODE_PROPS``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

_NODE = re.compile(
    r"\(\s*(?P<var>\w+)\s*(?::\s*(?P<label>\w+))?\s*"
    r"(?P<props>\{[^}]*\})?\s*\)"
)
_REL = re.compile(
    r"(?P<larr><)?\s*-\s*\[\s*:\s*(?P<etype>\w+)\s*"
    r"(?:\*\s*(?P<lo>\d+)\s*\.\.\s*(?P<hi>\d+))?\s*\]\s*-\s*(?P<rarr>>)?"
)
_COND = re.compile(
    r"(?P<var>\w+)\.(?P<prop>\w+)\s*(?P<op>=|<>|<=|>=|<|>)\s*"
    r"(?P<lit>'[^']*'|true|false|-?\d+\.\d+|-?\d+)",
    re.IGNORECASE,
)
_RET_ITEM = re.compile(
    r"(?:(?P<fn>count|sum|min|max|avg)\s*\(\s*"
    r"(?P<avar>\w+)(?:\.(?P<aprop>\w+))?\s*\)|"
    r"(?P<var>\w+)(?:\.(?P<prop>\w+))?)"
    r"(?:\s+AS\s+(?P<alias>\w+))?\s*$",
    re.IGNORECASE,
)


def _literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    return float(tok) if "." in tok else int(tok)


@dataclass
class _Query:
    nodes: list  # [(var, label, props_dict)]
    rels: list  # [(etype, (lo, hi) | None, rev)] — one entry per hop;
    # rev=True is an INCOMING arrow (edge runs right-node → left-node)
    conds: list = field(default_factory=list)  # [(var, prop, op, lit)]
    returns: list = field(default_factory=list)  # [(kind, var, prop, alias)]
    order_by: list = field(default_factory=list)  # [(colname, desc)]
    limit: int | None = None
    # OPTIONAL MATCH (x)-[:E]->(y:Label): (x_var, etype, rev, y_var,
    # y_label) — x already bound by the base pattern, y null on miss
    opt: tuple | None = None

    @property
    def etype(self):  # single-hop convenience
        return self.rels[0][0] if self.rels else None

    @property
    def hops(self):
        return self.rels[0][1] if self.rels else None

    @property
    def rev(self):
        return self.rels[0][2] if self.rels else False


_PROP_PAIR = re.compile(
    r"\s*(?P<key>\w+)\s*:\s*"
    r"(?P<lit>'[^']*'|true|false|-?\d+\.\d+|-?\d+)\s*(?:,\s*|$)",
    re.IGNORECASE,
)


def _parse_props(txt: str | None) -> dict:
    """Inline property map ``{k: lit, ...}`` → dict.  Tokenized
    positionally (key/literal pairs matched left-to-right, literal
    first so a string containing ':' or ',' parses as its value, not
    as separators) and TOTAL: any unconsumed residue raises — the
    parser's 'never a silent guess' contract."""
    if not txt:
        return {}
    inner = txt[1:-1].strip()
    out, pos = {}, 0
    while pos < len(inner):
        m = _PROP_PAIR.match(inner, pos)
        if not m:
            raise ValueError(
                f"unsupported property map near {inner[pos:]!r} in {txt!r}"
            )
        out[m.group("key")] = _literal(m.group("lit"))
        pos = m.end()
    return out


def parse(query: str) -> _Query:
    """Parse the supported openCypher subset; raises ValueError with the
    offending clause on anything outside it (never a silent guess)."""
    q = re.sub(r"\s+", " ", query.strip())
    m = re.match(r"MATCH (?P<pat>.+?)"
                 r"(?: WHERE (?P<where>.+?))?"
                 r"(?: OPTIONAL MATCH (?P<opt>.+?))?"
                 r"(?: WHERE (?P<where2>.+?))?"
                 r" RETURN (?P<ret>.+?)"
                 r"(?: ORDER BY (?P<order>.+?))?"
                 r"(?: LIMIT (?P<limit>\d+))?$", q, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported query shape: {query!r}")
    if m.group("opt") and m.group("where2"):
        # openCypher scopes a WHERE that FOLLOWS an OPTIONAL MATCH to
        # the optional clause (a false predicate keeps the base row
        # with null y) — we don't implement per-hop predicates, and
        # silently applying it to the base would filter out rows a
        # real Cypher engine keeps.  Fail loudly with the fix.
        raise ValueError(
            "WHERE after OPTIONAL MATCH scopes to the optional clause "
            "in openCypher, which is not supported — place WHERE "
            "between MATCH and OPTIONAL MATCH to filter the base "
            "bindings")
    if not m.group("opt") and m.group("where2"):
        # without OPTIONAL the two positions are the same clause; the
        # regex puts a sole WHERE in group 'where' already, so where2
        # here means a double WHERE
        raise ValueError("duplicate WHERE clause")

    pat = m.group("pat").strip()
    nodes, rels = [], []
    nm = _NODE.match(pat)
    if not nm:
        raise ValueError(f"unsupported MATCH pattern: {pat!r}")
    nodes.append((nm.group("var"), nm.group("label"),
                  _parse_props(nm.group("props"))))
    rest = pat[nm.end():].strip()
    while rest:  # (a)-[:X]->(b)-[:Y]->(c)… — arbitrary chain length
        rm = _REL.match(rest)
        if not rm:
            raise ValueError(f"unsupported relationship pattern: {rest!r}")
        hops = None
        if rm.group("lo") is not None:
            hops = (int(rm.group("lo")), int(rm.group("hi")))
            if hops[0] < 1 or hops[1] < hops[0]:
                raise ValueError(f"bad hop range *{hops[0]}..{hops[1]}")
        larr, rarr = rm.group("larr"), rm.group("rarr")
        if larr and rarr:
            # the reference leaves BOTH unresolved too (Graph.kt:139 TODO)
            raise ValueError("double-headed relationship <-[..]-> "
                             "(direction BOTH) is not supported")
        if not larr and not rarr:
            # undirected -[..]-: matches the physical edge in EITHER
            # orientation (one binding per orientation; a self-loop
            # binds once) — this EXCEEDS the reference, whose BOTH
            # resolution is a TODO (Graph.kt:139)
            if hops is not None:
                raise ValueError("undirected variable-length hops "
                                 "-[:X*lo..hi]- are not supported")
            rels.append((rm.group("etype"), hops, "both"))
        else:
            rels.append((rm.group("etype"), hops, bool(larr)))
        rest = rest[rm.end():].strip()
        nm2 = _NODE.match(rest)
        if not nm2:
            raise ValueError(f"unsupported MATCH tail: {rest!r}")
        nodes.append((nm2.group("var"), nm2.group("label"),
                      _parse_props(nm2.group("props"))))
        rest = rest[nm2.end():].strip()
    if len({v for v, _l, _p in nodes}) != len(nodes):
        raise ValueError("pattern variables must be distinct")

    out = _Query(nodes=nodes, rels=rels)

    if m.group("opt"):
        op = m.group("opt").strip()
        onm = _NODE.match(op)
        if not onm:
            raise ValueError(f"unsupported OPTIONAL MATCH pattern: {op!r}")
        xvar = onm.group("var")
        if onm.group("label") or onm.group("props"):
            raise ValueError("OPTIONAL MATCH anchor must be a bare "
                             "re-reference, e.g. (a)")
        if xvar not in {v for v, _l, _p in nodes}:
            raise ValueError(f"OPTIONAL MATCH anchor {xvar!r} is not "
                             "bound by the base pattern")
        rest_o = op[onm.end():].strip()
        orm = _REL.match(rest_o)
        if not orm:
            raise ValueError(f"unsupported OPTIONAL MATCH hop: {rest_o!r}")
        if orm.group("lo") is not None:
            raise ValueError("variable-length OPTIONAL MATCH hops are "
                             "not supported")
        olarr, orarr = orm.group("larr"), orm.group("rarr")
        if bool(olarr) == bool(orarr):
            raise ValueError("OPTIONAL MATCH hops must be directed "
                             "(-[:X]-> or <-[:X]-)")
        rest_o = rest_o[orm.end():].strip()
        onm2 = _NODE.match(rest_o)
        if not onm2 or rest_o[onm2.end():].strip():
            raise ValueError(f"unsupported OPTIONAL MATCH tail: {rest_o!r}")
        yvar = onm2.group("var")
        if yvar in {v for v, _l, _p in nodes} or yvar == xvar:
            raise ValueError(f"OPTIONAL MATCH variable {yvar!r} must be "
                             "new")
        if not onm2.group("label"):
            raise ValueError("OPTIONAL MATCH target needs a label")
        if onm2.group("props"):
            raise ValueError("inline props on the OPTIONAL MATCH target "
                             "are not supported")
        out.opt = (xvar, orm.group("etype"), bool(olarr), yvar,
                   onm2.group("label"))

    if m.group("where"):
        for clause in re.split(r"\s+AND\s+", m.group("where"),
                               flags=re.IGNORECASE):
            cm = _COND.fullmatch(clause.strip())
            if not cm:
                raise ValueError(f"unsupported WHERE clause: {clause!r}")
            out.conds.append((cm.group("var"), cm.group("prop"),
                              cm.group("op"), _literal(cm.group("lit"))))

    for item in m.group("ret").split(","):
        rm = _RET_ITEM.match(item.strip())
        if not rm:
            raise ValueError(f"unsupported RETURN item: {item!r}")
        if rm.group("fn"):
            fn = rm.group("fn").lower()
            out.returns.append(
                ("agg", fn, rm.group("avar"), rm.group("aprop"),
                 rm.group("alias") or fn)
            )
        else:
            out.returns.append(("col", None, rm.group("var"),
                                rm.group("prop"), rm.group("alias")))

    if m.group("order"):
        for item in m.group("order").split(","):
            toks = item.strip().split()
            desc = len(toks) > 1 and toks[-1].upper() == "DESC"
            out.order_by.append((toks[0], desc))
    if m.group("limit"):
        out.limit = int(m.group("limit"))
    return out


_OPS = {
    "=": lambda s, v: s == v,
    "<>": lambda s, v: s != v,
    "<": lambda s, v: s < v,
    "<=": lambda s, v: s <= v,
    ">": lambda s, v: s > v,
    ">=": lambda s, v: s >= v,
}

# node-table column for each queryable property (the reference resolves
# properties reflectively, Graph.kt:400-451 — our schema is explicit)
_NODE_PROPS = ("node_id", "label", "name", "norm_name", "url",
               "span_start", "span_end", "is_inferred", "literal")


def _arrow_type(t):
    """Best-effort Arrow type for a Ray Schema entry (arrow DataType
    for arrow blocks, numpy dtype for pandas blocks; object → string,
    the only object columns in the query layer are strings)."""
    import numpy as _np
    import pyarrow as _pa

    if isinstance(t, _pa.DataType):
        return t
    try:
        return _pa.from_numpy_dtype(_np.dtype(t))
    except (TypeError, ValueError, _pa.ArrowNotImplementedError):
        return _pa.string()


def _optional_hop_driver(base_ds, nodes_ds, edges_ds, *, base_cols,
                         x_col, etype, ylabel, xs, ys, y_id, y_name,
                         limit):
    """Driver fast path for the intra-document optional hop: stream
    the (already column-pruned, etype/label-filtered) sides to the
    driver under a row guard and do the two merges in pandas.  Raises
    GuardExceeded once any side exceeds ``limit`` streamed rows, at
    which point the bucketed exchange takes over — the graphalgo
    mode='auto' pattern."""
    from .graphquery import label_filter
    from .relational import GuardExceeded

    def collect(ds, name) -> pd.DataFrame:
        parts, total = [], 0
        for b in ds.iter_batches(batch_format="pandas",
                                 batch_size=None):
            parts.append(b)
            total += len(b)
            if total > limit:
                raise GuardExceeded(
                    f"optional-hop driver path: > {limit} {name} rows; "
                    "degrading to the bucketed exchange")
        return (pd.concat(parts, ignore_index=True) if parts
                else pd.DataFrame())

    import pyarrow as _pa
    import pyarrow.compute as _pc

    # edge and target-node projections share one (a, b, part) schema
    # so ONE union + ONE Dataset execution collects both — each
    # execution pays ~1 s of fixed streaming-executor spin-up even on
    # materialized inputs, so executions, not rows, dominate here
    def prj_e(t: _pa.Table) -> _pa.Table:
        t = t.filter(_pc.equal(t["etype"], _pa.scalar(etype)))
        return _pa.table({
            "a": t[f"{xs}_id"], "b": t[f"{ys}_id"],
            "part": _pa.array(["e"] * len(t), type=_pa.string())})

    def prj_n(t: _pa.Table) -> _pa.Table:
        return _pa.table({
            "a": t["node_id"], "b": t["name"],
            "part": _pa.array(["n"] * len(t), type=_pa.string())})

    hop_side = edges_ds.map_batches(prj_e, batch_format="pyarrow").union(
        label_filter(nodes_ds, ylabel).map_batches(
            prj_n, batch_format="pyarrow"))

    b = collect(base_ds, "base")
    en = collect(hop_side, "edge/node")
    if not len(b):
        b = pd.DataFrame({c: pd.Series([], dtype=object)
                          for c in base_cols})
    if not len(en):
        en = pd.DataFrame({c: pd.Series([], dtype=object)
                           for c in ("a", "b", "part")})
    e = en[en["part"] == "e"].rename(
        columns={"a": "__e_x", "b": "__e_y"})
    n = en[en["part"] == "n"].rename(
        columns={"a": "__n_id", "b": "__n_name"})
    hop = e[["__e_x", "__e_y"]].merge(
        n[["__n_id", "__n_name"]], left_on="__e_y", right_on="__n_id")
    out = b[list(base_cols)].merge(
        hop[["__e_x", "__n_id", "__n_name"]],
        left_on=x_col, right_on="__e_x", how="left",
    ).drop(columns=["__e_x"]).rename(
        columns={"__n_id": y_id, "__n_name": y_name})

    import ray.data as _rd

    return _rd.from_pandas(out)


def _optional_hop_local(base_ds, nodes_ds, edges_ds, *, base_cols,
                        x_col, etype, ylabel, xs, ys, yv,
                        mode: str = "auto",
                        driver_row_limit: int = 5_000_000):
    """Left-extend base bindings with an INTRA-DOCUMENT optional hop,
    group-locally: base rows, ``etype`` edges and ``ylabel`` target
    nodes are stamped with hash(url) % n_buckets and co-grouped, then
    each bucket merges edge→target and left-merges the base in plain
    pandas — ONE all-to-all exchange instead of the general path's
    three global hash joins (rel_chain's two + the left-outer join).
    Correct ONLY for etypes in graphquery.INTRA_DOC_ETYPES: the hop's
    edge and target node carry the anchor's url by construction
    (SURVEY G1), so every potential match lands in the anchor's
    bucket.  Node ids are globally unique, so the in-bucket merges
    join on ids alone — the bucket is a co-location unit, not a key.

    ``mode='auto'`` first tries a guarded driver merge (the graphalgo
    small-graph idiom: Ray's sort exchange has a ~2 s fixed cost that
    dwarfs a sub-guard pandas merge; GuardExceeded past
    ``driver_row_limit`` streamed rows degrades to the bucketed
    exchange); ``mode='bucketed'`` forces the distributed path.

    Returns a Dataset with ``base_cols`` + ``{yv}__id``/``{yv}__name``
    (null on miss), the same schema as the global left-outer path."""
    import zlib

    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .graphquery import label_filter
    from .relational import GuardExceeded, default_n_buckets

    y_id, y_name = f"{yv}__id", f"{yv}__name"

    if mode == "auto":
        try:
            return _optional_hop_driver(
                base_ds, nodes_ds, edges_ds, base_cols=base_cols,
                x_col=x_col, etype=etype, ylabel=ylabel, xs=xs, ys=ys,
                y_id=y_id, y_name=y_name, limit=driver_row_limit)
        except GuardExceeded:
            pass
    elif mode != "bucketed":
        raise ValueError(f"unknown mode {mode!r}")

    nb = default_n_buckets()
    sch = base_ds.schema()
    if sch is None:  # empty base: nothing to extend
        def null_y(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b[f"{yv}__id"] = None
            b[f"{yv}__name"] = None
            return b

        return base_ds.map_batches(null_y, batch_format="pandas")
    btypes = dict(zip(sch.names, [_arrow_type(t) for t in sch.types]))
    extra = ("__e_x", "__e_y", "__n_id", "__n_name")
    fields = [(c, btypes[c]) for c in base_cols]
    fields += [(c, _pa.string()) for c in extra]

    def _bucket(urls) -> _pa.Array:
        return _pa.array(
            [zlib.crc32(u.encode()) % nb for u in urls.to_pylist()],
            type=_pa.int32(),
        )

    def pad(t: _pa.Table, part: str, mapping: dict) -> _pa.Table:
        n = len(t)
        cols = {}
        for c, typ in fields:
            src = mapping.get(c)
            cols[c] = (t[c] if src == "=" else
                       t[src] if src else _pa.nulls(n, typ))
        cols["__part"] = _pa.array([part] * n, type=_pa.string())
        usrc = mapping.get("url")
        cols["__bucket"] = _bucket(t["url" if usrc in ("=", None)
                                     else usrc])
        return _pa.table(cols)

    b_map = {c: "=" for c in base_cols}
    base = base_ds.map_batches(
        lambda t: pad(t, "b", b_map), batch_format="pyarrow")
    e_map = {"url": "url", "__e_x": f"{xs}_id", "__e_y": f"{ys}_id"}
    hop_e = edges_ds.map_batches(
        lambda t: pad(
            t.filter(_pc.equal(t["etype"], _pa.scalar(etype))),
            "e", e_map),
        batch_format="pyarrow")
    n_map = {"url": "url", "__n_id": "node_id", "__n_name": "name"}
    hop_n = label_filter(nodes_ds, ylabel).map_batches(
        lambda t: pad(t, "n", n_map), batch_format="pyarrow")

    def extend(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["__part"] == "b"]
        e = g[g["__part"] == "e"]
        n = g[g["__part"] == "n"]
        hop = e[["__e_x", "__e_y"]].merge(
            n[["__n_id", "__n_name"]],
            left_on="__e_y", right_on="__n_id")
        out = b[list(base_cols)].merge(
            hop[["__e_x", "__n_id", "__n_name"]],
            left_on=x_col, right_on="__e_x", how="left")
        return out.drop(columns=["__e_x"]).rename(
            columns={"__n_id": y_id, "__n_name": y_name})

    return (base.union(hop_e, hop_n)
            .groupby("__bucket")
            .map_groups(extend, batch_format="pandas"))


def run_cypher(query: str, nodes_ds, edges_ds=None, *,
               colocate: str = "auto") -> pd.DataFrame:
    """Execute a textual query against the graph tables.  Single-node
    patterns need only ``nodes_ds``; relationship patterns also need
    ``edges_ds``.  Compiles to label_filter / rel_chain /vectorized
    filters + the top-k/limit operators; returns pandas.

    ``colocate`` governs how an OPTIONAL MATCH hop is joined when its
    etype is intra-document (graphquery.INTRA_DOC_ETYPES — AST/EOG/
    DFG/DFG2/TRIPLE never cross url boundaries, SURVEY G1): ``auto``
    co-locates base bindings + edges + target nodes by url — a
    guarded driver merge under 5M streamed rows, past that ONE
    hash(url)-bucketed all-to-all — instead of the three global hash
    joins of the general path; ``never`` forces the global left-outer
    hash join; ``always`` forces the co-located path for a custom
    intra-doc etype; ``bucketed`` forces the distributed bucketed
    exchange (no driver merge).  All paths are semantically identical
    (pinned by a mode-equivalence test)."""
    from .graphquery import label_filter, rel_chain

    plan = parse(query)

    if plan.etype is None:
        (var, label, props), = plan.nodes
        ds = label_filter(nodes_ds, label) if label else nodes_ds

        def col(v, p):
            if v != var:
                raise ValueError(f"unknown variable {v!r}")
            # every pattern variable exposes `id` (docstring contract);
            # the node table spells it node_id
            return "node_id" if p == "id" else p
    else:
        if edges_ds is None:
            raise ValueError("relationship pattern needs edges_ds")
        vars_ = [v for v, _l, _p in plan.nodes]
        labels = [l for _v, l, _p in plan.nodes]
        if not all(labels):
            raise ValueError("relationship patterns need labels on all ends")
        if any(h is not None for _e, h, _r in plan.rels) and len(plan.rels) > 1:
            raise ValueError(
                "variable-length hops only supported in single-hop patterns"
            )
        for _v, _l, pmap in plan.nodes:
            for p, v in pmap.items():
                plan.conds.append((_v, p, "=", v))
        if len(plan.rels) > 1:
            # multi-hop chain: one rel_chain segment per hop, renamed to
            # variable-scoped columns, then chained hash joins on the
            # shared variable's node id (ids are globally unique, so the
            # join key alone co-locates; url is kept from segment 0)
            import pyarrow as _pa

            import ray as _ray

            from .relational import hash_join as _hash_join

            cpus = int(_ray.cluster_resources().get("CPU", 2))
            nparts = max(2, cpus)
            ds = None
            for i, (etype, _h, rev) in enumerate(plan.rels):
                va, vb = vars_[i], vars_[i + 1]
                first = i == 0

                def ren(t, va=va, vb=vb, first=first, rev=rev,
                        drop_loops=False):
                    import pyarrow.compute as _pc
                    if drop_loops:
                        t = t.filter(
                            _pc.not_equal(t["src_id"], t["dst_id"]))
                    sa, sb = ("dst", "src") if rev else ("src", "dst")
                    cols = {f"{vb}__id": t[f"{sb}_id"],
                            f"{vb}__name": t[f"{sb}_name"]}
                    cols[f"{va}__id"] = t[f"{sa}_id"]
                    if first:  # later segments drop duplicate columns
                        cols[f"{va}__name"] = t[f"{sa}_name"]
                        cols["url"] = t["url"]
                    return _pa.table(cols)

                if rev == "both":
                    # undirected hop inside a chain: union of both
                    # oriented segments (reverse branch drops
                    # self-loops — same binding, appears once)
                    import functools as _ft

                    # materialize each branch before the union (same
                    # live-join-stage budget as the single-hop case)
                    f = rel_chain(
                        nodes_ds, edges_ds, etype=etype,
                        src_label=labels[i], dst_label=labels[i + 1],
                    ).map_batches(
                        _ft.partial(ren, rev=False),
                        batch_format="pyarrow").materialize()
                    b = rel_chain(
                        nodes_ds, edges_ds, etype=etype,
                        src_label=labels[i + 1], dst_label=labels[i],
                    ).map_batches(
                        _ft.partial(ren, rev=True, drop_loops=True),
                        batch_format="pyarrow").materialize()
                    seg = f.union(b)
                else:
                    # an INCOMING hop matches the physical edge
                    # right→left: swap which pattern variable sits on
                    # each edge end
                    sl, dl = ((labels[i + 1], labels[i]) if rev
                              else (labels[i], labels[i + 1]))
                    seg = rel_chain(nodes_ds, edges_ds, etype=etype,
                                    src_label=sl, dst_label=dl
                                    ).map_batches(
                        ren, batch_format="pyarrow")
                if ds is None:
                    ds = seg
                else:
                    # materialize between hops: two live join stages
                    # need 2×num_partitions aggregator actors at once,
                    # which starves small clusters into the measured
                    # join hang — completing hop k releases its actors
                    # before hop k+1 schedules
                    ds = _hash_join(
                        ds.materialize(), seg, on=f"{va}__id",
                        num_partitions=nparts, empty_safe=True,
                    )

            def col(v, p):
                if v not in vars_:
                    raise ValueError(f"unknown variable {v!r}")
                if p in ("id", "node_id"):
                    return f"{v}__id"
                if p == "name":
                    return f"{v}__name"
                if p == "url":
                    return "url"
                raise ValueError(
                    f"property {p!r} not projected by chain match "
                    "(available: id, name, url)"
                )
        elif plan.hops is None:
            (v1, l1, _p1), (v2, l2, _p2) = plan.nodes
            if plan.rev == "both":
                # undirected (a)-[:X]-(b): each physical edge matches
                # in either orientation — union of the forward chain
                # and the swapped reverse chain, normalized so src_* is
                # always the LEFT variable.  The reverse branch drops
                # self-loops: both orientations of u→u are the SAME
                # binding and must appear once (openCypher semantics).
                import pyarrow as _pa
                import pyarrow.compute as _pc

                _COLS = ["src_id", "src_name", "dst_id", "dst_name",
                         "url"]

                def fwd_norm(t):
                    return t.select(_COLS)

                def swap_norm(t):
                    keep = t.filter(
                        _pc.not_equal(t["src_id"], t["dst_id"]))
                    return _pa.table({
                        "src_id": keep["dst_id"],
                        "src_name": keep["dst_name"],
                        "dst_id": keep["src_id"],
                        "dst_name": keep["src_name"],
                        "url": keep["url"]})

                # materialize each oriented branch before the union:
                # a lazy union would run BOTH branches' hash joins in
                # one live topology — 4 concurrent join stages starve
                # the aggregator actors on small clusters (the
                # measured join hang; see the multi-hop chain note)
                fwd = rel_chain(
                    nodes_ds, edges_ds, etype=plan.etype,
                    src_label=l1, dst_label=l2,
                ).map_batches(fwd_norm,
                              batch_format="pyarrow").materialize()
                bwd = rel_chain(
                    nodes_ds, edges_ds, etype=plan.etype,
                    src_label=l2, dst_label=l1,
                ).map_batches(swap_norm,
                              batch_format="pyarrow").materialize()
                ds = fwd.union(bwd)
            else:
                if plan.rev:  # (a)<-[:X]-(b): physical edge is b → a
                    l1, l2 = l2, l1
                ds = rel_chain(nodes_ds, edges_ds, etype=plan.etype,
                               src_label=l1, dst_label=l2)
        else:
            (v1, l1, _p1), (v2, l2, _p2) = plan.nodes
            if plan.rev:
                l1, l2 = l2, l1
            # variable-length *lo..hi → per-document BFS reach in FULL
            # mode (every source node, every distinct (src,dst,hops)
            # walk length — the faithful openCypher/recursive-CTE
            # semantics; the roots-only default of var_length_reach is
            # a different, provenance-flavored view), then the same two
            # label joins as rel_chain
            from .graphquery import label_filter, var_length_reach
            from .relational import hash_join

            lo, hi = plan.hops
            reach = var_length_reach(edges_ds, etype=plan.etype,
                                     max_hops=hi, from_roots=False,
                                     shortest_only=False)
            if lo > 1:
                reach = reach.map_batches(
                    lambda b: b[b.hops >= lo], batch_format="pandas"
                )
            src = label_filter(nodes_ds, l1).map_batches(
                lambda t: t.select(["node_id", "name"]).rename_columns(
                    ["src_id", "src_name"]
                ),
                batch_format="pyarrow",
            )
            dst = label_filter(nodes_ds, l2).map_batches(
                lambda t: t.select(["node_id", "name"]).rename_columns(
                    ["dst_id", "dst_name"]
                ),
                batch_format="pyarrow",
            )
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 2))
            nparts = max(2, cpus)
            ds = hash_join(
                hash_join(reach, src, on="src_id",
                          num_partitions=nparts, empty_safe=True),
                dst, on="dst_id", num_partitions=nparts, empty_safe=True,
            )
        if len(plan.rels) == 1:
            def col(v, p):
                # rel_chain exposes src_id/src_name/dst_id/dst_name/url
                # (+ hops for variable-length matches)
                if p == "hops" and plan.hops is not None:
                    return "hops"
                # "both" hops are normalized to forward orientation
                side = ({v1: "dst", v2: "src"} if plan.rev is True
                        else {v1: "src", v2: "dst"}).get(v)
                if side is None:
                    raise ValueError(f"unknown variable {v!r}")
                if p in ("id", "node_id"):
                    return f"{side}_id"
                if p == "name":
                    return f"{side}_name"
                if p == "url":
                    return "url"
                raise ValueError(
                    f"property {p!r} not projected by relationship match "
                    "(available: id, name, url"
                    + (", hops" if plan.hops is not None else "") + ")"
                )

    if plan.etype is None and props:
        for p, v in props.items():
            plan.conds.append((plan.nodes[0][0], p, "=", v))

    opt_var = None
    if plan.opt:
        for v, _p, _op2, _lit in plan.conds:
            if v == plan.opt[3]:  # the optional (y) variable
                raise ValueError("WHERE may not reference OPTIONAL "
                                 "MATCH variables")

    # resolve every referenced column EAGERLY (unknown props fail fast,
    # not inside a remote task); WHERE references base variables only,
    # so conds resolve with the BASE col mapping even under OPTIONAL
    conds = [(col(v, p), op, lit) for v, p, op, lit in plan.conds]
    if plan.etype is None:
        for c, _op, _lit in conds:
            if c not in _NODE_PROPS:
                raise ValueError(f"unknown property {c!r}")

    # WHERE: vectorized per-batch filters on the Dataset — rows are
    # pruned distributed, the driver only ever sees the result set
    # (and under OPTIONAL MATCH the filter runs BEFORE the left join,
    # so only surviving base bindings pay the join)
    if conds:
        def keep(b: pd.DataFrame) -> pd.DataFrame:
            for c, op, lit in conds:
                b = b[_OPS[op](b[c], lit)]
            return b

        ds = ds.map_batches(keep, batch_format="pandas")

    if plan.opt:
        # OPTIONAL MATCH (x)-[:E]->(y:L): left-outer join the filtered
        # base bindings with the optional hop on x's node id — y
        # columns null on miss (openCypher semantics)
        from .graphquery import rel_chain as _rc
        from .relational import hash_join as _hj

        xv, oetype, orev, yv, ylabel = plan.opt
        opt_var = yv
        if edges_ds is None:
            raise ValueError("OPTIONAL MATCH needs edges_ds")
        xlabel = {v: l for v, l, _p in plan.nodes}[xv]
        if xlabel is None:
            raise ValueError("OPTIONAL MATCH anchor needs a labeled "
                             "base node")
        from .graphquery import INTRA_DOC_ETYPES
        if colocate not in ("auto", "always", "never", "bucketed"):
            raise ValueError(f"unknown colocate mode {colocate!r}")
        # the bucketed path routes the hop through the base row's url,
        # which is the anchor's url only when every base hop is itself
        # intra-document (segment 0's url == every variable's url)
        base_intra = all(e in INTRA_DOC_ETYPES for e, _h, _r in plan.rels)
        use_local = colocate in ("always", "bucketed") or (
            colocate == "auto" and oetype in INTRA_DOC_ETYPES
            and base_intra)
        # project the base to the columns the query references — the
        # join ships less, and untouched all-null columns (Arrow type
        # `null`) would crash pyarrow's join as non-key fields
        needed = {col(xv, "id")}
        if use_local:
            needed.add("url")
        for v, p, _op2, _lit in plan.conds:
            needed.add(col(v, p))
        for kind, _fn, v, p, _alias in plan.returns:
            if v != yv:
                needed.add(col(v, p) if p is not None else (
                    col(v, "node_id") if plan.etype else "node_id"))
        base_cols = sorted(needed)
        ds = ds.map_batches(lambda b: b[base_cols],
                            batch_format="pandas")

        sl, dl = (ylabel, xlabel) if orev else (xlabel, ylabel)
        xs, ys = ("dst", "src") if orev else ("src", "dst")

        if use_local:
            ds = _optional_hop_local(
                ds, nodes_ds, edges_ds, base_cols=base_cols,
                x_col=col(xv, "id"), etype=oetype, ylabel=ylabel,
                xs=xs, ys=ys, yv=yv,
                mode="bucketed" if colocate == "bucketed" else "auto")
            seg = None
        else:
            def ren_opt(t, xs=xs, ys=ys, yv=yv):
                import pyarrow as _pa

                return _pa.table({
                    "__opt_key": t[f"{xs}_id"],
                    f"{yv}__id": t[f"{ys}_id"],
                    f"{yv}__name": t[f"{ys}_name"],
                })

            seg = _rc(nodes_ds, edges_ds, etype=oetype, src_label=sl,
                      dst_label=dl).map_batches(
                ren_opt, batch_format="pyarrow").materialize()
        if seg is None:
            pass  # bucketed path already null-extended per group
        elif seg.count() == 0:
            # a completely-empty optional side loses its schema through
            # Ray's empty blocks (hash_join can't null-extend it);
            # OPTIONAL semantics are explicit here: every base binding
            # survives with null y columns
            def add_null_y(t, yv=yv):
                import pyarrow as _pa

                cols = {c: t[c] for c in t.column_names}
                cols[f"{yv}__id"] = _pa.nulls(len(t), _pa.string())
                cols[f"{yv}__name"] = _pa.nulls(len(t), _pa.string())
                return _pa.table(cols)

            ds = ds.map_batches(add_null_y, batch_format="pyarrow")
        else:
            ds = _hj(ds.materialize(), seg, on=col(xv, "id"),
                     right_on="__opt_key", how="left_outer",
                     empty_safe=True)

        base_col = col

        def col(v, p, _base=base_col, yv=yv):  # noqa: F811
            if v == yv:
                if p in ("id", "node_id"):
                    return f"{yv}__id"
                if p == "name":
                    return f"{yv}__name"
                raise ValueError(
                    f"property {p!r} not projected by OPTIONAL MATCH "
                    "(available: id, name)")
            return _base(v, p)

    def resolve(v, p):
        if p is None:  # bare variable → its node id
            c = (col(v, "node_id") if (plan.etype or v == opt_var)
                 else "node_id")
        else:
            c = col(v, p)
        if plan.etype is None and v != opt_var and c not in _NODE_PROPS:
            raise ValueError(f"unknown property {v}.{p}")
        return c

    col_items = [(resolve(v, p), alias or (f"{v}.{p}" if p else v))
                 for kind, _fn, v, p, alias in plan.returns
                 if kind == "col"]
    agg_items = [(fn, resolve(v, p), alias)
                 for kind, fn, v, p, alias in plan.returns if kind == "agg"]

    if agg_items and not col_items and len(agg_items) == 1 \
            and agg_items[0][0] == "count":
        # bare count(x): openCypher count() skips nulls — under
        # OPTIONAL MATCH the counted column CAN be null (null-extended
        # miss rows), and node properties may be null too, so count
        # non-null values of the resolved column distributed (a
        # per-batch partial sum; the row-count shortcut over-counted
        # null-extended rows).  Matches the grouped-count path.
        _cnt_col = agg_items[0][1]
        parts = ds.map_batches(
            lambda b: pd.DataFrame(
                {"__nn": [int(b[_cnt_col].notna().sum())]}),
            batch_format="pandas",
        ).to_pandas()
        return pd.DataFrame({agg_items[0][2]: [int(parts["__nn"].sum())]})

    if agg_items:
        # Cypher's implicit grouping: plain RETURN terms are the group
        # keys (RETURN a.name, count(b) groups by a.name); aggregates
        # compile onto groupby_agg — pre-combined, auto driver/shuffle
        from .relational import groupby_agg

        needed = list(dict.fromkeys(
            [c for c, _n in col_items] + [c for _f, c, _a in agg_items]
        ))
        proj_ds = ds.map_batches(
            lambda b: b[needed], batch_format="pandas"
        )
        specs = [(c, {"avg": "mean"}.get(f, f), a) for f, c, a in agg_items]
        keys = list(dict.fromkeys(c for c, _n in col_items))
        if keys:
            res = groupby_agg(proj_ds, keys, specs).to_pandas()
        else:  # global aggregates: one row via a constant group key
            res = groupby_agg(
                proj_ds.map_batches(lambda b: b.assign(__g=0),
                                    batch_format="pandas"),
                ["__g"], specs,
            ).to_pandas().drop(columns="__g")
        res = res.rename(columns=dict(col_items))
    else:
        # RETURN: distributed projection, collect only projected rows
        def project(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {name: b[c].values for c, name in col_items}
            )

        res = ds.map_batches(project, batch_format="pandas").to_pandas()
    if plan.order_by:
        cols, asc = [], []
        for name, desc in plan.order_by:
            cols.append(name)
            asc.append(not desc)
        res = res.sort_values(cols, ascending=asc, kind="mergesort")
    if plan.limit is not None:
        res = res.head(plan.limit)
    return res.reset_index(drop=True)
