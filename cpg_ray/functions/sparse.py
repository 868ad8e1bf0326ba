"""Learned-sparse retrieval (SPLADE-style scoring shape): documents and
queries are sparse term-weight vectors, the query side is EXPANDED with
associated terms, and the score is the sparse dot product

    score(q, d) = Σ_t  qw(q, t) · w(t) · ln(1 + tf(t, d))

- ``w(t)`` is a static per-term weight table — the seam where a learned
  model's term weights plug in.  No learned model ships in this
  container, so the default is a deterministic md5-derived weight
  (``1 + (md5_32(t) mod 1000)/1000``), chosen because any SQL engine
  reproduces it bit-for-bit (the same rule the repo's hash-sampling
  oracle uses).
- query expansion is CORPUS-DERIVED (pseudo-relevance-feedback shape):
  each query term pulls its top-m co-occurring terms (by distinct-doc
  co-occurrence count, token-asc tie-break) at a discounted weight.
  This is the association half of learned-sparse retrieval expressed
  without a model.
- ``ln(1+tf)`` is the document-side saturation (SPLADE's log-tf).

Scale shape (the part that matters at 100 TB): one tokenize pass over
the corpus produces tf rows (docs contiguous and complete per block);
co-occurrence counts are per-batch DISTINCT partials — a doc lives in
exactly one block, so per-block distinct (qterm, tok) pairs sum to the
exact global distinct-doc count; the expanded-query × weight table is
tiny and rides in the task closure; scoring is one stateless pass and
the only exchange is the grouped top-n over (queries × docs) score
rows.  Nothing materializes the corpus on the driver.

Reference analog: reference retrieval is graph-query-shaped
(Graph.kt); this operator is part of the LLM-data-pipeline family the
task brief adds beside it (similarity-search group, with knn_*/bm25_*).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np
import pandas as pd


def md5_term_weight(tok: str) -> float:
    """Deterministic static term weight in [1, 2): the learned-model
    placeholder.  SQL equivalent:
    ``1 + (('0x' || substr(md5(tok),1,8))::BIGINT % 1000) / 1000.0``"""
    h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
    return 1.0 + (h % 1000) / 1000.0


def sparse_search(docs_ds, queries: dict, *, id_col: str = "doc_id",
                  text_col: str = "text", top_n: int = 10,
                  expand_m: int = 2, expand_weight: float = 0.3,
                  ndigits: int = 6, weights: dict | None = None,
                  mode: str = "auto",
                  materialize_doc_limit: int = 2_000_000):
    """Top-n documents per query under the expanded sparse dot product.

    ``queries`` maps qid → query text.  ``weights`` optionally supplies
    learned term weights (tok → float); defaults to
    :func:`md5_term_weight`.  Returns a Dataset of (qid, id_col,
    score), score rounded to ``ndigits`` BEFORE ranking (per-(q,d) sums
    of doubles are not associative across engines), doc-id tie-break.

    Two passes need the tf-explode (co-occurrence expansion, then
    scoring).  ``mode='auto'``: under ``materialize_doc_limit`` docs
    the explode is materialized once and shared (saves a second
    tokenize pass); past the guard — a corpus-sized token table must
    never be PINNED in the object store at 100 TB — each pass
    re-derives its tf rows from the doc batches and nothing
    corpus-sized is retained ('stream').  ``mode='pin'``/``'stream'``
    force either shape; both are pinned equivalent by test."""
    from .relational import groupby_agg, grouped_topk
    from .text import _tf_frame

    if mode not in ("auto", "pin", "stream"):
        raise ValueError(f"unknown mode {mode!r}")

    qterms_by_qid = {
        qid: list(dict.fromkeys(re.findall("[a-z0-9_]+", qtext.lower())))
        for qid, qtext in sorted(queries.items())
    }
    qterms = frozenset(t for ts in qterms_by_qid.values() for t in ts)

    # tf rows, whole blocks so each doc's rows are complete (docs are
    # one row each, so doc-batch-derived frames are doc-complete)
    tf_lazy = docs_ds.map_batches(
        lambda b: _tf_frame(b, id_col, text_col),
        batch_format="pandas", batch_size=None)
    pin = mode == "pin" or (
        mode == "auto" and docs_ds.count() <= materialize_doc_limit)
    tf_rows = tf_lazy.materialize() if pin else tf_lazy

    # co-occurrence partials: within a block, for every query term,
    # count the DISTINCT docs each other token shares with it.  Docs
    # are block-complete, so per-block distinct pairs sum exactly.
    def cooc_partial(t: pd.DataFrame) -> pd.DataFrame:
        if t.empty:
            return pd.DataFrame({"qtok": pd.Series([], dtype=object),
                                 "tok": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        hit = t[t["tok"].isin(qterms)][[id_col, "tok"]].rename(
            columns={"tok": "qtok"})
        pairs = hit.merge(t[[id_col, "tok"]], on=id_col)
        pairs = pairs[pairs["tok"] != pairs["qtok"]]
        g = (pairs.drop_duplicates([id_col, "qtok", "tok"])
                  .groupby(["qtok", "tok"], sort=False).size())
        return g.reset_index(name="c")

    cooc = groupby_agg(
        tf_rows.map_batches(cooc_partial, batch_format="pandas",
                            batch_size=None),
        ["qtok", "tok"], [("c", "sum", "c")]).to_pandas()

    # expansion: per query TERM top-m co-occurring tokens
    if not cooc.empty:
        cooc = (cooc.sort_values(["qtok", "c", "tok"],
                                 ascending=[True, False, True],
                                 kind="mergesort")
                    .groupby("qtok", sort=False).head(expand_m))
        exp_by_term = cooc.groupby("qtok")["tok"].apply(list).to_dict()
    else:
        exp_by_term = {}

    # expanded query table: exact terms at 1.0, expansions discounted,
    # max on overlap (an expansion that is also an exact term keeps 1.0)
    rows = []
    for qid, terms in qterms_by_qid.items():
        qw: dict[str, float] = {}
        for t in terms:
            qw[t] = 1.0
        for t in terms:
            for e in exp_by_term.get(t, []):
                qw[e] = max(qw.get(e, 0.0), expand_weight)
        for tok, wq in qw.items():
            rows.append((qid, tok, wq))
    qx = pd.DataFrame(rows, columns=["qid", "tok", "qw"])

    if qx.empty:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"qid": pd.Series([], dtype=object),
             id_col: pd.Series([], dtype=object),
             "score": pd.Series([], dtype="float64")}))

    wfn = (weights or {}).get if weights else None
    qx["f"] = qx["qw"] * np.array(
        [wfn(t, md5_term_weight(t)) if wfn else md5_term_weight(t)
         for t in qx["tok"]])
    qxf = qx[["qid", "tok", "f"]]

    # scoring pass: candidate tf rows × (qid, f) table, per-(qid, doc)
    # sum — complete within the block because docs are block-complete
    def score(t: pd.DataFrame) -> pd.DataFrame:
        if t.empty:
            return pd.DataFrame({"qid": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype="float64")})
        m = t.merge(qxf, on="tok")
        if m.empty:
            return pd.DataFrame({"qid": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype="float64")})
        # np.log(1.0 + tf), NOT log1p: the oracle's ln(1 + tf) is a
        # plain log over the exactly-representable 1+tf, and log1p may
        # differ in the last ulp
        m = m.assign(part=m["f"].to_numpy(np.float64)
                     * np.log(1.0 + m["tf"].to_numpy(np.float64)))
        s = m.groupby(["qid", id_col], sort=False)["part"].sum()
        out = s.reset_index(name="score")
        out["score"] = out["score"].round(ndigits)
        return out

    scored = tf_rows.map_batches(score, batch_format="pandas",
                                 batch_size=None)
    return grouped_topk(scored, ["qid"], "score", top_n,
                        descending=True, tie_break=id_col)


def rrf_fuse(a_ds, b_ds, *, key: str = "qid", id_col: str = "doc_id",
             score_col: str = "score", k0: int = 60, top_n: int = 10,
             scale: int = 10 ** 9):
    """Reciprocal-rank fusion (Cormack et al. 2009, public) of two
    ranked retrieval lists: each system's rank r contributes
    ``scale // (k0 + r)`` — the INTEGER-floored analog of 1/(k0+r), so
    the fused score is an exact int64 sum every engine reproduces
    bit-for-bit — and items missing from one list contribute 0 from
    it.  Ranks are recomputed from (score DESC, id) inside each input
    (row_number semantics, deterministic on rounded scores).  Returns
    a Dataset of (key, id_col, rrf) — the fused top_n per key, ranked
    (rrf DESC, id).

    Scale shape: inputs are already top-N-bounded per key (N × queries
    rows, tiny relative to the corpus they were ranked over), so the
    per-key rank is a bounded map_groups, the alignment is one
    full-outer hash join on (key, id), and the finish is grouped_topk
    — nothing rescans the corpus."""
    import pandas as pd

    from .relational import grouped_topk, hash_join

    def rank(g: pd.DataFrame, side: str) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col],
                          ascending=[False, True], kind="mergesort")
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy(),
            f"r_{side}": pd.RangeIndex(1, len(g) + 1).to_numpy("int64"),
        })

    ra = a_ds.groupby(key).map_groups(
        lambda g: rank(g, "a"), batch_format="pandas").materialize()
    rb = b_ds.groupby(key).map_groups(
        lambda g: rank(g, "b"), batch_format="pandas").materialize()
    # an EMPTY side loses its schema through map_groups, so the outer
    # join cannot null-extend it — short-circuit to the present side
    na, nb = ra.count(), rb.count()
    if nb == 0:
        both = ra.map_batches(lambda b: b.assign(r_b=float("nan")),
                              batch_format="pandas")
    elif na == 0:
        both = rb.map_batches(lambda b: b.assign(r_a=float("nan")),
                              batch_format="pandas")
    else:
        both = hash_join(ra, rb, on=[key, id_col], how="full_outer",
                         empty_safe=True)

    def fuse(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        tot = np.zeros(len(b), dtype=np.int64)
        for c in ("r_a", "r_b"):
            r = pd.to_numeric(b[c], errors="coerce")
            have = r.notna().to_numpy()
            filled = r.fillna(1).to_numpy(np.int64)
            tot += np.where(have, scale // (k0 + filled), 0)
        return pd.DataFrame({key: b[key], id_col: b[id_col],
                             "rrf": pd.Series(tot, dtype="int64")})

    fused = both.map_batches(fuse, batch_format="pandas")
    return grouped_topk(fused, [key], "rrf", top_n,
                        descending=True, tie_break=id_col)


# ---------------------------------------------------------------------------
# Late-interaction (MaxSim) retrieval — the ColBERT scoring shape
# ---------------------------------------------------------------------------

_VEC_DIM = 4
_VEC_MOD = 2001  # components in [-1000, 1000]: dot products stay tiny int64


def md5_token_vec(tok: str) -> "np.ndarray":
    """Deterministic per-token integer embedding — the seam where a
    learned token encoder plugs in.  Component i is
    ``md5_32(tok + '#' + i) mod 2001 - 1000``; SQL equivalent per
    component: ``(('0x' || substr(md5(tok || '#i'), 1, 8))::BIGINT
    % 2001) - 1000`` — integer end to end, so every engine reproduces
    scores bit-for-bit (same convention as :func:`md5_term_weight`)."""
    return np.array(_vec_components(tok), dtype=np.int64)


@lru_cache(maxsize=1 << 20)  # bounded: ~32 MB worst case, then recompute
def _vec_components(tok: str) -> tuple:
    return tuple(
        int(hashlib.md5(f"{tok}#{i}".encode()).hexdigest()[:8], 16)
        % _VEC_MOD - (_VEC_MOD - 1) // 2
        for i in range(_VEC_DIM)
    )


def maxsim_search(docs_ds, queries: dict, *, id_col: str = "doc_id",
                  text_col: str = "text", top_n: int = 10,
                  doc_prefix: int = 32):
    """Late-interaction retrieval (Khattab & Zaharia 2020 ColBERT
    scoring shape, public): every token carries its own vector and

        score(q, d) = Σ_{t∈tokens(q)} max_{u∈tokens(d)} <v(t), v(u)>

    — the query token finds its best-matching document token (MaxSim)
    instead of the document collapsing to one vector.  Token vectors
    come from :func:`md5_token_vec` (the learned-encoder seam); scores
    are exact int64 sums of integer dot products, so the DuckDB oracle
    matches bit-for-bit.

    Documents are truncated to their first ``doc_prefix`` token
    POSITIONS then deduplicated (max over a multiset equals max over
    its support) — the ColBERT max-doc-length analog that also bounds
    per-batch work.  Query tokens are deduplicated per qid.

    Scale shape: the query token matrix is tiny and rides in the task
    closure; scoring is ONE stateless pass over the corpus — per batch
    an integer matmul (all doc-token vectors × all query-token
    vectors) followed by a C-speed per-doc max — and each document
    lives wholly in its row, so per-batch scores are final.  The only
    exchange is the grouped top-n over (queries × docs) score rows.
    Returns a Dataset of (qid, id_col, score), ranked (score DESC,
    id)."""
    from .relational import grouped_topk

    qtoks_by_qid = {
        qid: list(dict.fromkeys(re.findall("[a-z0-9_]+", qtext.lower())))
        for qid, qtext in sorted(queries.items())
    }
    flat = [(qid, t) for qid, ts in qtoks_by_qid.items() for t in ts]
    if not flat:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"qid": pd.Series([], dtype=object),
             id_col: pd.Series([], dtype=object),
             "score": pd.Series([], dtype="int64")}))
    qmat = np.stack([md5_token_vec(t) for _, t in flat])  # (nq, DIM)
    qcols_by_qid = {}
    for j, (qid, _) in enumerate(flat):
        qcols_by_qid.setdefault(qid, []).append(j)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": pd.Series([], dtype=object),
                              id_col: pd.Series([], dtype=object),
                              "score": pd.Series([], dtype="int64")})
        if b.empty:
            return empty
        doc_ids, toks = [], []
        for did, text in zip(b[id_col], b[text_col]):
            seen = dict.fromkeys(
                re.findall("[a-z0-9_]+", str(text).lower())[:doc_prefix])
            for t in seen:
                doc_ids.append(did)
                toks.append(t)
        if not toks:
            return empty
        uniq = list(dict.fromkeys(toks))
        vmap = {t: i for i, t in enumerate(uniq)}
        vmat = np.stack([md5_token_vec(t) for t in uniq])  # (nu, DIM)
        sims = vmat[[vmap[t] for t in toks]] @ qmat.T  # (pairs, nq) int64
        per_doc = (pd.DataFrame(sims)
                   .groupby(pd.Series(doc_ids), sort=False).max())
        out = []
        for qid, cols in qcols_by_qid.items():
            out.append(pd.DataFrame({
                "qid": qid,
                id_col: per_doc.index,
                "score": per_doc.iloc[:, cols].sum(axis=1)
                                .to_numpy(np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    scored = docs_ds.map_batches(score, batch_format="pandas")
    return grouped_topk(scored, ["qid"], "score", top_n,
                        descending=True, tie_break=id_col)
