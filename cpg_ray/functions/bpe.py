"""Distributed BPE merge training (byte-pair encoding, Sennrich et
al. 2016 — the public subword-vocabulary algorithm every LLM tokenizer
descends from): learn the top-M merge rules over a document corpus.

The classic scale trick is that training runs over the WORD-TYPE table
(word, freq), not the token stream: one corpus-wide groupby collapses
10^12 tokens to ~10^8 types, and every merge round then touches only
the type table.  Per round:

1. adjacent-pair counts — vectorized flat-array shift (the rep_ngrams
   shape) per batch, pre-combined locally, summed by one small groupby;
2. global argmax — per-batch top-1 combiner (relational.topk shape),
   tie-break (count desc, pair lexicographic asc) so the winner is
   deterministic on any engine;
3. merge application — vectorized hit detection over the flat arrays;
   only words actually CONTAINING the winning pair are rewritten (a
   per-row walk on that small subset: greedy left-to-right, the
   public algorithm's own sequential semantics).

So M merges = M bounded exchanges over the type table — never a
corpus rescan.  Words carry the classic ``</w>`` end-of-word terminal
symbol.  mode="driver" pulls the type table to the driver under a
guard and runs the identical per-batch kernels on one frame;
mode="auto" degrades to the Dataset path on GuardExceeded.  Not
SQL-expressible (M argmax+rewrite iterations), so the queries() entry
is rows-only; correctness is pinned by a pytest differential against
an independently-written dict-of-tuples reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import GuardExceeded, groupby_agg

_EOW = "</w>"


def word_type_table(docs_ds, *, text_col: str = "text"):
    """(word, freq) over whitespace tokens — ONE pre-combined groupby,
    the 10^12-token → 10^8-type collapse."""

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.split(" ")
        sizes = toks.map(len).to_numpy("int64")
        flat = (np.concatenate(
            [np.asarray(v, dtype=object) for v in toks])
            if sizes.sum() else np.array([], dtype=object))
        df = pd.DataFrame({"word": flat})
        df = df[df.word != ""]
        return df.groupby("word", as_index=False).agg(
            n=("word", "size")).astype({"n": "int64"})

    return groupby_agg(
        docs_ds.map_batches(counts, batch_format="pandas"),
        ["word"], [("n", "sum", "freq")])


def _explode(syms: pd.Series, freq: np.ndarray):
    """Flatten a list-of-symbols column into (flat symbols, word index,
    per-position freq) arrays — the shared kernel for pair counting
    and hit detection."""
    lens = syms.map(len).to_numpy("int64")
    total = int(lens.sum())
    flat = (np.concatenate([np.asarray(x, dtype=object) for x in syms])
            if total else np.array([], dtype=object))
    wid = np.arange(len(syms)).repeat(lens)
    f = freq.repeat(lens)
    return flat, wid, f


def _pair_partials(b: pd.DataFrame) -> pd.DataFrame:
    flat, wid, f = _explode(b["syms"], b["freq"].to_numpy("int64"))
    if len(flat) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64")})
    same = wid[:-1] == wid[1:]
    df = pd.DataFrame({"a": flat[:-1][same], "b": flat[1:][same],
                       "cnt": f[:-1][same]})
    return df.groupby(["a", "b"], as_index=False)["cnt"].sum()


def _merge_word(xs: list, left: str, right: str, joined: str) -> list:
    out = []
    i = 0
    n = len(xs)
    while i < n:
        if i + 1 < n and xs[i] == left and xs[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(xs[i])
            i += 1
    return out


def _apply_merge(b: pd.DataFrame, left: str, right: str) -> pd.DataFrame:
    flat, wid, _ = _explode(b["syms"], np.ones(len(b), np.int64))
    if len(flat) >= 2:
        same = wid[:-1] == wid[1:]
        hit = same & (flat[:-1] == left) & (flat[1:] == right)
        hit_rows = np.unique(wid[:-1][hit])
    else:
        hit_rows = np.array([], np.int64)
    if len(hit_rows) == 0:
        return b
    joined = left + right
    syms = b["syms"].to_numpy(dtype=object).copy()
    for r in hit_rows:
        syms[r] = _merge_word(syms[r], left, right, joined)
    out = b.copy()
    out["syms"] = syms
    return out


def _learn_rounds_driver(vocab: pd.DataFrame,
                         n_merges: int) -> pd.DataFrame:
    vocab = vocab.reset_index(drop=True)
    rows = []
    for rank in range(n_merges):
        pc = _pair_partials(vocab)
        if len(pc) == 0:
            break
        pc = pc.sort_values(["cnt", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort")
        best = pc.iloc[0]
        rows.append({"rank": rank, "left": best.a, "right": best.b,
                     "freq": int(best.cnt)})
        vocab = _apply_merge(vocab, best.a, best.b)
    return pd.DataFrame(rows, columns=["rank", "left", "right", "freq"]
                        ).astype({"rank": "int64", "freq": "int64"})


def learn_bpe(docs_ds, *, text_col: str = "text", n_merges: int = 40,
              mode: str = "auto",
              driver_word_limit: int = 2_000_000) -> pd.DataFrame:
    """Learn the first ``n_merges`` BPE merge rules; returns a pandas
    DataFrame (rank, left, right, freq) — the merge list is the small
    OUTPUT artifact (a tokenizer file), never distributed state."""
    if mode not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    types = word_type_table(docs_ds, text_col=text_col).materialize()

    def to_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": b["word"].map(lambda w: list(w) + [_EOW]),
            "freq": b["freq"].astype("int64"),
        })

    vocab_ds = types.map_batches(to_syms, batch_format="pandas")
    if mode in ("driver", "auto"):
        if types.count() <= driver_word_limit:
            return _learn_rounds_driver(vocab_ds.to_pandas(), n_merges)
        if mode == "driver":
            raise GuardExceeded(
                f"learn_bpe(mode='driver'): > {driver_word_limit} word "
                "types; use mode='shuffle'")
    # Dataset path: M rounds of (partial pair counts → small groupby →
    # per-batch top-1 → broadcast merge rewrite), vocab re-materialized
    # per round (its lineage would otherwise grow by one stage per
    # merge and re-execute from round 0)
    vocab = vocab_ds.materialize()
    rows = []
    for rank in range(n_merges):
        counts = groupby_agg(
            vocab.map_batches(_pair_partials, batch_format="pandas"),
            ["a", "b"], [("cnt", "sum", "cnt")])
        top = counts.map_batches(
            lambda b: b.sort_values(["cnt", "a", "b"],
                                    ascending=[False, True, True],
                                    kind="mergesort").head(1),
            batch_format="pandas").to_pandas()
        if len(top) == 0:
            break
        top = top.sort_values(["cnt", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort")
        best = top.iloc[0]
        left, right = str(best.a), str(best.b)
        rows.append({"rank": rank, "left": left, "right": right,
                     "freq": int(best.cnt)})
        vocab = vocab.map_batches(
            lambda b, lf=left, rt=right: _apply_merge(b, lf, rt),
            batch_format="pandas").materialize()
    return pd.DataFrame(rows, columns=["rank", "left", "right", "freq"]
                        ).astype({"rank": "int64", "freq": "int64"})


def apply_bpe(docs_ds, merges: pd.DataFrame, *, text_col: str = "text",
              id_col: str = "doc_id"):
    """Tokenize documents with a learned merge list: per doc, split on
    whitespace, explode words to symbols, replay merges in rank order
    (the public algorithm's inference side).  The merge list rides
    along as a broadcast-sized plain object; per-batch work is the
    same greedy rewrite.  Returns (id, n_words, n_tokens) — token
    counts under the learned vocabulary, the pretraining-budget
    metric."""
    ranked = [(str(r.left), str(r.right)) for r in
              merges.sort_values("rank").itertuples()]

    def tok(b: pd.DataFrame) -> pd.DataFrame:
        n_words = np.zeros(len(b), np.int64)
        n_tokens = np.zeros(len(b), np.int64)
        for i, text in enumerate(b[text_col]):
            words = [w for w in text.split(" ") if w]
            n_words[i] = len(words)
            total = 0
            for w in words:
                xs = list(w) + [_EOW]
                for left, right in ranked:
                    if len(xs) < 2:
                        break
                    xs = _merge_word(xs, left, right, left + right)
                total += len(xs)
            n_tokens[i] = total
        return pd.DataFrame({id_col: b[id_col], "n_words": n_words,
                             "n_tokens": n_tokens})

    return docs_ds.map_batches(tok, batch_format="pandas")
