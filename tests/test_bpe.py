"""BPE merge training: differential vs an independently-written
dict-of-tuples reference (different data representation — tuple-keyed
Counter vocab vs the engine's flat-array kernels), mode equivalence,
tie-breaking, and overlap (greedy left-to-right) semantics."""

from collections import Counter

import pandas as pd
import ray.data as rd

from cpg_ray.functions.bpe import apply_bpe, learn_bpe


def _ref_learn_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"rank": rank, "left": left, "right": right,
                       "freq": freq})
        new: Counter = Counter()
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += f
        vocab = new
    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"])


CORPORA = [
    ["the cat sat on the mat", "the cat ran", "a cat a mat a hat"],
    # ties: 'xy' and 'yx' equal counts → lexicographic winner
    ["xy yx", "xy yx", "ab ab ba"],
    # overlap: greedy left-to-right on runs
    ["aaaa aaa aa", "aaaa aaaa"],
    ["ünïcödé wörds ünïcödé", "wörds wörds"],
]


def test_learn_bpe_matches_independent_reference_driver_and_shuffle():
    for texts in CORPORA:
        docs = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}))
        expect = _ref_learn_bpe(texts, 12)
        d = learn_bpe(docs, n_merges=12, mode="driver")
        pd.testing.assert_frame_equal(
            d.reset_index(drop=True), expect, check_dtype=False)
        s = learn_bpe(docs, n_merges=12, mode="shuffle")
        pd.testing.assert_frame_equal(
            s.reset_index(drop=True), expect, check_dtype=False)


def test_apply_bpe_token_counts():
    texts = ["low lower lowest", "low low newer"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": texts}))
    m0 = learn_bpe(docs, n_merges=0)
    m8 = learn_bpe(docs, n_merges=8)
    t0 = apply_bpe(docs, m0).to_pandas().set_index("doc_id")
    t8 = apply_bpe(docs, m8).to_pandas().set_index("doc_id")
    # zero merges → chars + </w> per word
    assert t0.loc[0, "n_tokens"] == sum(
        len(w) + 1 for w in texts[0].split())
    assert t0.loc[0, "n_words"] == 3
    # merges only ever shrink the token count
    assert (t8.n_tokens <= t0.n_tokens).all()
    assert (t8.n_tokens >= t8.n_words).all()


def test_learn_bpe_exhausts_gracefully():
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["ab"]}))
    m = learn_bpe(docs, n_merges=50, mode="driver")
    # 'ab</w>' supports exactly 2 merges, then the table is single
    # symbols per word and pair counts still exist... walk to fixpoint:
    # a+b -> 'ab', 'ab'+'</w>' -> 'ab</w>', then no pairs remain
    assert list(m.freq) == [1, 1]
    assert len(m) == 2
