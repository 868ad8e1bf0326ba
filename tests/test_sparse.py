"""Learned-sparse retrieval (functions/sparse.py) behavior pins — the
properties the SQL oracle comparison can't express."""

import pandas as pd
import ray.data as rd

from cpg_ray.functions.sparse import md5_term_weight, sparse_search


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_expansion_retrieves_docs_without_exact_terms():
    """'cat' co-occurs with 'dog' in d1/d2, so querying 'cat' must also
    retrieve d3 (dog-only, no exact term) through the expansion."""
    docs = _docs([
        {"doc_id": 1, "text": "cat dog"},
        {"doc_id": 2, "text": "cat dog bird"},
        {"doc_id": 3, "text": "dog dog dog"},
        {"doc_id": 4, "text": "fish"},
    ])
    out = sparse_search(docs, {"q0": "cat"}, top_n=10).to_pandas()
    got = set(out["doc_id"])
    assert 3 in got, "expansion term must retrieve dog-only doc"
    assert 4 not in got, "unrelated doc must not appear"
    # exact-term docs outrank the expansion-only doc (qw 1.0 vs 0.3)
    ranked = out.sort_values("score", ascending=False)["doc_id"].tolist()
    assert ranked.index(3) > ranked.index(1)


def test_weights_seam_changes_ranking():
    """Supplying learned weights through the seam must reorder results:
    crushing one term's weight demotes docs that rely on it."""
    docs = _docs([
        {"doc_id": 1, "text": "alpha alpha alpha"},
        {"doc_id": 2, "text": "beta beta beta"},
    ])
    q = {"q0": "alpha beta"}
    default = sparse_search(docs, q, top_n=2).to_pandas()
    crushed = sparse_search(
        docs, q, top_n=2,
        weights={"alpha": 0.001, "beta": md5_term_weight("beta")},
    ).to_pandas()
    d0 = default.sort_values("score", ascending=False)["doc_id"].tolist()
    c0 = crushed.sort_values("score", ascending=False)["doc_id"].tolist()
    assert c0[0] == 2, "crushing alpha's weight must rank beta doc first"
    # and the default md5 weights are deterministic
    assert md5_term_weight("alpha") == md5_term_weight("alpha")
    assert 1.0 <= md5_term_weight("alpha") < 2.0
    assert d0  # both runs returned rankings


def test_empty_query_and_empty_corpus():
    docs = _docs([{"doc_id": 1, "text": "x y"}])
    out = sparse_search(docs, {}, top_n=5).to_pandas()
    assert len(out) == 0
    empty = _docs([{"doc_id": 1, "text": ""}])
    out2 = sparse_search(empty, {"q0": "x"}, top_n=5).to_pandas()
    assert len(out2) == 0


def test_dsir_scores_favor_target_like_docs():
    """Docs made of target-corpus tokens must outscore docs made of
    source-only tokens (the selection property DSIR exists for)."""
    from cpg_ray.functions.text import dsir_scores

    docs = _docs([
        {"doc_id": 1, "text": "alpha alpha beta", "is_tgt": True},
        {"doc_id": 2, "text": "alpha beta", "is_tgt": False},
        {"doc_id": 3, "text": "gamma gamma delta", "is_tgt": False},
    ])
    out = dsir_scores(docs).to_pandas().set_index("doc_id")["dsir_score"]
    # doc 2 shares the target's vocabulary; doc 3 is pure source-only
    assert out[2] > out[3]
    assert out[1] > out[3]


def test_rrf_fuse_hand_computed_and_one_sided():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.sparse import rrf_fuse

    a = pd.DataFrame({"qid": ["q"] * 3, "doc_id": [1, 2, 3],
                      "score": [3.0, 2.0, 1.0]})      # ranks 1,2,3
    b = pd.DataFrame({"qid": ["q"] * 3, "doc_id": [3, 4, 2],
                      "score": [9.0, 5.0, 4.0]})      # ranks 1,2,3
    got = rrf_fuse(rd.from_pandas(a), rd.from_pandas(b),
                   top_n=10).to_pandas()
    got = got.sort_values(["qid", "rrf", "doc_id"],
                          ascending=[True, False, True]
                          ).reset_index(drop=True)
    S = 10 ** 9
    expect = {
        1: S // 61,             # only in a, rank 1
        2: S // 62 + S // 63,   # a rank 2, b rank 3
        3: S // 63 + S // 61,   # a rank 3, b rank 1
        4: S // 62,             # only in b, rank 2
    }
    assert dict(zip(got.doc_id, got.rrf)) == expect
    # doc 3 fuses highest (1st + 3rd beats 2nd + 3rd and singles)
    assert got.doc_id.iloc[0] == 3
    # ties on score break on doc_id when ranking (deterministic)
    t = pd.DataFrame({"qid": ["q", "q"], "doc_id": [8, 7],
                      "score": [1.0, 1.0]})
    empty = pd.DataFrame({"qid": pd.Series([], dtype=object),
                          "doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    one = rrf_fuse(rd.from_pandas(t), rd.from_pandas(empty),
                   top_n=10).to_pandas()
    assert dict(zip(one.doc_id, one.rrf)) == {7: S // 61, 8: S // 62}
    # top_n truncates per query
    top1 = rrf_fuse(rd.from_pandas(a), rd.from_pandas(b),
                    top_n=1).to_pandas()
    assert list(top1.doc_id) == [3]


def test_maxsim_hand_computed_and_prefix_truncation():
    """Score must equal the brute-force Σ-max of integer dot products,
    and a token past the doc_prefix cutoff must not contribute."""
    import numpy as np

    from cpg_ray.functions.sparse import maxsim_search, md5_token_vec

    docs = _docs([
        {"doc_id": 1, "text": "alpha beta"},
        {"doc_id": 2, "text": "gamma delta epsilon"},
        # doc 3 hides the query token past a prefix of 2
        {"doc_id": 3, "text": "zeta eta alpha"},
    ])
    out = maxsim_search(docs, {"q": "alpha gamma"},
                        top_n=10, doc_prefix=2).to_pandas()
    out = out.set_index("doc_id")["score"]

    def brute(tokens):
        return sum(
            max(int(md5_token_vec(qt) @ md5_token_vec(dt))
                for dt in tokens)
            for qt in ["alpha", "gamma"])

    assert out[1] == brute(["alpha", "beta"])
    assert out[2] == brute(["gamma", "delta"])        # epsilon truncated
    assert out[3] == brute(["zeta", "eta"])           # alpha truncated
    # exact self-match dominates doc 3's truncated view for q-token
    # alpha: doc 1 must outrank doc 3
    assert out[1] > out[3]


def test_maxsim_duplicate_tokens_do_not_change_score():
    """Max over a multiset equals max over its support: repeating a
    document token must not alter the MaxSim score."""
    from cpg_ray.functions.sparse import maxsim_search

    once = maxsim_search(_docs([{"doc_id": 1, "text": "alpha beta"}]),
                         {"q": "alpha"}).to_pandas()
    thrice = maxsim_search(
        _docs([{"doc_id": 1, "text": "alpha alpha alpha beta"}]),
        {"q": "alpha"}).to_pandas()
    assert once.score.iloc[0] == thrice.score.iloc[0]


def test_sparse_search_pin_and_stream_modes_agree(ray_session):
    """mode='pin' (materialized tf-explode, the sub-guard fast path)
    and mode='stream' (per-pass re-derivation, the 100-TB posture that
    never pins a corpus-sized token table) rank identically."""
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [
            "cat sits on the mat", "dog chases the cat",
            "mat cleaning service", "cats and dogs живут",
            "the dog sleeps", "cat cat cat", "nothing relevant",
            "dog on a mat with a cat",
        ],
    }))
    q = {"q0": "cat mat", "q1": "dog"}
    a = (sparse_search(docs, q, top_n=5, mode="pin").to_pandas()
         .sort_values(["qid", "score", "doc_id"],
                      ascending=[True, False, True])
         .reset_index(drop=True))
    b = (sparse_search(docs, q, top_n=5, mode="stream").to_pandas()
         .sort_values(["qid", "score", "doc_id"],
                      ascending=[True, False, True])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
