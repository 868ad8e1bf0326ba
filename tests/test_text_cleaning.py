"""Tests for the round-4 late text family: paragraph-level exact
dedup, NFC/whitespace cleaning, unigram-LM scoring, ordered grouped
concatenation, and the bounded moving-window frame."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


# ---- paragraph_dedup --------------------------------------------------------


def _pd_docs():
    return pd.DataFrame({
        "url": ["b", "a", "c", "d"],
        "text": [
            "Home\nBio\nBob works here.",       # Home/Bio dup vs "a"
            "Home\nBio\nAlice works here.\nBio",  # within-doc Bio repeat
            "",                                   # empty doc survives
            "Unique only\nHome",                  # trailing boilerplate
        ],
    })


def test_paragraph_dedup_keeps_first_global_occurrence():
    from cpg_ray.functions.text import paragraph_dedup

    out = paragraph_dedup(
        rd.from_pandas(_pd_docs()), id_col="url", text_col="text"
    ).to_pandas().set_index("url").sort_index()

    # first occurrence ordered by (url, idx): url "a" wins Home/Bio
    assert out.loc["a", "clean_text"] == "Home\nBio\nAlice works here."
    assert out.loc["a", "n_paras"] == 4 and out.loc["a", "n_kept"] == 3
    # url "b" keeps only its unique paragraph
    assert out.loc["b", "clean_text"] == "Bob works here."
    # the empty doc's single empty paragraph is first → kept
    assert out.loc["c", "clean_text"] == "" and out.loc["c", "n_paras"] == 1
    # later boilerplate dropped even at end-of-doc
    assert out.loc["d", "clean_text"] == "Unique only"


def test_paragraph_dedup_modes_agree():
    from cpg_ray.functions.text import paragraph_dedup

    rng = np.random.default_rng(7)
    paras = [f"para {i}" for i in range(30)]
    docs = pd.DataFrame({
        "url": [f"u{i:03d}" for i in range(60)],
        "text": ["\n".join(rng.choice(paras, size=rng.integers(1, 8)))
                 for _ in range(60)],
    })
    a = paragraph_dedup(rd.from_pandas(docs), id_col="url",
                        text_col="text", mode="driver").to_pandas()
    b = paragraph_dedup(rd.from_pandas(docs), id_col="url",
                        text_col="text", mode="shuffle").to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # global invariant: every distinct paragraph kept exactly once
    kept = [p for t in a.clean_text for p in (t.split("\n") if t else [])]
    all_paras = {p for t in docs.text for p in t.split("\n")}
    assert sorted(kept) == sorted(all_paras)


# ---- clean_text -------------------------------------------------------------


def test_clean_text_recomposes_nfd_and_collapses_whitespace():
    import unicodedata

    from cpg_ray.functions.text import clean_text

    decomposed = unicodedata.normalize("NFD", "café è ü")
    assert decomposed != "café è ü"  # really decomposed
    b = pd.DataFrame({"text": [decomposed, "  x \t y  \n  z  ", "ok"]})
    out = clean_text(b)
    assert out.clean_text.iloc[0] == "café è ü"
    assert out.changed.iloc[0]  # composition happened
    assert out.clean_text.iloc[1] == "x y\nz"
    assert out.clean_text.iloc[2] == "ok" and not out.changed.iloc[2]
    assert out.n_chars.tolist() == [8, 5, 2]


# ---- unigram_features -------------------------------------------------------


def test_unigram_features_counts_and_logprob():
    from cpg_ray.functions.text import unigram_features

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a b", "b c", "a rare"],
    })
    out = unigram_features(
        rd.from_pandas(docs), id_col="doc_id"
    ).to_pandas().set_index("doc_id").sort_index()
    # corpus counts: a=3, b=2, c=1, rare=1; total=7
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[1, "sum_tok_freq"] == 3 + 3 + 2
    assert out.loc[1, "min_freq"] == 2 and out.loc[1, "n_hapax"] == 0
    assert out.loc[2, "n_hapax"] == 1 and out.loc[2, "min_freq"] == 1
    assert out.loc[3, "min_freq"] == 1 and out.loc[3, "n_hapax"] == 1
    expect = -(math.log(3 / 7) + math.log(1 / 7)) / 2
    assert out.loc[3, "avg_neg_logprob"] == pytest.approx(expect, abs=0)


# ---- ordered_concat ---------------------------------------------------------


def test_ordered_concat_matches_pandas_and_modes_agree():
    from cpg_ray.functions.relational import ordered_concat

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, size=200),
        "v": [f"v{rng.integers(0, 50):02d}_{i}" for i in range(200)],
    })
    expect = df.groupby("k")["v"].agg(
        lambda s: "|".join(sorted(s))).rename("vals").reset_index()
    expect["n"] = df.groupby("k").size().values.astype("int64")
    for mode in ("driver", "shuffle"):
        got = ordered_concat(rd.from_pandas(df), ["k"], "v",
                             mode=mode).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        got["n"] = got["n"].astype("int64")
        pd.testing.assert_frame_equal(
            got[["k", "vals", "n"]], expect, check_dtype=False)


def test_ordered_concat_rejects_separator_in_value():
    from cpg_ray.functions.relational import ordered_concat

    df = pd.DataFrame({"k": [1], "v": ["has|sep"]})
    with pytest.raises(Exception, match="separator"):
        ordered_concat(rd.from_pandas(df), ["k"], "v").to_pandas()


# ---- q_events_moving window frame -------------------------------------------


def test_moving_frame_matches_pandas_rolling():
    from cpg_ray.pipelines.queries import q_events_moving

    out = q_events_moving("/root/testdata/sf0.001")
    import pyarrow.parquet as pq

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cents = np.round(ev.value.to_numpy("float64") * 100).astype("int64")
    ev["c"] = cents
    expect_w3 = ev.groupby("user_id")["c"].rolling(
        3, min_periods=1).sum().reset_index(level=0, drop=True)
    ev["w3"] = expect_w3.astype("int64")
    ev["lead"] = ev.groupby("user_id")["event_id"].shift(-1).fillna(
        -1).astype("int64")
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert (out.w3_cents.to_numpy() == ev.w3.to_numpy()).all()
    assert (out.lead_event.to_numpy() == ev["lead"].to_numpy()).all()


# ---- distinct-count / pivot queries ------------------------------------------


def test_distinct_users_and_pivot_match_pandas():
    import pyarrow.parquet as pq

    from cpg_ray.pipelines.queries import (q_events_distinct_users,
                                           q_events_pivot)

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()

    got = q_events_distinct_users(sf)
    exp = ev.assign(hour=ev.ts.dt.floor("h")).groupby("hour").agg(
        n_users=("user_id", "nunique"), n_events=("user_id", "size"),
    ).reset_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_p = q_events_pivot(sf)
    cents = np.round(ev.value.to_numpy("float64") * 100).astype("int64")
    exp_p = ev.assign(cents=cents).pivot_table(
        index="user_id", columns="event_type", values="cents",
        aggfunc="count", fill_value=0)
    for t in ["click", "error", "purchase", "signup", "view"]:
        assert (got_p.set_index("user_id")[f"n_{t}"]
                == exp_p[t]).all(), t
    tot = ev.assign(cents=cents).groupby("user_id").cents.sum()
    assert (got_p.set_index("user_id").total_cents == tot).all()


# ---- statistics aggregates ----------------------------------------------------


def test_lineitem_stats_formula_matches_numpy_reference():
    import pyarrow.parquet as pq

    from cpg_ray.pipelines.queries import q_lineitem_stats

    sf = "/root/testdata/sf0.001"
    out = q_lineitem_stats(sf).set_index("l_returnflag")
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    x = np.round(li.l_quantity.to_numpy("float64")).astype("int64")
    y = np.round(li.l_discount.to_numpy("float64") * 100).astype("int64")
    for rf, g in li.assign(x=x, y=y).groupby("l_returnflag"):
        assert out.loc[rf, "stddev_qty"] == pytest.approx(
            g.x.std(ddof=1), rel=1e-12)
        assert out.loc[rf, "corr_qty_disc"] == pytest.approx(
            np.corrcoef(g.x, g.y)[0, 1], rel=1e-9)


def test_mode_tie_break_is_min_value():
    from cpg_ray.functions.relational import groupby_agg, grouped_topk

    # two users tied at 2 events each: the min user id must win
    df = pd.DataFrame({"event_type": ["a"] * 4,
                       "user_id": [7, 7, 3, 3]})
    counts = groupby_agg(rd.from_pandas(df), ["event_type", "user_id"],
                         [("user_id", "count", "n")])
    top = grouped_topk(counts, ["event_type"], "n", 1,
                       descending=True, tie_break="user_id").to_pandas()
    assert top.user_id.iloc[0] == 3 and top.n.iloc[0] == 2


def test_histogram_bins_partition_all_rows():
    import pyarrow.parquet as pq

    from cpg_ray.pipelines.queries import q_events_histogram

    sf = "/root/testdata/sf0.001"
    out = q_events_histogram(sf)
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    assert out.n.sum() == len(ev)
    assert out.bin.between(0, 9).all()
    cents = np.round(ev.value.to_numpy("float64") * 100).astype("int64")
    expect = pd.DataFrame({
        "event_type": ev.event_type,
        "bin": np.minimum(cents // 500, 9)}).value_counts().rename(
        "n").reset_index().sort_values(["event_type", "bin"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)


# ---- within-document repeated n-grams -----------------------------------------


def test_rep_ngrams_counts_within_doc_only():
    from cpg_ray.functions.text import rep_ngrams

    b = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c a b c x",   # 'a b c' twice (5 grams total)
                 "a b c d",         # no repeats (2 grams)
                 "x y"],            # too short: no row
    })
    out = rep_ngrams(b, n=3).set_index("doc_id")
    assert out.loc[1, "n_grams"] == 5
    assert out.loc[1, "n_dup_occ"] == 2 and out.loc[1, "n_dup_grams"] == 1
    assert out.loc[2, "n_dup_occ"] == 0 and out.loc[2, "n_grams"] == 2
    assert 3 not in out.index
    # cross-doc repeats never count: doc 2 shares 'a b c' with doc 1
    assert out.loc[2, "n_dup_grams"] == 0


def _brute_para_dedup(docs: pd.DataFrame, sep: str = "\n") -> pd.DataFrame:
    """Pure-Python reference: global first-occurrence by (url, idx)."""
    seen: set = set()
    rows = []
    for url in sorted(docs.url):
        text = docs.set_index("url").loc[url, "text"]
        paras = text.split(sep)
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        rows.append({"url": url, "clean_text": sep.join(kept),
                     "n_paras": len(paras), "n_kept": len(kept)})
    return pd.DataFrame(rows)


def test_paragraph_dedup_differential_random_corpora():
    from cpg_ray.functions.text import paragraph_dedup

    rng = np.random.default_rng(23)
    pool = ([f"common {i}" for i in range(5)]
            + [f"rare {i}" for i in range(200)]
            + ["", " ", "x"])
    for trial in range(8):
        n_docs = int(rng.integers(2, 40))
        docs = pd.DataFrame({
            "url": [f"u{trial}_{i:03d}" for i in range(n_docs)],
            "text": ["\n".join(rng.choice(pool,
                                          size=rng.integers(1, 10)))
                     for _ in range(n_docs)],
        })
        got = paragraph_dedup(
            rd.from_pandas(docs), id_col="url", text_col="text"
        ).to_pandas().sort_values("url").reset_index(drop=True)
        expect = _brute_para_dedup(docs)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def _brute_mask_dup_spans(docs: pd.DataFrame, n: int = 8) -> pd.DataFrame:
    """Pure-Python reference for mask_dup_spans (Lee et al. semantics:
    occurrence counts over the whole corpus, same-doc repeats count)."""
    from collections import Counter

    counts: Counter = Counter()
    for t in docs.text:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            counts[" ".join(toks[i:i + n])] += 1
    rows = []
    for did, t in zip(docs.doc_id, docs.text):
        toks = t.split(" ")
        mask = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if counts[" ".join(toks[i:i + n])] >= 2:
                for off in range(n):
                    mask[i + off] = True
        rows.append({
            "doc_id": did,
            "clean_text": " ".join(
                tok for tok, m in zip(toks, mask) if not m),
            "n_masked": sum(mask),
            "n_tokens": len(toks),
        })
    return pd.DataFrame(rows)


def test_mask_dup_spans_planted_duplicate_vanishes():
    """A span repeated verbatim across two docs is removed from BOTH;
    the unique surroundings survive byte-identically."""
    from cpg_ray.functions.text import mask_dup_spans

    span = " ".join(f"dup{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            f"alpha beta {span} gamma delta",
            f"one two three {span} four",
            "totally unique words that appear exactly once here ok",
        ],
    })
    out = mask_dup_spans(rd.from_pandas(docs), n=8).to_pandas() \
        .set_index("doc_id")
    assert "dup0" not in out.loc[1, "clean_text"]
    assert "dup7" not in out.loc[2, "clean_text"]
    assert out.loc[1, "clean_text"] == "alpha beta gamma delta"
    assert out.loc[2, "clean_text"] == "one two three four"
    assert out.loc[3, "n_masked"] == 0
    assert out.loc[3, "clean_text"] == docs.set_index("doc_id") \
        .loc[3, "text"]


def test_mask_dup_spans_same_doc_repeat_counts():
    """A gram occurring twice WITHIN one document is duplicated —
    both occurrences masked (occurrence semantics, not doc-distinct)."""
    from cpg_ray.functions.text import mask_dup_spans

    span = " ".join(f"w{i}" for i in range(8))
    docs = pd.DataFrame({
        "doc_id": [1],
        "text": [f"{span} middle {span}"],
    })
    out = mask_dup_spans(rd.from_pandas(docs), n=8).to_pandas()
    assert out.loc[0, "clean_text"] == "middle"
    assert out.loc[0, "n_masked"] == 16


def test_mask_dup_spans_differential_random_corpora():
    from cpg_ray.functions.text import mask_dup_spans

    rng = np.random.default_rng(31)
    vocab = [f"t{i}" for i in range(30)]
    for trial in range(6):
        n_docs = int(rng.integers(2, 25))
        docs = pd.DataFrame({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab,
                                         size=rng.integers(1, 40)))
                     for _ in range(n_docs)],
        })
        got = mask_dup_spans(rd.from_pandas(docs), n=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        expect = _brute_mask_dup_spans(docs)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_mask_dup_spans_dup_table_guard():
    from cpg_ray.functions.relational import GuardExceeded
    from cpg_ray.functions.text import mask_dup_spans

    span = " ".join(f"g{i}" for i in range(20))
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [span, span]})
    with pytest.raises(GuardExceeded, match="mask_dup_spans"):
        mask_dup_spans(rd.from_pandas(docs), n=8,
                       dup_row_limit=2).to_pandas()


def test_sentence_stats_exact():
    import pandas as pd

    from cpg_ray.functions.text import sentence_stats

    b = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "One two. Three four! Five?  Six",
            "No terminal punctuation here",
            "",
            "Trailing. ",
        ],
    })
    out = sentence_stats(b).set_index("doc_id")
    assert out.loc[1, "n_sentences"] == 4
    assert out.loc[1, "max_chars"] == len("Three four")
    assert out.loc[2, "n_sentences"] == 1
    assert out.loc[3, "n_sentences"] == 0
    assert out.loc[3, "avg_chars"] == 0.0
    # trailing split yields an empty tail fragment, filtered identically
    # to the SQL side
    assert out.loc[4, "n_sentences"] == 1
    assert out.loc[4, "sum_chars"] == len("Trailing")


def test_bigram_features_exact_and_logprob():
    import math

    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import bigram_features

    texts = ["a b a b", "a b c", "x"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": texts}))
    out = bigram_features(docs).to_pandas().set_index("doc_id")
    # corpus bigrams: doc1: (a b),(b a),(a b); doc2: (a b),(b c)
    # counts: 'a b'->3, 'b a'->1, 'b c'->1; total=5
    assert 3 not in out.index  # single-token doc emits no row
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[1, "sum_bigram_freq"] == 3 + 1 + 3
    assert out.loc[1, "min_bigram_freq"] == 1
    assert out.loc[1, "n_hapax_bigrams"] == 1
    assert out.loc[2, "n_hapax_bigrams"] == 1
    expect_lp = (-math.log(3 / 5) * 2 - math.log(1 / 5)) / 3
    assert abs(out.loc[1, "avg_neg_logprob"] - expect_lp) < 1e-12


def test_bigram_xent_hand_computed_smoothed_lm():
    """CCNet-shape LM filter: hand-check the add-one-smoothed
    conditional cross-entropy on a 3-doc corpus (text.bigram_xent)."""
    import math

    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import bigram_xent

    texts = ["a b a b", "a b c", "x"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": texts}))
    out = bigram_xent(docs).to_pandas().set_index("doc_id")
    # vocab V = |{a,b,c,x}| = 4; bigram counts: 'a b'->3,'b a'->1,'b c'->1
    # first-token sums: c1(a)=3, c1(b)=2
    assert 3 not in out.index  # <2-token doc emits no row
    lp_ab = -math.log((3 + 1.0) / (3 + 4.0))
    lp_ba = -math.log((1 + 1.0) / (2 + 4.0))
    lp_bc = -math.log((1 + 1.0) / (2 + 4.0))
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "xent"]
               - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert out.loc[2, "n_bigrams"] == 2
    assert abs(out.loc[2, "xent"]
               - round((lp_ab + lp_bc) / 2, 6)) < 1e-9
    # fluent/redundant doc 1 scores LOWER xent than the rarer doc 2
    assert out.loc[1, "xent"] < out.loc[2, "xent"]


def test_kneser_ney_hand_computed_and_sums_to_one():
    """Interpolated KN bigram LM: hand-check discounted + continuation
    terms on a fixed corpus, and pin the KN completeness property —
    Σ_{w2 ∈ V} P_KN(w2|w1) = 1 when the continuation term extends over
    the whole vocabulary (text.kneser_ney_xent)."""
    import math

    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import kneser_ney_xent

    texts = ["a b a b", "a b c", "x b"]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": texts}))
    out = kneser_ney_xent(docs).to_pandas().set_index("doc_id")
    # bigram types: 'a b'(c=3), 'b a'(1), 'b c'(1), 'x b'(1) → T = 4
    # c1: a=3, b=2, x=1 ; N1+(a·)=1, N1+(b·)=2, N1+(x·)=1
    # cont: b=2 ('a b','x b'), a=1, c=1
    d = 0.75
    t = 4.0

    def p(c12, c1, n1p, cc):
        return ((c12 - d) / c1) + ((d * n1p) / c1) * (cc / t)

    lp_ab = -math.log(p(3, 3, 1, 2))
    lp_ba = -math.log(p(1, 2, 2, 1))
    lp_bc = -math.log(p(1, 2, 2, 1))
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "kn_xent"]
               - round((2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert out.loc[2, "n_bigrams"] == 2
    assert abs(out.loc[2, "kn_xent"]
               - round((lp_ab + lp_bc) / 2, 6)) < 1e-9
    # completeness over the vocab {a, b, c, x} for context w1='b':
    # observed ('b a','b c') use the full formula; unobserved get only
    # the continuation share — the interpolated mass sums to exactly 1
    cont = {"a": 1, "b": 2, "c": 1, "x": 0}
    total = sum(
        (max(({"a": 1, "c": 1}.get(w2, 0)) - d, 0) / 2)
        + ((d * 2) / 2) * (cont[w2] / t)
        for w2 in ["a", "b", "c", "x"])
    assert abs(total - 1.0) < 1e-12


# ---- duplicate_spans (ExactSubstr cut list) ---------------------------------


def test_duplicate_spans_merges_intervals_and_counts_multiplicity():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(10))     # 10-token dup run
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            f"u1 u2 {shared} u3 u4",                  # dup at pos 2..11
            f"{shared} v1 v2 v3 v4 v5 v6 v7 v8",      # dup at pos 0..9
            # within-doc repeat: the same 8 tokens twice in ONE doc
            " ".join(f"w{i}" for i in range(8)) + " zzz "
            + " ".join(f"w{i}" for i in range(8)),
        ],
    })
    got = duplicate_spans(rd.from_pandas(docs), n=8).to_pandas()
    got = got.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    # doc 1: starts 2,3,4 covered -> one maximal span [2, 11]
    r1 = got[got.doc_id == 1]
    assert [(r.span_start, r.span_end, r.span_tokens)
            for r in r1.itertuples()] == [(2, 11, 10)]
    r2 = got[got.doc_id == 2]
    assert [(r.span_start, r.span_end, r.span_tokens)
            for r in r2.itertuples()] == [(0, 9, 10)]
    # doc 3: within-doc multiplicity counts; two spans [0,7] and [9,16]
    r3 = got[got.doc_id == 3]
    assert [(r.span_start, r.span_end, r.span_tokens)
            for r in r3.itertuples()] == [(0, 7, 8), (9, 16, 8)]

    # broadcast-probe path and the hash-join fallback agree
    forced = duplicate_spans(rd.from_pandas(docs), n=8,
                             dup_broadcast_limit=0).to_pandas()
    forced = forced.sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, forced, check_dtype=False)

    # unique corpus -> no spans at all
    uniq = pd.DataFrame({"doc_id": [7],
                         "text": " ".join(f"q{i}" for i in range(20))})
    assert len(duplicate_spans(
        rd.from_pandas(uniq), n=8).to_pandas()) == 0


def test_c4_rules_fixture():
    """Hand-built fixture pins every C4 rule: terminal punctuation,
    min words per line, min kept lines, lorem-ipsum and brace drops."""
    import pandas as pd

    from cpg_ray.functions.text import c4_rules

    docs = pd.DataFrame({
        "url": ["a", "b", "c", "d"],
        "text": [
            # 3 good lines -> kept
            "one two three four five.\nsix seven eight nine ten!\n"
            'eleven twelve thirteen fourteen "quote."',
            # good lines but contains a brace -> doc dropped,
            # kept_text still reports the surviving lines
            "one two three four five.\nheader\n{ code }\n"
            "six seven eight nine ten.\na b c d e f?",
            # only 2 surviving lines -> dropped (min_kept_lines=3)
            "one two three four five.\nshort line.\n"
            "no terminal punctuation here at all\n"
            "four words only here.",
            # Lorem Ipsum (case-insensitive) -> dropped
            "Lorem IPSUM dolor sit amet consectetur.\n"
            "one two three four five.\nsix seven eight nine ten.\n"
            "a b c d e f.",
        ],
    })
    out = c4_rules(docs)
    assert out.keep.tolist() == [True, False, False, False]
    assert out.n_kept.tolist() == [3, 3, 1, 4]
    # line order preserved; non-qualifying lines gone
    assert out.kept_text[0].count("\n") == 2
    assert "header" not in out.kept_text[1]
    # "short line." has 2 words -> dropped; "four words only here." has 4
    assert out.kept_text[2] == "one two three four five."


def test_retrieval_eval_exact_integer_metrics():
    """Hand-computable: 4 docs, one query 'cat dog'.  Relevant docs
    contain BOTH tokens; 'catalog' must not count as 'cat' (word-
    boundary semantics = TOKEN_RE tokenization)."""
    from cpg_ray.functions.text import retrieval_eval

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "cat dog cat",            # relevant, high tf
            "dog park catalog",       # NOT relevant (catalog != cat)
            "the cat sat on the dog", # relevant
            "nothing here",           # irrelevant
        ]}))
    out = retrieval_eval(docs, {"q1": "cat dog"}, top_n=2)
    r = out.iloc[0]
    assert r["qid"] == "q1"
    assert r["n_rel"] == 2
    # BM25 retrieves docs mentioning either token; top-2 must include
    # at least one relevant doc at rank 1 (doc 1 has max tf)
    assert r["hits"] == 2 and r["first_rank"] == 1
    assert r["mrr_x2520"] == 2520
    assert r["precision_bp"] == 10000
    assert r["recall_bp"] == 10000
    for c in ("n_rel", "hits", "first_rank", "mrr_x2520",
              "precision_bp", "recall_bp"):
        assert str(out[c].dtype) == "int64"


def test_retrieval_eval_no_relevant_docs():
    from cpg_ray.functions.text import retrieval_eval

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["cat only", "dog only"]}))
    out = retrieval_eval(docs, {"q1": "cat dog"}, top_n=2)
    r = out.iloc[0]
    assert r["n_rel"] == 0 and r["hits"] == 0
    assert r["first_rank"] == 0 and r["mrr_x2520"] == 0
    assert r["recall_bp"] == 0


# ---------------------------------------------------------------
# DIPRE bootstrapped pattern induction (text.dipre_bootstrap)
# ---------------------------------------------------------------

def _dipre_corpus():
    """Round 1 induces ' works for '; the extracted pairs co-occur in
    fresh ' serves at ' sentences, so round 2 induces THAT pattern and
    extracts a brand-new pair (bootstrap actually fires)."""
    seeds = [("Ada One", "Acme Corp"), ("Bob Two", "Beta Inc"),
             ("Cid Three", "Gamma Ltd")]
    pages, facts = [], []
    for i, (a, b) in enumerate(seeds):
        url = f"http://s{i}/p"
        pages.append((url, f"Intro text here. {a} works for {b}. End."))
        facts.append((url, a, b))
    # the extracted pairs reappear under a second relation phrase
    for i, (a, b) in enumerate(seeds):
        pages.append((f"http://t{i}/p",
                      f"Filler line. {a} serves at {b}. More filler."))
    # a pair NEVER seen as a seed, only reachable via round-2 pattern
    pages.append(("http://u0/p",
                  "Opening words. Dan Four serves at Delta LLC. Tail."))
    return (
        rd.from_pandas(pd.DataFrame(pages, columns=["url", "text"])),
        rd.from_pandas(pd.DataFrame(facts, columns=["url", "a", "b"])),
    )


def test_dipre_two_round_bootstrap_extracts_new_pair():
    from cpg_ray.functions.text import dipre_bootstrap

    pages, facts = _dipre_corpus()
    out = dipre_bootstrap(pages, facts, rounds=2, min_support=3,
                          max_patterns=5)
    r1 = out[out["round"] == 1]
    assert set(r1["pattern"]) == {" works for "}
    assert ("Ada One", "Acme Corp") in set(zip(r1["a"], r1["b"]))
    r2 = out[out["round"] == 2]
    assert set(r2["pattern"]) == {" serves at "}
    # the genuinely new pair arrives only through the round-2 pattern
    assert ("Dan Four", "Delta LLC") in set(zip(r2["a"], r2["b"]))
    # round 2 reports only pairs round 1 did not already know
    assert not (set(zip(r2["a"], r2["b"]))
                & set(zip(r1["a"], r1["b"])))


def test_dipre_support_threshold_and_sentence_boundary():
    from cpg_ray.functions.text import dipre_bootstrap

    # only 2 seed pairs share the infix -> below min_support=3 ->
    # nothing induced; also an infix crossing '.' never qualifies
    pages = rd.from_pandas(pd.DataFrame([
        ("http://a/p", "Ada One works for Acme Corp."),
        ("http://b/p", "Bob Two works for Beta Inc."),
        ("http://c/p", "Cid Three is here. Gamma Ltd elsewhere."),
    ], columns=["url", "text"]))
    facts = rd.from_pandas(pd.DataFrame([
        ("http://a/p", "Ada One", "Acme Corp"),
        ("http://b/p", "Bob Two", "Beta Inc"),
        ("http://c/p", "Cid Three", "Gamma Ltd"),
    ], columns=["url", "a", "b"]))
    out = dipre_bootstrap(pages, facts, rounds=2, min_support=3)
    assert out.empty


def test_dipre_broadcast_and_hash_join_grounding_agree():
    from cpg_ray.functions.text import dipre_bootstrap

    # the guarded seed-grounding paths (broadcast url→pairs probe vs
    # distributed hash_join) must induce identical bootstrap output
    pages, facts = _dipre_corpus()
    bcast = dipre_bootstrap(pages, facts, rounds=2, min_support=3,
                            max_patterns=5)
    pages, facts = _dipre_corpus()
    joined = dipre_bootstrap(pages, facts, rounds=2, min_support=3,
                             max_patterns=5, bcast_guard=0)
    pd.testing.assert_frame_equal(bcast.reset_index(drop=True),
                                  joined.reset_index(drop=True))


def test_dipre_uses_last_mention_before_object():
    from cpg_ray.functions.text import dipre_bootstrap

    # the lead mention (title style) must not stretch the infix: the
    # nearest prior mention of a is the one grounding the pattern
    pages = rd.from_pandas(pd.DataFrame([
        (f"http://{i}/p",
         f"{a} - Profile\nSome filler. {a} works for {b}. End.")
        for i, (a, b) in enumerate([
            ("Ada One", "Acme Corp"), ("Bob Two", "Beta Inc"),
            ("Cid Three", "Gamma Ltd")])
    ], columns=["url", "text"]))
    facts = rd.from_pandas(pd.DataFrame([
        ("http://0/p", "Ada One", "Acme Corp"),
        ("http://1/p", "Bob Two", "Beta Inc"),
        ("http://2/p", "Cid Three", "Gamma Ltd"),
    ], columns=["url", "a", "b"]))
    out = dipre_bootstrap(pages, facts, rounds=1, min_support=3)
    assert set(out["pattern"]) == {" works for "}


# ---------------------------------------------------------------
# Positional phrase search (text.phrase_search)
# ---------------------------------------------------------------

def test_phrase_search_adjacency_semantics():
    from cpg_ray.functions.text import phrase_search

    docs = rd.from_pandas(pd.DataFrame([
        # "big data" dominates the bigram counts (3 adjacent uses)
        (1, "big data big data big data"),
        (2, "big, data!  yes"),            # punctuation: still adjacent
        (3, "big red data"),               # intervening token: NO hit
        (4, "nothing relevant here"),
    ], columns=["doc_id", "text"]))
    out = phrase_search(docs, top_phrases=1)
    assert set(out["phrase"]) == {"big data"}
    assert set(out["doc_id"]) == {1, 2}


def test_phrase_search_deterministic_tiebreak_and_empty():
    from cpg_ray.functions.text import phrase_search

    docs = rd.from_pandas(pd.DataFrame([
        (1, "aa bb"), (2, "cc dd"),
    ], columns=["doc_id", "text"]))
    # both bigrams count 1 -> phrase ASC tiebreak picks "aa bb"
    out = phrase_search(docs, top_phrases=1)
    assert list(out["phrase"]) == ["aa bb"]
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"),
         "text": pd.Series(dtype="object")}))
    assert phrase_search(empty).empty


def test_readability_hand_computed_and_bands():
    import pandas as pd

    from cpg_ray.functions.text import readability

    # "The cat sat." -> words 3, sentences 1, vowel groups: e,a,a = 3
    # fre = 206835 - 1015*3//1 - 84600*3//3 = 206835 - 3045 - 84600
    #     = 119190 -> easy
    # "Extraordinary notwithstanding circumstances?!" -> words 3,
    # sentences 1 ('?!' is ONE run), vowel groups:
    # e,ao,i,a,y | o,i,a,i | i,u,a,e = 13
    # fre = 206835 - 3045 - 84600*13//3 = 206835-3045-366600 = -162810
    # empty text -> words 0, sentences 0, syllables 0:
    # fre = 206835 - 0//1 - 0//1 = 206835 (degenerate doc maxes out;
    # both engines agree by the max(·,1) clamps)
    b = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["The cat sat.",
                 "Extraordinary notwithstanding circumstances?!",
                 ""]})
    out = readability(b)
    assert out["words"].tolist() == [3, 3, 0]
    assert out["sentences"].tolist() == [1, 1, 0]
    assert out["syllables"].tolist() == [3, 13, 0]
    assert out["fre_milli"].tolist() == [119190, -162810, 206835]
    assert out["band"].tolist() == ["easy", "very_difficult", "easy"]
    # band thresholds are inclusive at 70000/50000/30000
    import numpy as np

    scores = pd.DataFrame({"doc_id": [1], "text": ["a"]})
    got = readability(scores)
    assert got["band"].dtype == object
