"""Unit tests for the training-data operator families: dedup,
similarity, text analysis, multimodal plumbing, graph queries, as-of
join."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


# ---- dedup ----------------------------------------------------------------


def test_exact_dedup_finds_injected_copies():
    from cpg_ray.functions.dedup import exact_dedup

    base = _docs()[["doc_id", "text"]]
    dup = base.head(20).copy()
    dup["doc_id"] += 1_000_000  # identical text, higher id
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    out = exact_dedup(ds).to_pandas()
    assert len(out) == len(base)  # copies collapsed
    dup_rows = out[out.n_copies == 2]
    assert len(dup_rows) == 20
    assert (dup_rows.doc_id < 1_000_000).all()  # min id kept


def test_minhash_near_dedup_recall_precision():
    from cpg_ray.functions.dedup import near_dedup_minhash

    base = _docs()[["doc_id", "text"]].head(200)
    dup = base[base.doc_id % 10 == 0].copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    survivors, pairs, cmap = near_dedup_minhash(ds, verify_threshold=0.6)
    sdf = survivors.to_pandas()
    # every injected near-copy must be dropped (paired with its source)
    injected = set(dup.doc_id)
    assert injected.isdisjoint(set(sdf.doc_id))
    # all originals with no genuine planted dup survive — allow the
    # corpus's own planted near-dups (text ending in the 'dup' marker)
    assert len(sdf) <= len(base)
    # verified pairs really are similar
    from cpg_ray.functions.dedup import jaccard

    texts = dict(zip(
        pd.concat([base, dup]).doc_id, pd.concat([base, dup]).text
    ))
    for a, b in zip(pairs.a.head(20), pairs.b.head(20)):
        assert jaccard(texts[int(a)], texts[int(b)]) > 0.4


def test_minhash_jaccard_verify_mode():
    """Exact-Jaccard verification kills borderline pairs the signature
    estimate lets through, and keeps true near-dups."""
    from cpg_ray.functions.dedup import near_dedup_minhash

    base = _docs()[["doc_id", "text"]].head(150)
    dup = base[base.doc_id % 10 == 0].copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    _s, pairs, _c = near_dedup_minhash(ds, verify_threshold=0.8,
                                       verify="jaccard")
    assert "jaccard" in pairs.columns
    assert (pairs.jaccard >= 0.8).all()
    injected = {(int(i), int(i) + 1_000_000) for i in dup.doc_id - 1_000_000}
    got = {(min(int(a), int(b)), max(int(a), int(b)))
           for a, b in zip(pairs.a, pairs.b)}
    assert injected <= got


def test_simhash_separates_near_dups_from_random():
    from cpg_ray.functions.dedup import simhash_pairs, simhash_signatures

    base = _docs()[["doc_id", "text"]].head(100)
    # exclude the corpus's planted near-dups (marker token 'dup')
    base = base[~base.text.str.contains(r"\bdup\b")].reset_index(drop=True)
    dup = base.head(10).copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    sigs = simhash_signatures(ds).materialize()
    pairs = simhash_pairs(sigs, max_hamming=6)
    got = {(min(int(a), int(b)), max(int(a), int(b)))
           for a, b in zip(pairs.a, pairs.b)}
    expected = {(int(i) - 1_000_000, int(i)) for i in dup.doc_id}
    # nearly all injected near-dup pairs found (short docs can flip
    # more bits); false-positive volume bounded
    assert len(expected & got) >= 9, expected - got
    assert len(got) <= len(expected) + 15, len(got)


def test_embedding_near_dup():
    from cpg_ray.functions.dedup import embedding_near_dup_pairs

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()[
        ["vec_id", "embedding"]
    ].head(100)
    dup = emb.head(5).copy()
    dup["vec_id"] += 1_000_000
    ds = rd.from_pandas(pd.concat([emb, dup], ignore_index=True))
    pairs = embedding_near_dup_pairs(ds, threshold=0.999)
    got = {(int(a), int(b)) for a, b in zip(pairs.a, pairs.b)}
    for i in range(5):
        assert (i, i + 1_000_000) in got


# ---- similarity -----------------------------------------------------------


def test_knn_bruteforce_exact():
    from cpg_ray.functions.similarity import knn_bruteforce

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.stack(emb.head(2).embedding)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]])
    top = knn_bruteforce(ds, q, k=5)
    # numpy reference
    v = np.stack(emb.embedding).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = vn @ qn.T
    for qi in range(2):
        ref_ids = emb.vec_id.values[np.argsort(-sim[:, qi], kind="stable")[:5]]
        got = top[top.query_id == qi].sort_values("rank").vec_id.values
        assert set(got) == set(ref_ids)
        assert got[0] == emb.vec_id.iloc[qi]  # self is nearest


def test_knn_lsh_recall():
    from cpg_ray.functions.similarity import knn_bruteforce, knn_lsh

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.stack(emb.head(3).embedding)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]])
    exact = knn_bruteforce(ds, q, k=10)
    # random embeddings are the ANN worst case: short codes + many
    # repetitions buy recall (4 planes × 12 reps ≈ 0.84 expected)
    approx, n_cand = knn_lsh(ds, q, k=10, n_planes=4, reps=12)
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.55  # tunable-recall ANN
    assert n_cand < 0.9 * 3 * len(emb)  # actually pruned vs brute force


def test_knn_ivf_recall():
    from cpg_ray.functions.similarity import knn_bruteforce, knn_ivf

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.stack(emb.head(3).embedding)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]])
    exact = knn_bruteforce(ds, q, k=10)
    approx, n_cand = knn_ivf(ds, q, k=10, n_clusters=8, nprobe=3)
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5
    assert n_cand < 0.9 * 3 * len(emb)  # probes prune the corpus


def test_knn_pq_recall_and_compression():
    from cpg_ray.functions.similarity import (knn_bruteforce, knn_pq,
                                              train_pq_codebooks)

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.stack(emb.head(3).embedding)
    ds = rd.from_pandas(emb[["vec_id", "embedding"]])
    exact = knn_bruteforce(ds, q, k=10)
    approx, n_cand = knn_pq(ds, q, k=10, m=4, ks=16, refine=8)
    recalls = []
    for qi in range(3):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5
    # reported cosines of the refined candidates are EXACT (re-ranked)
    merged = approx.merge(exact, on=["query_id", "vec_id"],
                          suffixes=("_pq", "_bf"))
    assert np.allclose(merged.cosine_pq, merged.cosine_bf)
    # determinism: codebooks retrain identically
    b1 = train_pq_codebooks(ds, m=4, ks=16)
    b2 = train_pq_codebooks(rd.from_pandas(emb[["vec_id", "embedding"]]),
                            m=4, ks=16)
    assert np.array_equal(b1, b2)
    # dims must divide m
    import pytest as _pytest
    with _pytest.raises(ValueError):
        train_pq_codebooks(ds, m=7)
    # self vector always found (its cluster is the nearest probe)
    for qi in range(3):
        assert emb.vec_id.iloc[qi] in set(approx[approx.query_id == qi].vec_id)


# ---- text -----------------------------------------------------------------


def test_langid_accuracy():
    """On text whose language is real (our generated pages — the
    testdata documents table's `lang` column is a random label over an
    all-English vocabulary, useless as langid ground truth)."""
    from cpg_ray.functions.text import langid
    from cpg_ray.pagegen import cfg_for_variant, render_page

    w = cfg_for_variant("basic").build()
    rows = [render_page(w, i, "basic") for i in range(120)]
    df = pd.DataFrame(
        {"lang": [r["lang"] for r in rows], "text": [r["text"] for r in rows]}
    )
    out = langid(df)
    acc = (out.pred_lang == out.lang).mean()
    assert acc >= 0.8, f"langid accuracy {acc}"


def test_fingerprint_deterministic_and_shift_stable():
    from cpg_ray.functions.text import _doc_fingerprint

    t = "the quick brown fox jumps over the lazy dog " * 5
    assert _doc_fingerprint(t) == _doc_fingerprint(t)
    # winnowing min-hash is stable under prefix insertion (the minimum
    # window usually survives)
    assert _doc_fingerprint("XY " + t) == _doc_fingerprint(t)


# ---- multimodal -----------------------------------------------------------


def test_multimodal_decode_plumbing():
    from cpg_ray.functions.multimodal import (
        DecodeImage,
        decode_features,
        synthesize_media,
    )

    media = synthesize_media(50)
    feats = decode_features(rd.from_arrow(media)).to_pandas()
    assert len(feats) == 50
    assert feats.ok.all()
    assert feats.px_mean.between(0, 255).all()
    # binary column not carried forward
    assert "media" not in feats.columns
    # fake=False takes the genuine tier (builtin pure-numpy codecs):
    # the synthetic junk payloads are not parseable containers, so
    # every row routes to a problem row instead of a fake decode
    strict = DecodeImage(fake=False)(media).to_pandas()
    assert not strict.ok.any()


# ---- as-of join -----------------------------------------------------------


def test_asof_join_matches_pandas():
    from cpg_ray.functions.relational import asof_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 50),
            "ts": pd.to_datetime(rng.randint(0, 10_000, 50), unit="s"),
            "lid": np.arange(50),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 80),
            "ts": pd.to_datetime(rng.randint(0, 10_000, 80), unit="s"),
            "val": rng.randn(80),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="k", on="ts", right_value_cols=["val"],
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort")[["k", "ts", "val"]],
        on="ts", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(want)
    lw = want.set_index("lid")["val"]
    lg = got.set_index("lid")["val_asof"]
    for lid in want.lid:
        a, b = lw[lid], lg[lid]
        assert (pd.isna(a) and pd.isna(b)) or a == b, lid


def test_link_with_empty_dictionary_infers_everything():
    import pyarrow as pa
    import ray

    from cpg_ray.stages.link import build_norm_index, make_link_fn

    ref = ray.put(build_norm_index([]))
    batch = pa.table(
        {
            "subj_norm": ["ada verne"], "obj_norm": ["acme labs"],
            "pred": ["works_for"], "url": ["u"], "span_start": [0],
            "subj_surface": ["x"], "obj_surface": ["y"],
        }
    )
    out = make_link_fn(ref)(batch).to_pandas()
    assert list(out.subj) == ["inf:ada verne"]
    assert list(out.obj) == ["inf:acme labs"]
    assert out.subj_is_inferred.all() and out.obj_is_inferred.all()


def test_simhash_skip_stats_folded_single_pass():
    """Hot band buckets are skipped AND counted inside the same per-band
    pass (no second scan); the skip volume surfaces in pairs.attrs."""
    from cpg_ray.functions.dedup import simhash_pairs, simhash_signatures

    base = _docs()[["doc_id", "text"]].head(60)
    clones = []
    for r in range(20):  # 20 identical texts → identical signatures →
        c = base.head(1).copy()  # one bucket of 21 members per band
        c["doc_id"] += 2_000_000 + r
        clones.append(c)
    ds = rd.from_pandas(pd.concat([base] + clones, ignore_index=True))
    sigs = simhash_signatures(ds).materialize()
    pairs = simhash_pairs(sigs, max_hamming=3, max_bucket=10)
    assert pairs.attrs["skipped_buckets"] >= 4  # all 4 bands hot
    assert pairs.attrs["skipped_members"] >= 4 * 21
    # the clone pairs only met in skipped buckets → not reported as pairs
    clone_ids = {2_000_000 + r for r in range(20)}
    assert not any(int(a) in clone_ids and int(b) in clone_ids
                   for a, b in zip(pairs.a, pairs.b))


def test_embedding_skip_stats_folded_single_pass():
    from cpg_ray.functions.dedup import embedding_near_dup_pairs

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()[
        ["vec_id", "embedding"]
    ].head(40)
    clones = []
    for r in range(12):  # 12 clones of vec 0 → one hot bucket (13 > 8)
        c = emb.head(1).copy()
        c["vec_id"] += 2_000_000 + r
        clones.append(c)
    ds = rd.from_pandas(pd.concat([emb] + clones, ignore_index=True))
    pairs = embedding_near_dup_pairs(ds, threshold=0.999, max_bucket=8)
    assert pairs.attrs["skipped_buckets"] >= 1
    assert pairs.attrs["skipped_members"] >= 13
    clone_ids = {2_000_000 + r for r in range(12)}
    assert not any(int(a) in clone_ids and int(b) in clone_ids
                   for a, b in zip(pairs.a, pairs.b))


def test_exact_ngram_auto_degrades_and_sampling_is_exact():
    """The gram groupby must complete past a tiny driver limit (auto →
    shuffle) with identical results, and hash-mod gram sampling keeps a
    deterministic key subset with EXACT per-gram counts."""
    import zlib

    from cpg_ray.functions.dedup import exact_ngram_dup_counts

    docs = _docs()[["doc_id", "text"]].head(80)
    dup = docs.head(10).copy()
    dup["doc_id"] += 1_000_000
    ds = rd.from_pandas(pd.concat([docs, dup], ignore_index=True))
    full = exact_ngram_dup_counts(ds, n=8).to_pandas()
    tiny = exact_ngram_dup_counts(
        ds, n=8, driver_key_limit=50
    ).to_pandas()  # guard trips → shuffle fallback, same result
    a = full.sort_values(["gram"]).reset_index(drop=True)
    b = tiny.sort_values(["gram"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    k = 4
    sampled = exact_ngram_dup_counts(ds, n=8, sample_mod=k).to_pandas()
    assert (sampled.gram_sample_mod == k).all()
    expect = full[[zlib.crc32(g.encode()) % k == 0 for g in full.gram]]
    got = sampled.drop(columns="gram_sample_mod")
    pd.testing.assert_frame_equal(
        expect.sort_values("gram").reset_index(drop=True),
        got.sort_values("gram").reset_index(drop=True),
        check_dtype=False,
    )


def test_driver_row_limit_raises_before_collecting():
    import pytest
    import ray.data as rd

    from cpg_ray.functions.relational import distinct_on, grouped_topk

    df = pd.DataFrame({"g": np.arange(5000) % 500, "v": np.arange(5000)})
    ds = rd.from_pandas(df)
    # explicit mode="driver" still raises at the guard (the default
    # mode="auto" degrades to shuffle instead — test_modes_equivalence)
    with pytest.raises(RuntimeError, match="driver_row_limit"):
        grouped_topk(ds, ["g"], "v", 3, mode="driver",
                     driver_row_limit=100).to_pandas()
    with pytest.raises(RuntimeError, match="driver_row_limit"):
        distinct_on(ds, ["g"], mode="driver",
                    driver_row_limit=100).to_pandas()


def test_contamination_counts_flags_injected_overlap():
    """A train doc sharing a long verbatim span with a benchmark doc is
    flagged with the exact distinct-gram overlap count; clean docs = 0."""
    import ray

    from cpg_ray.functions.text import contamination_counts, word_ngram_set

    docs = _docs()[["doc_id", "text"]].head(40)
    bench = docs.head(5)
    grams = frozenset().union(*(word_ngram_set(t, 8) for t in bench.text))
    # train: 30 clean docs + one that embeds bench doc 0's text verbatim
    train = docs.iloc[10:40].copy()
    leak = pd.DataFrame({"doc_id": [999_000],
                         "text": ["prefix words " + bench.text.iloc[0]]})
    ds = rd.from_pandas(pd.concat([train, leak], ignore_index=True))
    out = contamination_counts(ds, ray.put(grams), n=8).to_pandas()
    got = out.set_index("doc_id").n_contaminated
    expected_leak = len(
        word_ngram_set("prefix words " + bench.text.iloc[0], 8) & grams
    )
    assert got.loc[999_000] == expected_leak > 0
    # the corpus plants near-dups ('dup' marker) — clean docs are those
    # sharing no 8-gram with the bench slice
    clean = [d for d, t in zip(train.doc_id, train.text)
             if not (word_ngram_set(t, 8) & grams)]
    assert clean and (got.loc[clean] == 0).all()


def test_ngram_jaccard_pairs_exact_vs_quadratic():
    """The distributed gram-self-join operator reproduces the quadratic
    per-pair Jaccard exactly (recall 1.0 by construction), and
    max_doc_freq only ever removes grams — never invents pairs."""
    from cpg_ray.functions.dedup import ngram_jaccard_pairs

    base = _docs()[["doc_id", "text"]].head(120)
    dup = base[base.doc_id % 10 == 0].copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    corpus = pd.concat([base, dup], ignore_index=True)
    ds = rd.from_pandas(corpus)
    got = ngram_jaccard_pairs(ds, n=8, threshold=0.5).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)

    # quadratic reference on the driver (tiny corpus)
    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 8]) for i in range(len(toks) - 7)}
    sets = {int(d): grams(t) for d, t in zip(corpus.doc_id, corpus.text)}
    ids = sorted(sets)
    want = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            union = len(sets[a] | sets[b])
            if inter / union >= 0.5:
                want.append((a, b, inter, union))
    want_df = pd.DataFrame(want, columns=["a", "b", "inter", "union"])
    assert len(got) == len(want_df) > 0
    pd.testing.assert_frame_equal(
        got[["a", "b", "inter", "union"]].astype("int64"),
        want_df.astype("int64"),
    )
    # every injected near-copy is paired with its source
    paired = set(zip(got.a, got.b))
    for d in dup.doc_id:
        assert (int(d - 1_000_000), int(d)) in paired

    # max_doc_freq drops high-frequency grams: result is a subset with
    # jaccard computed over the REDUCED gram sets (declared approx)
    capped = ngram_jaccard_pairs(
        ds, n=8, threshold=0.5, max_doc_freq=1
    ).to_pandas()
    assert len(capped) == 0  # freq=1 grams can never be shared


def test_tfidf_topk_modes_agree_and_guard():
    """Broadcast and join TF-IDF paths produce identical top-k rows;
    mode='auto' degrades to the join past the vocabulary guard with the
    same result; scores match a direct numpy computation."""
    import ray.data as rd

    from cpg_ray.functions.relational import GuardExceeded
    from cpg_ray.functions.text import tfidf_topk

    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(8)],
        "text": [
            "apple banana apple cherry",
            "banana banana cherry dog",
            "dog emu dog emu fig",
            "fig grape apple fig fig",
            "grape grape banana emu",
            "cherry dog apple grape",
            "emu fig cherry banana dog",
            "apple apple apple grape emu",
        ],
    })
    ds = rd.from_pandas(docs)

    def norm(df):
        return (df.sort_values(["doc_id", "tfidf", "tok"],
                               ascending=[True, False, True])
                .reset_index(drop=True)[["doc_id", "tok", "tf", "tfidf"]]
                .astype({"tf": "int64"}))

    a = norm(tfidf_topk(ds, k=2, mode="broadcast").to_pandas())
    b = norm(tfidf_topk(ds, k=2, mode="join").to_pandas())
    pd.testing.assert_frame_equal(a, b)
    c = norm(tfidf_topk(ds, k=2, mode="auto",
                        driver_term_limit=3).to_pandas())
    pd.testing.assert_frame_equal(a, c)
    with pytest.raises(GuardExceeded):
        tfidf_topk(ds, k=2, mode="broadcast", driver_term_limit=3)

    # direct check on one doc: d7 = apple x3, grape, emu (8 docs total)
    tf = {"apple": 3, "grape": 1, "emu": 1}
    dfreq = {"apple": 4, "grape": 4, "emu": 4}
    want = {t: tf[t] * np.log(8 / dfreq[t]) for t in tf}
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    got = a[a.doc_id == "d7"]
    assert list(got.tok) == [t for t, _ in top]
    assert np.allclose(got.tfidf, [round(s, 6) for _, s in top])


def test_hash_sample_deterministic_and_rate_monotone():
    """hash_sample keeps the exact md5-prefix rule rows (hand-checked),
    is idempotent across runs, nests monotonically in the rate, and
    applies per-group rates."""
    import hashlib

    import ray.data as rd

    from cpg_ray.functions.relational import hash_sample

    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "lang": ["en", "de", "fr", "sv"] * 500,
    })
    ds = rd.from_pandas(df)
    a = hash_sample(ds, "doc_id", rate=0.2).to_pandas()
    b = hash_sample(rd.from_pandas(df), "doc_id", rate=0.2).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    # exact rule
    want = {i for i in range(2000)
            if hashlib.md5(str(i).encode()).hexdigest()[:4]
            < format(int(0.2 * 65536), "04x")}
    assert set(a.doc_id) == want
    assert abs(len(a) / 2000 - 0.2) < 0.05
    # monotone nesting: the 10% sample is a subset of the 20% one
    small = hash_sample(rd.from_pandas(df), "doc_id", rate=0.1).to_pandas()
    assert set(small.doc_id) <= set(a.doc_id)
    # per-group rates
    g = hash_sample(rd.from_pandas(df), "doc_id", rate=0.05,
                    group_col="lang", rates={"en": 0.6}).to_pandas()
    en = g[g.lang == "en"]
    rest = g[g.lang != "en"]
    assert len(en) > len(rest)
    assert abs(len(en) / 500 - 0.6) < 0.1
    with pytest.raises(ValueError):
        hash_sample(ds, "doc_id", rates={"en": 0.5})


def test_bm25_topk_modes_agree():
    """Broadcast and join BM25 paths produce identical rows; auto
    degrades past the vocabulary guard; a hand-computed score checks
    the Robertson-idf formula."""
    import ray.data as rd

    from cpg_ray.functions.text import bm25_topk

    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(6)],
        "text": [
            "apple banana apple",
            "banana cherry banana dog banana",
            "dog emu dog",
            "emu fig apple apple fig",
            "grape cherry dog grape",
            "fig grape emu cherry",
        ],
    })
    ds = rd.from_pandas(docs)

    def norm(df):
        return (df.sort_values(["doc_id", "bm25", "tok"],
                               ascending=[True, False, True])
                .reset_index(drop=True)[["doc_id", "tok", "tf", "bm25"]]
                .astype({"tf": "int64"}))

    a = norm(bm25_topk(ds, k=2, mode="broadcast").to_pandas())
    b = norm(bm25_topk(ds, k=2, mode="join").to_pandas())
    pd.testing.assert_frame_equal(a, b)
    c = norm(bm25_topk(ds, k=2, mode="auto",
                       driver_term_limit=2).to_pandas())
    pd.testing.assert_frame_equal(a, c)

    # hand check one cell: d0/apple — tf=2, df(apple)=2, N=6, dl=3,
    # avgdl = (3+5+3+5+4+4)/6 = 24/6
    n, df_t, tf, dl, avgdl, k1, bb = 6, 2, 2.0, 3.0, 24 / 6, 1.2, 0.75
    idf = np.log((n - df_t + 0.5) / (df_t + 0.5) + 1)
    want = idf * ((tf * (k1 + 1))
                  / (tf + k1 * (1 - bb + (bb * dl) / avgdl)))
    got = a[(a.doc_id == "d0") & (a.tok == "apple")].bm25.iloc[0]
    assert abs(got - round(want, 6)) < 1e-12


def test_bm25_search_ranks_relevant_doc_first():
    import ray.data as rd

    from cpg_ray.functions.text import bm25_search

    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(20)],
        "text": (["filler words only nothing relevant here"] * 19
                 + ["stream batch stream batch window stream"]),
    })
    out = bm25_search(
        rd.from_pandas(docs), {"q0": "stream batch"}, top_n=3
    ).to_pandas().sort_values("score", ascending=False)
    assert out.iloc[0][["qid", "doc_id"]].tolist() == ["q0", "d19"]
    # only d19 contains any query term
    assert len(out) == 1
    # no matching terms anywhere -> empty result with stable schema
    empty = bm25_search(
        rd.from_pandas(docs), {"qz": "zzz qqq"}, top_n=3
    ).to_pandas()
    assert len(empty) == 0


def test_pii_scrub_counts_and_redaction():
    from cpg_ray.functions.text import pii_scrub

    b = pd.DataFrame({"text": [
        "mail a@b.co and x.y+z@ex.ample.org now",
        "call 555-123-4567 or 555.987.6543 from 10.0.0.1",
        "no pii here",
        "edge: v1.2.3.4 has no word boundary before the first digit",
    ]})
    r = pii_scrub(b)
    assert list(r.n_email) == [2, 0, 0, 0]
    assert list(r.n_phone) == [0, 2, 0, 0]
    # \b can't sit between 'v' and '1' (both word chars) — version-like
    # strings do NOT match, identically in Python re and DuckDB RE2.
    assert list(r.n_ipv4) == [0, 1, 0, 0]
    assert r.redacted[0] == "mail <EMAIL> and <EMAIL> now"
    assert r.redacted[1] == "call <PHONE> or <PHONE> from <IP>"
    assert r.redacted[2] == "no pii here"
    # original column untouched
    assert (r.text == b.text).all()


def test_partitioned_rank_matches_pandas_rank():
    from cpg_ray.functions.relational import partitioned_rank

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "part": rng.choice(list("abc"), 500),
        "val": rng.integers(0, 20, 500),   # heavy ties → RANK gaps
        "rid": np.arange(500),
    })
    for dense in (False, True):
        for desc in (False, True):
            got = partitioned_rank(
                rd.from_pandas(df), ["part"], "val",
                descending=desc, dense=dense,
            ).to_pandas().sort_values("rid").reset_index(drop=True)
            want = (df.groupby("part")["val"]
                    .rank(method="dense" if dense else "min",
                          ascending=not desc).astype("int64").values)
            assert (got["rnk"].values == want).all(), (dense, desc)


def test_hash_join_empty_safe_chains_and_outer():
    """Ray 2.49 Dataset.join raises ArrowInvalid when one side is a
    completely empty dataset — including the output of an upstream
    join that matched nothing.  empty_safe=True short-circuits with
    the correct join semantics."""
    from cpg_ray.functions.relational import hash_join

    a = pd.DataFrame({"k": [1, 2, 3], "x": [1, 2, 3]})
    b = pd.DataFrame({"k": [9], "y": [0]})
    c = pd.DataFrame({"x": [1, 2], "z": [5, 6]})
    # chained join over an empty intermediate (the crash case)
    j1 = hash_join(rd.from_pandas(a), rd.from_pandas(b), on="k",
                   empty_safe=True)
    j2 = hash_join(j1, rd.from_pandas(c), on="x", empty_safe=True)
    j2m = j2.materialize()
    assert j2m.count() == 0
    # (Ray's to_pandas drops columns on any all-empty dataset, so the
    # joined schema is asserted at the block level)
    from cpg_ray.functions.relational import _block_schema
    assert set(_block_schema(j2m).names) == {"k", "x", "y", "z"}
    # left_outer with an empty right: left rows null-extended
    lo = hash_join(rd.from_pandas(c), j1, on="x", how="left_outer",
                   empty_safe=True).to_pandas()
    assert len(lo) == 2 and lo["k"].isna().all() and lo["y"].isna().all()
    assert sorted(lo.z) == [5, 6]
    # right_outer with an empty left: right rows null-extended
    ro = hash_join(j1, rd.from_pandas(c), on="x", how="right_outer",
                   empty_safe=True).to_pandas()
    assert len(ro) == 2 and ro["k"].isna().all() and ro["y"].isna().all()
    assert sorted(ro.x) == [1, 2]
    # left_outer with the EMPTY side on the left: no rows survive
    lo2 = hash_join(j1, rd.from_pandas(c), on="x", how="left_outer",
                    empty_safe=True)
    assert lo2.materialize().count() == 0
    # right_outer with the empty side on the right: no rows survive
    ro2 = hash_join(rd.from_pandas(c), j1, on="x", how="right_outer",
                    empty_safe=True)
    assert ro2.materialize().count() == 0
    # non-empty path unchanged
    ok = hash_join(rd.from_pandas(a), rd.from_pandas(c), on="x",
                   empty_safe=True).to_pandas()
    assert len(ok) == 2


def test_rel_chain_empty_match_returns_empty():
    """A label/etype combination that matches nothing is a legitimate
    empty result, not a crash (rel_chain's j1-empty chained join)."""
    from cpg_ray.functions.graphquery import rel_chain

    nodes = pd.DataFrame({
        "node_id": [1, 2], "label": ["Mention", "Section"],
        "name": ["a", "s"]})
    edges = pd.DataFrame({
        "src_id": [2], "dst_id": [1], "etype": ["AST"], "url": ["u"]})
    # no such etype at all
    out = rel_chain(rd.from_pandas(nodes), rd.from_pandas(edges),
                    etype="NOPE", src_label="Section",
                    dst_label="Mention").to_pandas()
    assert len(out) == 0
    # etype exists but the src label matches no edge sources
    out2 = rel_chain(rd.from_pandas(nodes), rd.from_pandas(edges),
                     etype="AST", src_label="Mention",
                     dst_label="Section").to_pandas()
    assert len(out2) == 0


def test_cross_join_cartesian_and_guard():
    from cpg_ray.functions.relational import GuardExceeded, cross_join

    big = pd.DataFrame({"a": [1, 2, 3], "x": ["p", "q", "r"]})
    small = pd.DataFrame({"b": [10, 20], "x2": ["u", "v"]})
    got = cross_join(rd.from_pandas(big), small).to_pandas()
    assert len(got) == 6
    assert set(zip(got.a, got.b)) == {(i, j) for i in (1, 2, 3)
                                      for j in (10, 20)}
    # overlapping column names: the small side wins (documented)
    small2 = pd.DataFrame({"x": ["u"]})
    got2 = cross_join(rd.from_pandas(big), small2).to_pandas()
    assert list(got2.columns) == ["a", "x"] and (got2.x == "u").all()
    import pytest
    with pytest.raises(GuardExceeded):
        cross_join(rd.from_pandas(big),
                   pd.DataFrame({"b": range(10)}), driver_row_limit=5)


def test_chunk_documents_boundaries():
    """Chunk math at the edges: short doc → one chunk; exact-boundary
    doc → no empty trailing chunk; one-past-boundary → short final
    chunk carrying the overlap."""
    from cpg_ray.functions.text import chunk_documents

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["ab",                 # shorter than size
                 "x" * 200,            # exactly one window
                 "y" * 201,            # one char past: 2 chunks
                 "".join(chr(97 + i % 26) for i in range(430))],
    })
    out = chunk_documents(rd.from_pandas(docs), size=200,
                          overlap=50).to_pandas()
    g = out.set_index(["doc_id", "chunk_idx"]).chunk
    assert g[1, 0] == "ab" and (1,) not in {k[:1] for k in g.index
                                            if k[1] > 0 and k[0] == 1}
    assert len(out[out.doc_id == 2]) == 1 and g[2, 0] == "x" * 200
    two = out[out.doc_id == 3]
    assert len(two) == 2
    assert g[3, 1] == "y" * 51          # 50 overlap + 1 new char
    # stride reconstruction: concatenating non-overlap parts = text
    chunks = out[out.doc_id == 4].sort_values("chunk_idx").chunk.tolist()
    rebuilt = chunks[0] + "".join(c[50:] for c in chunks[1:])
    assert rebuilt == docs.text[3]
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(docs), size=50, overlap=50)


def test_pack_sequences_greedy_invariants():
    """Greedy packing: no bin over budget (except flagged singleton
    over-budget items), bins contiguous in walk order, and exact
    agreement with a scalar reference greedy per bucket."""
    from cpg_ray.functions.text import pack_sequences

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "item": np.arange(500),
        "n_tokens": rng.integers(1, 40, 500),
    })
    df.loc[7, "n_tokens"] = 150  # over-budget singleton
    budget = 64
    got = pack_sequences(
        rd.from_pandas(df), budget=budget, token_col="n_tokens",
        order_cols=["item"], n_buckets=4,
    ).to_pandas().sort_values("item").reset_index(drop=True)
    assert len(got) == 500
    assert bool(got.loc[got.item == 7, "over_budget"].iloc[0])
    assert not got.loc[got.item != 7, "over_budget"].any()
    sums = got[~got.over_budget].groupby("bin_id")["n_tokens"].sum()
    assert (sums <= budget).all()
    # scalar reference greedy per bucket
    got["__bk"] = got.bin_id // 1_000_000_000
    for bk, sub in got.groupby("__bk"):
        sub = sub.sort_values("item")
        ref_bins, cur, acc = [], 0, 0
        for t in np.minimum(sub.n_tokens.to_numpy(), budget):
            if acc + t > budget:
                cur += 1
                acc = 0
            ref_bins.append(cur)
            acc += t
        assert list(sub.bin_id - bk * 1_000_000_000) == ref_bins, bk


def test_partitioned_cume_matches_pandas():
    from cpg_ray.functions.relational import partitioned_cume

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "part": rng.choice(list("abc"), 400),
        "val": rng.integers(0, 15, 400),   # heavy ties
        "rid": np.arange(400),
    })
    # plus a single-row partition (the percent_rank 0.0 edge)
    df = pd.concat([df, pd.DataFrame(
        {"part": ["z"], "val": [3], "rid": [400]})], ignore_index=True)
    got = partitioned_cume(
        rd.from_pandas(df), ["part"], "val",
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    g = df.groupby("part")["val"]
    want_cume = g.transform(
        lambda s: s.rank(method="max") / len(s)).values
    n = g.transform("size").values
    rnk = g.transform(lambda s: s.rank(method="min")).values
    want_pr = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
    assert np.array_equal(got["cume_dist"].values, want_cume)
    assert np.array_equal(got["percent_rank"].values, want_pr)


def test_partitioned_ntile_row_number_and_tile_sizes():
    from cpg_ray.functions.relational import partitioned_ntile

    rng = np.random.default_rng(5)
    sizes = {"a": 10, "b": 7, "c": 3, "d": 1}   # 10%4=2, 7%4=3, n<k
    rows = [(p, int(v)) for p, n in sizes.items()
            for v in rng.permutation(n * 10)[:n]]
    df = pd.DataFrame(rows, columns=["part", "key"])
    got = partitioned_ntile(
        rd.from_pandas(df), ["part"], ["key"], 4,
    ).to_pandas().sort_values(["part", "key"]).reset_index(drop=True)
    for p, n in sizes.items():
        sub = got[got.part == p]
        # row_number is 1..n in key order
        assert list(sub.row_number) == list(range(1, n + 1))
        # SQL NTILE sizing: first n%k tiles get ceil, rest floor
        counts = sub.tile.value_counts().sort_index()
        k = 4
        want = [n // k + (1 if i < n % k else 0) for i in range(k)]
        want = [w for w in want if w > 0]
        assert list(counts.values) == want
        # tiles are contiguous runs in order
        assert (sub.tile.values == np.sort(sub.tile.values)).all()


def test_grouping_sets_cube_matches_pandas():
    from cpg_ray.functions.relational import (cube_sets, grouping_sets,
                                              rollup_sets)

    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "a": rng.choice(list("xy"), 300),
        "b": rng.choice(list("pqr"), 300),
        "v": rng.integers(0, 100, 300).astype("float64"),
    })
    assert rollup_sets(["a", "b"]) == [("a", "b"), ("a",), ()]
    assert set(cube_sets(["a", "b"])) == {("a", "b"), ("a",), ("b",), ()}
    got = grouping_sets(
        rd.from_pandas(df), ["a", "b"], cube_sets(["a", "b"]),
        [("v", "sum", "total"), ("v", "count", "n")])
    fine = df.groupby(["a", "b"], as_index=False).agg(
        total=("v", "sum"), n=("v", "count"))
    assert len(got) == len(fine) + 2 + 3 + 1
    grand = got[(got.a == "ALL") & (got.b == "ALL")]
    assert float(grand.total.iloc[0]) == float(df.v.sum())
    assert int(grand.n.iloc[0]) == 300
    bya = got[(got.a != "ALL") & (got.b == "ALL")].set_index("a")
    want_a = df.groupby("a")["v"].sum()
    for k in want_a.index:
        assert float(bya.loc[k, "total"]) == float(want_a[k])
    import pytest
    with pytest.raises(ValueError):
        grouping_sets(rd.from_pandas(df), ["a"], [("a",)],
                      [("v", "mean", "m")])


def test_ed1_pairs_matches_bruteforce_levenshtein():
    from cpg_ray.functions.dedup import ed1_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(3)
    alpha = list("ab1")  # tiny alphabet → dense distance-1 structure
    vocab = {"".join(rng.choice(alpha, rng.integers(1, 6)))
             for _ in range(120)}
    vocab |= {"", "x", "xy", "yx", "ab", "ba", "aab", "abb"}
    vs = sorted(vocab)
    want = sorted((a, b) for i, a in enumerate(vs) for b in vs[i + 1:]
                  if lev(a, b) <= 1)
    got = ed1_pairs(
        rd.from_pandas(pd.DataFrame({"s": vs * 2})), "s",  # dups collapse
    ).to_pandas()
    assert sorted(zip(got.a, got.b)) == want


def test_sorted_neighborhood_pairs_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(21)
    # duplicated keys + unique ids; enough rows to span several buckets
    keys = [f"name{int(x):03d}" for x in rng.integers(0, 120, 400)]
    df = pd.DataFrame({"k": keys, "i": np.arange(400)})
    for window in (1, 4):
        got = sorted_neighborhood_pairs(
            rd.from_pandas(df), key_col="k", id_col="i", window=window,
            mode="shuffle",
        ).to_pandas().astype({"dist": "int64"})
        drv = sorted_neighborhood_pairs(
            rd.from_pandas(df), key_col="k", id_col="i", window=window,
            mode="driver",
        ).to_pandas().astype({"dist": "int64"})
        pd.testing.assert_frame_equal(
            got.sort_values(["id_a", "id_b"]).reset_index(drop=True),
            drv.sort_values(["id_a", "id_b"]).reset_index(drop=True),
            check_dtype=False)
        ordered = df.sort_values(["k", "i"]).reset_index(drop=True)
        rows = []
        for d in range(1, window + 1):
            rows.append(pd.DataFrame({
                "id_a": ordered["i"][:len(ordered) - d].to_numpy(),
                "id_b": ordered["i"][d:].to_numpy(),
                "dist": np.int64(d)}))
        expect = (pd.concat(rows, ignore_index=True)
                  .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_events_transitions_matches_pandas_bruteforce():
    import pandas as pd
    import pyarrow.parquet as pq

    from cpg_ray.pipelines.queries import q_events_transitions

    sf = "/root/testdata/sf0.001"
    got = q_events_transitions(sf)
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    exp = (pd.DataFrame({"from_type": ev["event_type"], "to_type": nxt})
           .dropna()
           .groupby(["from_type", "to_type"]).size().reset_index(name="n"))
    exp["n"] = exp["n"].astype("int64")
    exp = exp.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_events_entropy_matches_pandas_bruteforce():
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cpg_ray.pipelines.queries import q_events_entropy

    sf = "/root/testdata/sf0.001"
    got = q_events_entropy(sf)
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    c = (ev.groupby(["user_id", "event_type"]).size()
           .reset_index(name="c"))
    n = c.groupby("user_id")["c"].transform("sum")
    term = np.floor(1_000_000_000.0
                    * ((c["c"] / n) * np.log(n / c["c"]))).astype("int64")
    exp = (pd.DataFrame({"user_id": c["user_id"], "n_events": n,
                         "h_scaled": term})
           .groupby("user_id", as_index=False)
           .agg(n_events=("n_events", "first"), h_scaled=("h_scaled", "sum"))
           .sort_values("user_id").reset_index(drop=True))
    for col in ["user_id", "n_events", "h_scaled"]:
        exp[col] = exp[col].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # entropy of a single-type user is exactly 0; all H >= 0
    assert (got["h_scaled"] >= 0).all()


def test_entity_salience_matches_pandas_bruteforce():
    import sys

    import numpy as np
    import pandas as pd

    sys.path.insert(0, "/root/repo")
    import glob

    import pyarrow.dataset as pads

    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = entry._kg_entity_salience(sf)
    gdir = entry._ensure_graph(sf, "mixed")
    nodes = pads.dataset(
        sorted(glob.glob(f"{gdir}/graph/shard=*/kind=node/*.parquet"))
    ).to_table(columns=["label", "url", "norm_name", "span_start"]).to_pandas()
    m = nodes[nodes["label"] == "Mention"]
    exp = (m.groupby(["url", "norm_name"], as_index=False)
            .agg(n_mentions=("span_start", "size"),
                 first_pos=("span_start", "min")))
    exp["n_mentions"] = exp["n_mentions"].astype("int64")
    exp["first_pos"] = exp["first_pos"].astype("int64")
    exp["salience_scaled"] = np.floor(
        1_000_000.0 * (exp["n_mentions"].to_numpy("int64")
                       / (1 + exp["first_pos"].to_numpy("int64")))
    ).astype("int64")
    exp = exp.sort_values(["url", "norm_name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # earlier-and-more-frequent dominance: for equal first_pos within a
    # page, salience is monotone in mention count
    s = got.sort_values(["url", "first_pos", "n_mentions"])
    grp = s.groupby(["url", "first_pos"])["salience_scaled"]
    assert (grp.apply(lambda v: v.is_monotonic_increasing)).all()


def test_fasttext_scores_match_hand_computation():
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import fasttext_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox", "THE the the", "", "!!! ???"],
    })
    got = fasttext_scores(rd.from_pandas(docs)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    import re

    def hand(text):
        toks = re.findall("[a-z0-9_]+", text.lower())
        feats = toks + [toks[i] + " " + toks[i + 1]
                        for i in range(len(toks) - 1)]
        if not feats:
            return 0, 0, 0, "neg"
        ws = 0
        for f in feats:
            b = int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % 1024
            ws += int(hashlib.md5(str(b).encode()).hexdigest()[:8],
                      16) % 2001 - 1000
        n = len(feats)
        sc = int(np.floor(1_000_000.0 * (ws / (1000.0 * n))))
        return n, ws, sc, ("pos" if sc > 0 else "neg")

    exp = pd.DataFrame(
        [(d, *hand(t)) for d, t in docs[["doc_id", "text"]].values],
        columns=["doc_id", "n_feats", "w_sum", "score_scaled", "label"])
    for c in ["doc_id", "n_feats", "w_sum", "score_scaled"]:
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # doc 2: unigram multiplicity counts (3 unigrams + 2 bigrams)
    assert int(got.loc[got.doc_id == 2, "n_feats"].iloc[0]) == 5
    # empty/no-token docs score 0 neg
    assert (got.loc[got.doc_id.isin([3, 4]), "score_scaled"] == 0).all()


def test_md5_signature_variants_detect_near_dups():
    """The md5-variant signature kernels (oracle-paired twins of the
    crc32 production paths) must behave like minhash/simhash: near-dup
    docs agree on most permutations / bits, unrelated docs don't."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import (minhash_signatures_md5,
                                         simhash_signatures_md5)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight again")
    near = base.replace("lazy", "sleepy")
    other = ("completely different words about ships sailing across "
             "oceans carrying cargo between distant harbor cities")
    docs = pd.DataFrame({"doc_id": [1, 2, 3],
                         "text": [base, near, other]})

    mh = (minhash_signatures_md5(rd.from_pandas(docs)).to_pandas()
          .set_index("doc_id"))
    sig_cols = [c for c in mh.columns if c.startswith("sig")]
    agree_near = sum(mh.loc[1, c] == mh.loc[2, c] for c in sig_cols)
    agree_far = sum(mh.loc[1, c] == mh.loc[3, c] for c in sig_cols)
    assert agree_near >= 4          # one-word edit keeps most minima
    assert agree_far == 0           # disjoint shingle sets

    sh = (simhash_signatures_md5(rd.from_pandas(docs)).to_pandas()
          .set_index("doc_id"))

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(sh.loc[1, "simhash16"], sh.loc[2, "simhash16"]) <= 4
    assert ham(sh.loc[1, "simhash16"], sh.loc[3, "simhash16"]) >= 5
    # too-short docs are excluded, not zero-filled
    tiny = pd.DataFrame({"doc_id": [9], "text": ["one two"]})
    assert len(minhash_signatures_md5(rd.from_pandas(tiny)).to_pandas()) == 0
    assert len(simhash_signatures_md5(
        rd.from_pandas(pd.DataFrame({"doc_id": [9], "text": ["one"]}))
    ).to_pandas()) == 0


def test_knn_exact_quantized_matches_bruteforce_ranking():
    from cpg_ray.functions.similarity import (knn_bruteforce,
                                              knn_exact_quantized)

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ds = rd.from_pandas(emb[["vec_id", "embedding"]])
    got = knn_exact_quantized(ds, [0, 1, 2], k=10)
    # self is nearest with score exactly 1.0 (dot == na == nb)
    firsts = got[got["rank"] == 1]
    assert list(firsts["vec_id"]) == [0, 1, 2]
    assert (firsts["score"] == 1.0).all()
    # quantized ranking agrees with the float-BLAS path except where
    # 1/1024 quantization actually reorders near-ties
    q = np.stack(emb[emb.vec_id.isin([0, 1, 2])]
                 .sort_values("vec_id").embedding)
    bf = knn_bruteforce(rd.from_pandas(emb[["vec_id", "embedding"]]), q,
                        k=10)
    for qi in range(3):
        a = set(got[got.qid == [0, 1, 2][qi]].vec_id)
        b = set(bf[bf.query_id == qi].vec_id)
        assert len(a & b) >= 8
    # missing query id raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        knn_exact_quantized(ds, [0, 10**9], k=5)


def test_rake_keyphrases_hand_computation():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import rake_keyphrases

    # phrases: [deep learning], [best], [learning helps]
    # deg(deep)=2 freq=1 -> 2e6; deg(learning)=2+2=4 freq=2 -> 2e6;
    # deg(helps)=2 freq=1 -> 2e6; deg(best)=1 freq=1 -> 1e6
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [
        "deep learning is the best and learning helps",
        "the of and",  # stopwords only -> no phrases
    ]})
    got = rake_keyphrases(rd.from_pandas(docs)).to_pandas()
    assert set(got["doc_id"]) == {1}
    d1 = got.set_index("phrase")
    assert d1.loc["deep learning", "rake_scaled"] == 4_000_000
    assert d1.loc["best", "rake_scaled"] == 1_000_000
    assert d1.loc["learning helps", "rake_scaled"] == 4_000_000
    # rank order: score desc then phrase asc — tie broken alphabetically
    ranked = got.sort_values("rank")["phrase"].tolist()
    assert ranked == ["deep learning", "learning helps", "best"]
    assert (got["rank"] <= 3).all()
    # duplicate phrase occurrences count into freq/deg but emit once
    dup = pd.DataFrame({"doc_id": [7], "text": ["alpha beta the alpha beta"]})
    g2 = rake_keyphrases(rd.from_pandas(dup)).to_pandas()
    assert len(g2) == 1
    # freq(alpha)=2, deg=4 -> 2e6; same for beta -> score 4e6
    assert g2["rake_scaled"].iloc[0] == 4_000_000


def test_graph_mixing_stats_hand_graph():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.graphalgo import graph_mixing_stats

    # directed: a->b, b->a (reciprocal pair), a->c
    edges = pd.DataFrame({"src": ["a", "b", "a", "a"],
                          "dst": ["b", "a", "c", "a"]})  # self-loop dropped
    df = graph_mixing_stats(rd.from_pandas(edges))
    assert int(df["m_dir"].iloc[0]) == 3
    assert int(df["n_recip"].iloc[0]) == 2
    assert abs(float(df["reciprocity"].iloc[0]) - 2 / 3) < 1e-12
    # undirected: path b-a-c; degrees a=2, b=1, c=1
    # edges (a,b): j,k=(2,1); (a,c): (2,1)
    # M=2, s_jk=4, s_sum=6, s_sq=10 -> num=4*2*4-36=-4, den=2*2*10-36=4
    assert int(df["m_und"].iloc[0]) == 2
    assert int(df["assort_num"].iloc[0]) == -4
    assert int(df["assort_den"].iloc[0]) == 4
    assert float(df["assortativity"].iloc[0]) == -1.0  # star = disassortative
    # star S3: perfectly disassortative -> exactly -1


def test_minhash_near_dedup_scale_degrades_equivalent():
    """The past-guard shapes of near_dedup_minhash agree with the
    driver shapes on a high-dup corpus: clustering degrades from the
    driver union-find to distributed min-label propagation
    (cluster_pair_limit=0) and the keep-filter degrades from the
    broadcast drop-set to a distributed left_anti join
    (drop_broadcast_limit=0)."""
    from cpg_ray.functions.dedup import near_dedup_minhash

    base = _docs()[["doc_id", "text"]].head(120)
    # 50% dup rate: every other doc gets a near-copy (web-scale shape)
    dup = base[base.doc_id % 2 == 0].copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    src = pd.concat([base, dup], ignore_index=True)
    ds = rd.from_pandas(src)

    s_ref, p_ref, c_ref = near_dedup_minhash(ds, verify_threshold=0.6)
    ref_ids = sorted(s_ref.to_pandas().doc_id)
    assert isinstance(c_ref, dict)

    # keep-filter degrade only (driver UF still decides the clusters)
    s_anti, p_anti, c_anti = near_dedup_minhash(
        ds, verify_threshold=0.6, drop_broadcast_limit=0)
    assert sorted(s_anti.to_pandas().doc_id) == ref_ids
    assert c_anti == c_ref

    # clustering degrade too (distributed min-label components); the
    # cluster map comes back as a Dataset of (entity, component)
    s_dist, p_dist, c_dist = near_dedup_minhash(
        ds, verify_threshold=0.6, cluster_pair_limit=0)
    assert sorted(s_dist.to_pandas().doc_id) == ref_ids
    cdf = c_dist.to_pandas()
    got_map = dict(zip(cdf.entity, cdf.component))
    # distributed labels agree on every non-trivial cluster member
    want = {k: v for k, v in c_ref.items() if k != v}
    assert {k: v for k, v in got_map.items() if k != v} == want
    # survivors of the anti-join path carry the original schema
    assert set(s_dist.to_pandas().columns) == set(src.columns)


def test_setjoin_prefix_matches_full_join_and_prunes():
    """The AllPairs/PPJoin prefix-filtered path returns EXACTLY the
    full gram-self-join's pairs (prefix-filter completeness: any pair
    with J >= t shares a gram inside both prefixes under the global
    frequency order), while its candidate stage touches a strict
    subset of the join volume."""
    from cpg_ray.functions.dedup import ngram_jaccard_pairs, setjoin_prefix

    base = _docs()[["doc_id", "text"]].head(120)
    dup = base[base.doc_id % 10 == 0].copy()
    dup["doc_id"] += 1_000_000
    dup["text"] += " tail"
    corpus = pd.concat([base, dup], ignore_index=True)

    full = ngram_jaccard_pairs(
        rd.from_pandas(corpus), n=4, threshold=3 / 5).to_pandas()
    full = full.sort_values(["a", "b"]).reset_index(drop=True)
    got, info = setjoin_prefix(
        rd.from_pandas(corpus), n=4, threshold_num=3, threshold_den=5)
    got = got.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(full) > 0
    pd.testing.assert_frame_equal(
        got[["a", "b", "inter", "union"]].astype("int64"),
        full[["a", "b", "inter", "union"]].astype("int64"),
    )
    # pruning evidence: every result pair was a candidate, and the
    # candidate stage is far below the all-sharing-pairs volume the
    # unfiltered self-join enumerates
    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)}

    sets = {int(d): grams(t) for d, t in zip(corpus.doc_id, corpus.text)}
    ids = sorted(sets)
    sharing = sum(
        1
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if sets[a] & sets[b]
    )
    assert len(got) <= info["n_candidate_pairs"] < sharing


def test_setjoin_prefix_no_pairs():
    """Disjoint token sets: zero candidates short-circuits with the
    typed empty contract instead of joining on an empty dataset."""
    from cpg_ray.functions.dedup import setjoin_prefix

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aa bb cc dd ee", "ff gg hh ii jj"],
    }))
    pairs, info = setjoin_prefix(ds, n=4, threshold_num=1,
                                 threshold_den=2)
    assert pairs.count() == 0
    assert info["n_candidate_pairs"] == 0
    # Dataset keeps the typed schema (to_pandas on a 0-row Dataset
    # drops columns — a Ray quirk, not the operator's contract)
    assert pairs.schema().names == ["a", "b", "inter", "union", "jaccard"]


def test_priority_sample_brute_force_and_batch_invariance():
    """priority_sample == the k globally-smallest md5 h/w priorities
    (pure-python brute force), with the DLT max(w, 2^52/tau) estimator;
    batch boundaries must not change the sample."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.relational import priority_sample

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(500),
                       "w": rng.integers(1, 1000, 500).astype("int64")})
    got = priority_sample(rd.from_pandas(df), "id", "w", k=20)

    prio = {
        int(r.id): int(hashlib.md5(str(r.id).encode()).hexdigest()[:13],
                       16) / r.w
        for r in df.itertuples()
    }
    order = sorted(prio, key=lambda i: (prio[i], i))
    assert got["id"].tolist() == order[:20]
    tau = prio[order[20]]
    want_est = np.maximum(got["w"].to_numpy(np.float64), (16.0**13) / tau)
    assert (got["est_weight"].to_numpy() == want_est).all()

    got2 = priority_sample(rd.from_pandas(df).repartition(17),
                           "id", "w", k=20)
    pd.testing.assert_frame_equal(got, got2)

    # census case: k >= population -> everything, est == w
    small = priority_sample(rd.from_pandas(df.head(5)), "id", "w", k=20)
    assert len(small) == 5
    assert (small["est_weight"].to_numpy()
            == small["w"].to_numpy(np.float64)).all()


def test_hearst_triples_fixture():
    """Every Hearst pattern extracts the right (hyponym, isa,
    hypernym) triples; a doc with two patterns yields both; unmatched
    docs yield nothing."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import hearst_triples

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "we ship databases such as duckdb, sqlite and postgres.",
            "spark and other engines scale out.",
            "filters, including bloom and cuckoo. joins, especially hash.",
            "nothing to see here",
            "frameworks, especially ray.",
        ],
    })
    got = hearst_triples(rd.from_pandas(docs)).to_pandas()
    got = got.sort_values(["doc_id", "pattern", "hypo_idx"]).reset_index(
        drop=True)
    assert got[got.doc_id == 1].subj.tolist() == ["duckdb", "sqlite",
                                                  "postgres"]
    assert (got[got.doc_id == 1].obj == "databases").all()
    assert got[got.doc_id == 2].subj.tolist() == ["spark"]
    assert got[got.doc_id == 2].obj.tolist() == ["engines"]
    d3 = got[got.doc_id == 3]
    assert set(d3.pattern) == {"including", "especially"}
    assert d3[d3.pattern == "including"].subj.tolist() == ["bloom",
                                                           "cuckoo"]
    assert d3[d3.pattern == "especially"].subj.tolist() == ["hash"]
    assert 4 not in set(got.doc_id)
    assert (got.pred == "isa").all()


def test_rerank_search_two_stage_contract():
    """Rerank output is a subset of the BM25 recall stage, exactly
    top_n per query, deterministic under repartition, and the ce
    ordering genuinely differs from bm25's when the seam says so."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import bm25_search, rerank_search

    rng = np.random.default_rng(3)
    vocab = ["hash", "join", "scan", "sort", "merge", "table", "row"]
    docs = pd.DataFrame({
        "doc_id": np.arange(80),
        "text": [" ".join(rng.choice(vocab, 12)) for _ in range(80)],
    })
    queries = {"q1": "hash join", "q2": "sort merge"}
    ds = rd.from_pandas(docs)
    got = rerank_search(ds, queries, k_retrieve=10, top_n=4)
    cand = bm25_search(ds, queries, top_n=10).to_pandas()

    assert (got.groupby("qid").size() == 4).all()
    for qid, sub in got.groupby("qid"):
        pool = set(cand[cand.qid == qid].doc_id)
        assert set(sub.doc_id) <= pool
        assert sub["rank"].tolist() == [1, 2, 3, 4]
        # ce ordering is by ce_score desc
        assert (sub.sort_values("rank").ce_score.diff().dropna()
                <= 0).all()

    got2 = rerank_search(rd.from_pandas(docs).repartition(13),
                         queries, k_retrieve=10, top_n=4)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got2.reset_index(drop=True))


def test_hard_negatives_excludes_same_label_and_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.similarity import hard_negatives

    rng = np.random.default_rng(5)
    n = 120
    emb = pd.DataFrame({
        "vec_id": np.arange(n),
        "embedding": [rng.normal(0, 1, 16).astype("float32").tolist()
                      for _ in range(n)],
        "label": (np.arange(n) % 3).astype("int32"),
    })
    got = hard_negatives(rd.from_pandas(emb), [0, 1], k=5)

    q = np.floor(np.stack(emb.embedding.iloc[:2]).astype(np.float64)
                 * 1024).astype(np.int64)
    v = np.floor(np.stack(emb.embedding).astype(np.float64)
                 * 1024).astype(np.int64)
    for ai, anchor in enumerate([0, 1]):
        dots = v @ q[ai]
        score = dots.astype(np.float64) / np.sqrt(
            np.float64((q[ai] ** 2).sum())
            * (v ** 2).sum(axis=1).astype(np.float64))
        neg = emb.label.to_numpy() != emb.label.iloc[anchor]
        order = sorted(np.flatnonzero(neg),
                       key=lambda i: (-score[i], i))[:5]
        sub = got[got.anchor_id == anchor].sort_values("rank")
        assert sub.vec_id.tolist() == [int(i) for i in order]
        # no mined negative shares the anchor's label
        assert (emb.label.iloc[sub.vec_id].to_numpy()
                != emb.label.iloc[anchor]).all()


def test_setjoin_prefix_driver_and_shuffle_paths_agree():
    """The guarded driver fast path and the distributed
    hash-join path return identical pairs and equivalent pruning
    evidence."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import setjoin_prefix

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    base = [" ".join(rng.choice(vocab, 12)) for _ in range(40)]
    docs = pd.DataFrame({
        "doc_id": np.arange(80),
        "text": base + [t + " tail word here x" for t in base],
    })
    ds = rd.from_pandas(docs)
    fast, fi = setjoin_prefix(ds, n=4, threshold_num=3,
                              threshold_den=5)
    slow, si = setjoin_prefix(ds, n=4, threshold_num=3,
                              threshold_den=5, mode="shuffle")
    f = fast.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    s = slow.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, s[f.columns])
    assert fi["n_candidate_docs"] == si["n_candidate_docs"]
    assert len(f) > 0


# ---- TextRank ---------------------------------------------------------------


def test_textrank_matches_bruteforce():
    from cpg_ray.functions.text import textrank_keywords

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "graph rank graph walk rank graph",
            "alpha beta gamma alpha beta",
            "solo",                      # no edges -> no rows
            "same same same",            # only self-pairs -> no rows
        ]})
    got = (textrank_keywords(rd.from_pandas(docs), top_n=5, iters=4)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))
    assert set(got.doc_id) == {1, 2}

    import re
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        pairs = {(u, v) for u, v in zip(toks, toks[1:]) if u != v}
        und = pairs | {(v, u) for u, v in pairs}
        if not und:
            assert doc_id not in set(got.doc_id)
            continue
        nodes = sorted({u for u, _ in und})
        deg = {u: sum(1 for a, _ in und if a == u) for u in nodes}
        x = {u: 10**6 for u in nodes}
        for _ in range(4):
            nxt = {u: 150_000 for u in nodes}
            for u, v in und:
                nxt[v] += x[u] * 85 // (100 * deg[u])
            x = nxt
        want = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        sub = got[got.doc_id == doc_id]
        assert list(sub.token) == [t for t, _ in want]
        assert list(sub.score) == [s for _, s in want]
        assert list(sub["rank"]) == list(range(1, len(want) + 1))


def test_textrank_hub_word_ranks_first():
    from cpg_ray.functions.text import textrank_keywords

    # 'core' is adjacent to every other word -> highest degree -> top
    docs = pd.DataFrame({"doc_id": [7], "text": [
        "core alpha core beta core gamma core delta"]})
    got = textrank_keywords(rd.from_pandas(docs)).to_pandas()
    assert got.sort_values("rank").iloc[0].token == "core"


# ---- skyline ----------------------------------------------------------------


def _brute_skyline(df, x, y, x_dir, y_dir):
    import operator as op

    bx = op.le if x_dir == "min" else op.ge
    by = op.ge if y_dir == "max" else op.le
    sx = op.lt if x_dir == "min" else op.gt
    sy = op.gt if y_dir == "max" else op.lt
    keep = []
    for i, (xi, yi) in enumerate(zip(df[x], df[y])):
        dom = any(
            bx(xj, xi) and by(yj, yi) and (sx(xj, xi) or sy(yj, yi))
            for j, (xj, yj) in enumerate(zip(df[x], df[y])) if j != i)
        keep.append(not dom)
    return df[np.array(keep)].sort_values([x, y]).reset_index(drop=True)


@pytest.mark.parametrize("x_dir,y_dir", [("min", "max"), ("min", "min"),
                                         ("max", "max"), ("max", "min")])
def test_skyline_matches_bruteforce_all_directions(x_dir, y_dir):
    from cpg_ray.functions.relational import skyline_2d

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(300, dtype="int64"),
        "x": rng.integers(0, 20, 300).astype("float64"),
        "y": rng.integers(0, 20, 300).astype("int64"),
    })
    # multiple blocks force the two-phase path
    ds = rd.from_pandas([df.iloc[i::7] for i in range(7)])
    got = skyline_2d(ds, x="x", y="y", x_dir=x_dir, y_dir=y_dir)
    want = _brute_skyline(df, "x", "y", x_dir, y_dir)
    pd.testing.assert_frame_equal(
        got.sort_values(["x", "y", "id"]).reset_index(drop=True),
        want.sort_values(["x", "y", "id"]).reset_index(drop=True))


def test_skyline_duplicates_survive_and_guard():
    from cpg_ray.functions.relational import GuardExceeded, skyline_2d

    df = pd.DataFrame({"x": [1.0, 1.0, 2.0], "y": [5, 5, 9]})
    got = skyline_2d(rd.from_pandas(df), x="x", y="y")
    # (1,5) twice (not dominated by (2,9): worse x) and (2,9)
    assert len(got) == 3
    with pytest.raises(GuardExceeded):
        # rising diagonal: larger x but larger y too — nothing
        # dominates anything, every point is in the skyline
        diag = pd.DataFrame({"x": np.arange(100.0),
                             "y": np.arange(100)})
        skyline_2d(rd.from_pandas(diag), x="x", y="y", cand_limit=10)


def test_coverage_select_modes_match_bruteforce_greedy():
    """Driver and shuffle modes of greedy max-coverage selection must
    both equal the sequential set-based greedy (max marginal gain,
    ties to the smallest id), including the early stop once nothing
    new can be covered."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.text import coverage_select

    rng = np.random.RandomState(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(60):
        toks = rng.choice(vocab, size=rng.randint(3, 12))
        docs.append((d, " ".join(toks)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    # sequential reference greedy over bigram sets
    sets = {d: {f"{u} {v}" for u, v in zip(t.split(" "),
                                           t.split(" ")[1:])}
            for d, t in docs}
    covered: set = set()
    banned: set = set()
    truth = []
    total = 0
    for r in range(1, 9):
        best = max(((len(s - covered), -d) for d, s in sets.items()
                    if d not in banned), default=(0, 0))
        g, d = best[0], -best[1]
        if g <= 0:
            break
        covered |= sets[d]
        banned.add(d)
        total += g
        truth.append((r, d, g, total))
    truth_df = pd.DataFrame(
        truth, columns=["sel_rank", "doc_id", "gain", "covered_total"])

    ds = rd.from_pandas(df).repartition(7)
    for mode in ("driver", "shuffle"):
        got = coverage_select(ds, k=8, mode=mode)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), truth_df.astype("int64"))

    # early stop: one doc covers everything → exactly one row
    one = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b"]})
    got = coverage_select(rd.from_pandas(one), k=5, mode="driver")
    assert list(got.sel_rank) == [1] and list(got.doc_id) == [1]
    got2 = coverage_select(rd.from_pandas(one), k=5, mode="shuffle")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))


# ---------------------------------------------------------------
# Incremental-ingestion dedup (dedup.delta_dedup)
# ---------------------------------------------------------------

def test_delta_dedup_three_tiers_and_min_match():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import _md5_32, delta_dedup

    # pick ids deterministically on both sides of the split rule
    new_ids = [i for i in range(200) if _md5_32(str(i)) % 5 == 0]
    base_ids = [i for i in range(200) if _md5_32(str(i)) % 5 != 0]
    base_text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near_text = base_text.replace("theta", "iota", 1)  # 1-shingle edit
    rows = []
    # two base docs share the exact text -> exact match must be MIN id
    rows.append((base_ids[0], base_text))
    rows.append((base_ids[1], base_text))
    rows.append((base_ids[2], "completely different words here " * 6))
    rows.append((new_ids[0], base_text))            # exact_dup
    rows.append((new_ids[1], near_text))            # near_dup (bands)
    rows.append((new_ids[2], "nothing like anything else at all "
                 "qqq www eee rrr ttt yyy uuu iii ooo ppp"))  # fresh
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = delta_dedup(ds)
    got = {r.doc_id: (r.status, r.match_id) for r in out.itertuples()}
    assert got[new_ids[0]] == ("exact_dup", min(base_ids[0],
                                                base_ids[1]))
    assert got[new_ids[1]][0] == "near_dup"
    assert got[new_ids[1]][1] in (base_ids[0], base_ids[1])
    assert got[new_ids[2]] == ("fresh", -1)
    assert len(out) == 3  # only the new shard reports


def test_delta_dedup_all_fresh_and_empty_tiers():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import _md5_32, delta_dedup

    new_id = next(i for i in range(100) if _md5_32(str(i)) % 5 == 0)
    base_id = next(i for i in range(100) if _md5_32(str(i)) % 5 != 0)
    ds = rd.from_pandas(pd.DataFrame(
        [(new_id, "unique words one two three four five six"),
         (base_id, "other totally distinct seven eight nine ten")],
        columns=["doc_id", "text"]))
    out = delta_dedup(ds)
    assert list(out.status) == ["fresh"]
    assert list(out.match_id) == [-1]


def test_delta_dedup_driver_and_shuffle_paths_agree():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import _md5_32, delta_dedup

    new_ids = [i for i in range(300) if _md5_32(str(i)) % 5 == 0][:4]
    base_ids = [i for i in range(300) if _md5_32(str(i)) % 5 != 0][:6]
    base = "one two three four five six seven eight nine ten " * 3
    rows = ([(b, base + f"tail {j}") for j, b in enumerate(base_ids)]
            + [(new_ids[0], base + "tail 0"),            # exact
               (new_ids[1], base.replace("nine", "NINE2", 1)),  # near
               (new_ids[2], "wholly different words " * 8),
               (new_ids[3], base + "tail 3")])            # exact
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    a = delta_dedup(rd.from_pandas(df))
    b = delta_dedup(rd.from_pandas(df), mode="shuffle")
    pd.testing.assert_frame_equal(a, b)


def test_simhash_near_pairs_pigeonhole_and_radius():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import simhash_near_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau") * 2
    docs = rd.from_pandas(pd.DataFrame([
        (1, base),
        (2, base.replace("kappa", "kapa", 1)),   # tiny edit: near
        (3, "utterly different content " * 10),
        (4, base),                                # identical: ham 0
    ], columns=["doc_id", "text"]))
    out = simhash_near_pairs(docs, max_hamming=3)
    got = {(r.a, r.b): r.hamming for r in out.itertuples()}
    assert got[(1, 4)] == 0
    assert all(h <= 3 for h in got.values())
    # pair appears ONCE even though identical sigs share all 4 chunks
    assert len(out) == len(set(zip(out.a, out.b)))
    assert out.attrs["skipped_buckets"] == 0


def test_simhash_near_pairs_bucket_cap_reported():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import simhash_near_pairs

    # 8 identical docs -> every chunk bucket holds all 8 -> cap at 4
    # skips those buckets and reports them, finding no pairs
    docs = rd.from_pandas(pd.DataFrame(
        [(i, "same words again and again here") for i in range(8)],
        columns=["doc_id", "text"]))
    out = simhash_near_pairs(docs, bucket_cap=4)
    assert out.empty
    assert out.attrs["skipped_buckets"] >= 4


def test_winnowing_guarantee_and_tie_rule():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import winnowing_fingerprints

    shared = "thequickbrownfoxjumpsoverthelazydog"
    docs = rd.from_pandas(pd.DataFrame([
        (1, "AAA " + shared + " BBB"),
        (2, "xyz! " + shared + "???"),     # same cleaned substring
        (3, "nothingincommonwiththeothers"),
        (4, "tiny"),                        # < k+w-1 grams: no window
    ], columns=["doc_id", "text"]))
    out = winnowing_fingerprints(docs, k=5, w=4)
    by = {i: set(g.fp) for i, g in out.groupby("doc_id")}
    # the winnowing guarantee: a long shared substring must share at
    # least one selected fingerprint between the two docs
    assert by[1] & by[2]
    assert 4 not in by
    # density: ~2/(w+1) of positions selected, never more than all
    n1 = len(out[out.doc_id == 1])
    grams1 = len("aaa" + shared + "bbb") - 5 + 1
    assert 0 < n1 < grams1
    # rightmost tie rule: a doc of one repeated char has ONE distinct
    # hash; each window selects its rightmost (=current) position
    rep = winnowing_fingerprints(rd.from_pandas(pd.DataFrame(
        [(9, "aaaaaaaaaaaa")], columns=["doc_id", "text"])), k=5, w=4)
    # every full window end-position appears (rightmost of each)
    assert list(rep.pos) == list(range(4, 12 - 5 + 2))
    assert rep.fp.nunique() == 1


def test_simhash_near_pairs_driver_and_shuffle_agree():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import simhash_near_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau") * 2
    docs = pd.DataFrame([
        (1, base), (2, base.replace("kappa", "kapa", 1)),
        (3, "utterly different content " * 10), (4, base),
        (5, base.replace("zeta", "zzz", 1)),
    ], columns=["doc_id", "text"])
    a = simhash_near_pairs(rd.from_pandas(docs))
    b = simhash_near_pairs(rd.from_pandas(docs), mode="shuffle")
    pd.testing.assert_frame_equal(a, b)
    assert a.attrs["skipped_buckets"] == b.attrs["skipped_buckets"]
    # bucket_cap parity: identical docs overflow a cap of 4 on BOTH
    rep = pd.DataFrame([(i, "same words again and again here")
                        for i in range(8)],
                       columns=["doc_id", "text"])
    ra = simhash_near_pairs(rd.from_pandas(rep), bucket_cap=4)
    rb = simhash_near_pairs(rd.from_pandas(rep), bucket_cap=4,
                            mode="shuffle")
    assert ra.empty and rb.empty
    assert (ra.attrs["skipped_buckets"]
            == rb.attrs["skipped_buckets"] > 0)


def test_events_paths_orders_truncates_and_censuses(tmp_path):
    """Journey census: per-user ts-then-event_id order, first-5
    truncation, and the census aggregation across user buckets."""
    import pandas as pd

    from cpg_ray.pipelines.queries import q_events_paths

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7, 10, 11, 12],
        # user 1: six events (truncates to 5); two share ts=2 ->
        # event_id breaks the tie (id 2 before id 3)
        "ts": pd.to_datetime(
            [1, 2, 2, 4, 5, 6, 1, 1, 2, 3], unit="s"),
        "user_id": [1, 1, 1, 1, 1, 1, 2, 3, 3, 3],
        "event_type": ["a", "b", "c", "d", "e", "f",
                       "solo", "x", "y", "z"],
        "value": 0.0,
        "props": "",
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)
    got = q_events_paths(str(sf))
    want = pd.DataFrame({
        "journey": ["a>b>c>d>e", "solo", "x>y>z"],
        "depth": pd.Series([5, 1, 3], dtype="int64"),
        "n_users": pd.Series([1, 1, 1], dtype="int64")})
    assert got.equals(want), got


def test_random_projection_exact_and_jl_distortion():
    """JL projection: (1) bit-exact vs a driver-side numpy replay of
    the md5-sign matmul; (2) pairwise distances in the projected space
    are within loose JL distortion bounds after the 2^20·√k rescale."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.similarity import random_projection

    rng = np.random.default_rng(3)
    n, d, k = 40, 24, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs)}))
    out = random_projection(ds, k=k).to_pandas()
    out = out.sort_values(["vec_id", "j"]).reset_index(drop=True)

    s = np.empty((d, k), dtype=np.int64)
    for i in range(d):
        for j in range(k):
            h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8]
            s[i, j] = 1 if int(h, 16) % 2 == 0 else -1
    q = np.floor(vecs.astype(np.float64) * (1 << 20)).astype(np.int64)
    want = q @ s
    got = out["y"].to_numpy().reshape(n, k)
    assert (got == want).all()

    # JL distortion: median pairwise-distance ratio ≈ 1 after rescale
    y = got.astype(np.float64) / ((1 << 20) * np.sqrt(k))
    x = vecs.astype(np.float64)
    dx = np.linalg.norm(x[:, None] - x[None, :], axis=2)
    dy = np.linalg.norm(y[:, None] - y[None, :], axis=2)
    iu = np.triu_indices(n, 1)
    ratio = dy[iu] / dx[iu]
    assert 0.8 < np.median(ratio) < 1.2
    assert (ratio > 0.3).all() and (ratio < 1.9).all()


def test_pca_top_component_recovers_planted_direction():
    """Integer power iteration on the distributed Gram matrix recovers
    a planted dominant direction (|cosine| > 0.98 after the sign fix),
    and the sign convention makes the max-|loading| coordinate
    positive."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.similarity import pca_top_component

    rng = np.random.default_rng(11)
    d = 24
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    s = rng.normal(size=200)[:, None] * 3.0
    vecs = (s * u[None, :]
            + rng.normal(size=(200, d)) * 0.1).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"embedding": list(vecs)}))
    out = pca_top_component(ds, iters=12)
    v = out["loading"].to_numpy(np.float64)
    cos = abs(v @ u) / np.linalg.norm(v)
    assert cos > 0.98
    assert v[np.argmax(np.abs(v))] > 0


def test_gini_histogram_identity_matches_naive():
    """The histogram MAD identity equals the O(n²) textbook Gini on a
    skewed fixture, and hits the exact endpoints: all-equal → 0,
    one-owner → (n-1)/n."""
    import pandas as pd

    def naive_ppm(xs):
        n, s = len(xs), sum(xs)
        num = sum(abs(a - b) for a in xs for b in xs)
        return (num * 10**6) // (2 * n * s)

    def hist_ppm(xs):
        vc = pd.Series(xs).value_counts().sort_index()
        v = vc.index.to_numpy(np.int64)
        c = vc.to_numpy(np.int64)
        cum_c = np.concatenate([[0], np.cumsum(c)[:-1]])
        cum_s = np.concatenate([[0], np.cumsum(c * v)[:-1]])
        num = int((v * c * cum_c).sum() - (c * cum_s).sum())
        return (num * 10**6) // (len(xs) * sum(xs))

    rng = np.random.default_rng(5)
    xs = list(rng.zipf(1.7, size=300).clip(max=10**6).astype(int))
    assert hist_ppm(xs) == naive_ppm(xs)
    assert hist_ppm([7] * 50) == 0
    one = [0] * 99 + [1000]
    # all mass on one user: gini = (n-1)/n = 0.99
    assert hist_ppm(one) == naive_ppm(one) == 990000


def test_fellegi_sunter_weights_and_classification():
    """FS scoring: u estimated from value frequencies, full-agreement
    pairs in a block classify as matches, full-disagreement pairs do
    not, and rare-value agreement outscores common-value agreement."""
    import math

    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import fellegi_sunter_scores

    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "blk": [0] * 8,
        # 'x' is common (6 of 8), 'r' rare (2 of 8)
        "f1": ["x", "x", "x", "x", "x", "x", "r", "r"],
        "f2": [1, 1, 2, 3, 4, 5, 6, 6],
    })
    out = fellegi_sunter_scores(
        rd.from_pandas(df), id_col="id", block_col="blk",
        field_cols=["f1", "f2"]).to_pandas()
    out = out.set_index(["a", "b"])

    # replay the weight estimation
    def u_of(col):
        c = df[col].value_counts().to_numpy()
        return (c * (c - 1)).sum() / (8 * 7)

    def w(col, agree):
        u = min(max(u_of(col), 1e-9), 1 - 1e-9)
        return int(np.floor(1e6 * (math.log(0.95 / u) if agree
                                   else math.log((1 - 0.95) / (1 - u)))))

    # pair (0,1): agrees on both f1 (common) and f2 (count-2 value)
    assert out.loc[(0, 1), "score_micro"] == w("f1", True) + w("f2", True)
    assert bool(out.loc[(0, 1), "is_match"])
    # pair (6,7): agrees on both, f1 value is RARE — same score shape
    assert bool(out.loc[(6, 7), "is_match"])
    # pair (2,6): disagrees on both → negative
    assert out.loc[(2, 6), "score_micro"] < 0
    assert not bool(out.loc[(2, 6), "is_match"])
    # all 28 within-block pairs scored
    assert len(out) == 28


def test_fellegi_sunter_broadcast_and_join_modes_agree():
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.dedup import fellegi_sunter_scores

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(60, dtype=np.int64),
        "blk": rng.integers(0, 4, 60),
        "f1": rng.choice(list("abc"), 60),
        "f2": rng.integers(0, 5, 60),
    })
    kw = dict(id_col="id", block_col="blk", field_cols=["f1", "f2"])
    a = fellegi_sunter_scores(rd.from_pandas(df), mode="broadcast",
                              **kw).to_pandas()
    b = fellegi_sunter_scores(rd.from_pandas(df), mode="shuffle",
                              **kw).to_pandas()
    key = ["a", "b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_attribution_conserves_cents_exactly():
    """Largest-remainder apportionment: Σ attributed == purchase cents
    for every attributed purchase, remainder cents land on the MOST
    RECENT touches."""
    import duckdb
    import pandas as pd

    from cpg_ray.pipelines.queries import ORACLE_SQL, q_events_attribution

    sf = "/root/testdata/sf0.001"
    out = q_events_attribution(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    cents = dict(zip(
        ev[ev.event_type == "purchase"]["event_id"],
        np.round(ev[ev.event_type == "purchase"]["value"]
                 .to_numpy("float64") * 100).astype("int64")))
    got = out.groupby("purchase_id")["attributed_cents"].sum()
    for pid, s in got.items():
        assert s == cents[pid], pid
    # remainder bias: within one purchase, attributed cents differ by
    # at most 1 and the larger shares come first in recency order
    per = out.groupby("purchase_id")["attributed_cents"]
    assert int((per.max() - per.min()).max()) <= 1


def test_seqpairs_gapped_containment_vs_naive():
    """PrefixSpan-2 census equals a naive per-user subsequence scan on
    a small replay of the sf0.001 events (gapped ≠ consecutive: the
    census counts a-then-b with ANY gap)."""
    import pandas as pd

    from cpg_ray.pipelines.queries import q_events_seqpairs

    sf = "/root/testdata/sf0.001"
    got = q_events_seqpairs(sf).set_index(["a", "b"])["n_users"]
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    ev["k"] = (ev["ts"].astype("int64") // 1000) * (1 << 22) \
        + ev["event_id"]
    naive = {}
    for uid, g in ev.groupby("user_id"):
        mm = g.groupby("event_type")["k"].agg(["min", "max"])
        for a in mm.index:
            for b in mm.index:
                if mm.loc[a, "min"] < mm.loc[b, "max"]:
                    naive[(a, b)] = naive.get((a, b), 0) + 1
    assert dict(got) == naive


def test_theilsen_lexsort_median_is_robust():
    """Median-of-slopes machinery: replay the lexsort selection on a
    planted series with one wild outlier — the Theil-Sen slope stays
    at the true trend (robustness), and the selected fraction is the
    lower median by value with (num, den) tie-break."""
    x = np.arange(10, dtype=np.int64)
    n = 3 * x + 5
    n[7] = 1000  # outlier
    i, j = np.triu_indices(len(x), 1)
    num, den = n[j] - n[i], x[j] - x[i]
    val = num / den
    order = np.lexsort((den, num, val))
    sel = order[(len(num) - 1) // 2]
    # robust: the median slope is exactly 3 despite the outlier
    assert num[sel] == 3 * den[sel]


def test_levenshtein_capped_vs_reference_dp():
    """Vectorized capped Wagner-Fischer equals a scalar reference DP
    on mixed-length unicode strings, including the cap contract
    (true distance > k reports exactly k+1)."""
    from cpg_ray.functions.dedup import levenshtein_capped

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(dp[j] + 1, nd[-1] + 1,
                              dp[j - 1] + (ca != cb)))
            dp = nd
        return dp[-1]

    words = ["", "a", "ab", "ba", "kitten", "sitting", "flaw", "lawn",
             "Supplier#000000001", "Supplier#000000010", "naïve",
             "naive", "añejo"]
    pairs = [(a, b) for a in words for b in words]
    got = levenshtein_capped(
        np.array([p[0] for p in pairs], object),
        np.array([p[1] for p in pairs], object), k=2)
    want = [min(ref(a, b), 3) for a, b in pairs]
    assert list(got) == want


def test_streaks_gaps_and_islands_hand_fixture():
    """Islands: days {1,2,3, 7,8, 12} → longest 3 starting day 1;
    tie between two 2-runs picks the earlier start."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.functions.relational import distinct_on  # noqa: F401
    from cpg_ray.pipelines import queries as q

    # replay via the bucket kernel directly
    g = pd.DataFrame({
        "user_id": [1] * 6 + [2] * 4,
        "day": [1, 2, 3, 7, 8, 12, 5, 6, 9, 10],
    })
    # lift the inner function through the public query path shape
    nb_frame = g.assign(__bucket=0)
    import numpy as np

    def islands(g):
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy("int64")
        d = g["day"].to_numpy("int64")
        new_user = np.r_[True, u[1:] != u[:-1]]
        rank = np.arange(len(g), dtype=np.int64)
        rank -= np.maximum.accumulate(np.where(new_user, rank, -1))
        island = d - rank
        f = pd.DataFrame({"user_id": u, "island": island, "day": d})
        runs = f.groupby(["user_id", "island"], sort=False)["day"] \
            .agg(["count", "min"]).reset_index()
        runs = runs.sort_values(["user_id", "count", "min"],
                                ascending=[True, False, True],
                                kind="mergesort")
        return runs.groupby("user_id", sort=False).head(1)

    best = islands(g).set_index("user_id")
    assert best.loc[1, "count"] == 3 and best.loc[1, "min"] == 1
    # user 2: runs {5,6} and {9,10} tie at 2 → earliest start 5
    assert best.loc[2, "count"] == 2 and best.loc[2, "min"] == 5


def test_golden_record_survivorship_rules():
    """Survivorship on the sf0.001 output: representative = min member
    id, modal segment beats minority, cents = max, members sum to the
    customer count."""
    import pandas as pd

    from cpg_ray.pipelines.queries import q_customer_golden

    sf = "/root/testdata/sf0.001"
    out = q_customer_golden(sf)
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    assert out["n_members"].sum() == len(cust)
    # representative is a member and the minimum custkey of the cluster
    assert (out["golden_custkey"] <= out["cluster"]).all()
    # golden cents is attainable: every value appears in the source
    cents = set(
        np.round(cust["c_acctbal"].to_numpy("float64") * 100)
        .astype("int64"))
    assert set(out["golden_cents"]) <= cents
    # segments come from the domain
    assert set(out["golden_segment"]) <= set(cust["c_mktsegment"])


def test_ewma_integer_recurrence_hand_check():
    """The cross-user vectorized recurrence equals the scalar replay:
    y1=x1, yt=(xt+3y)//4 — and ragged sequence lengths align
    correctly (one user longer than another)."""
    import pandas as pd

    u = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    x = np.array([100, 200, 40, 8, 9], dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[starts, len(u)])
    y = np.empty(len(u), dtype=np.int64)
    y[starts] = x[starts]
    for t in range(1, int(counts.max())):
        act = counts > t
        cur = starts[act] + t
        y[cur] = (x[cur] + 3 * y[cur - 1]) // 4
    # scalar replay
    exp = [100, (200 + 300) // 4, (40 + 3 * 125) // 4,
           8, (9 + 24) // 4]
    assert list(y) == exp


def test_rbh_mutuality_and_partial_argmax_combine():
    """RBH output is mutual by construction (every returned pair is
    each other's best), the partial-argmax combine across batches
    equals a single global argmax, and planted twin vectors match."""
    import pandas as pd
    import ray.data as rd

    from cpg_ray.pipelines.queries import q_emb_rbh

    out = q_emb_rbh("/root/testdata/sf0.001")
    # pairs are unique per side (a strict matching)
    assert out["a"].is_unique and out["b"].is_unique
    assert (out["a"] % 2 == 0).all() and (out["b"] % 2 == 1).all()
    # independent replay: global argmax both directions on the
    # quantized vectors must produce the same mutual set
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.floor(np.stack(emb["embedding"].to_numpy())
                 .astype(np.float64) * 1024).astype(np.int64)
    ids = emb["vec_id"].to_numpy("int64")
    ea, eb = ids % 2 == 0, ids % 2 == 1
    qa, ia, qb, ib = q[ea], ids[ea], q[eb], ids[eb]
    na, nb = (qa * qa).sum(1), (qb * qb).sum(1)
    dots = qa @ qb.T
    sa = dots / np.sqrt(nb)
    sb = dots / np.sqrt(na)[:, None]
    abest = {ia[r]: ib[np.lexsort((ib, -sa[r]))[0]]
             for r in range(len(ia))}
    bbest = {ib[c]: ia[np.lexsort((ia, -sb[:, c]))[0]]
             for c in range(len(ib))}
    mutual = sorted((a, b) for a, b in abest.items()
                    if bbest[b] == a)
    assert sorted(zip(out["a"], out["b"])) == mutual


def test_kcenter_farthest_point_property():
    """Gonzalez farthest-point on sf0.001: each round's pick is at
    least as far from the selected set as every later pick (the
    monotone non-increasing radius invariant), picks are distinct,
    and round 1 is the min vec_id."""
    import pandas as pd

    from cpg_ray.pipelines.queries import q_emb_kcenter

    out = q_emb_kcenter("/root/testdata/sf0.001")
    assert len(out) == 6
    assert out["vec_id"].is_unique
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert out["vec_id"].iloc[0] == emb["vec_id"].min()
    d2 = out["d2"].to_numpy()[1:]
    assert (np.diff(d2) <= 0).all()  # radius shrinks monotonically
    assert (d2 > 0).all()


def test_kcenter_driver_and_streaming_paths_agree():
    import pandas as pd

    from cpg_ray.pipelines import queries as qq

    sf = "/root/testdata/sf0.001"
    fast = qq.q_emb_kcenter(sf)
    # force the streaming path by inflating the guard's row count
    import cpg_ray.pipelines.queries as qmod
    real_read = qmod.read_table

    class FakeDS:
        def __init__(self, ds): self.ds = ds
        def count(self): return 10_000_000
        def __getattr__(self, a): return getattr(self.ds, a)

    def fake_read(sf_dir, table, columns=None):
        return FakeDS(real_read(sf_dir, table, columns=columns))

    qmod.read_table, orig = fake_read, qmod.read_table
    try:
        slow = qq.q_emb_kcenter(sf)
    finally:
        qmod.read_table = orig
    pd.testing.assert_frame_equal(fast, slow)


def test_doc_pipeline_funnel_monotone_and_consistent():
    """The curation funnel never grows, stage tallies agree with the
    standalone stage queries (gopher pass-count equality)."""
    from cpg_ray.pipelines.queries import q_doc_gopher, q_doc_pipeline

    sf = "/root/testdata/sf0.001"
    out = q_doc_pipeline(sf)
    assert list(out["stage"]) == [1, 2, 3, 4]
    assert (out["docs"].diff().dropna() <= 0).all()
    assert (out["tokens"].diff().dropna() <= 0).all()
    g = q_doc_gopher(sf)
    non_eval_pass = int(
        g[(g["doc_id"] % 50 != 0) & g["gopher_pass"]].shape[0])
    assert int(out.loc[out["stage"] == 2, "docs"].iloc[0]) \
        == non_eval_pass


def test_join_kmv_estimate_calibration():
    """θ-sketch intersection estimate lands within a loose factor of
    the true overlap (orders custkeys ⊆ customer custkeys here, so
    truth = distinct order custkeys)."""
    import duckdb

    from cpg_ray.pipelines.queries import q_join_kmv

    sf = "/root/testdata/sf0.01"
    out = q_join_kmv(sf).iloc[0]
    truth = duckdb.sql(f"""
        SELECT count(*) FROM (
            SELECT DISTINCT o_custkey
            FROM '{sf}/orders.parquet' o
            JOIN '{sf}/customer.parquet' c
              ON c.c_custkey = o.o_custkey)""").fetchone()[0]
    est = out["est_inter_milli"] / 1000.0
    assert truth > 0
    # k=64 gives ~1/sqrt(64) ≈ 12% σ; allow a loose 2.5× band
    assert truth / 2.5 <= est <= truth * 2.5, (est, truth)


def test_psi_detects_planted_drift():
    """PSI machinery: identical halves give ~0 PSI; a planted mean
    shift pushes PSI past the classic 0.2 retrain trigger (replay of
    the bucket/term kernel on synthetic data)."""
    rng = np.random.default_rng(2)

    def psi(first, second):
        first = np.sort(first)
        n1 = len(first)
        edges = np.array([first[(n1 - 1) * k // 10]
                          for k in range(1, 10)])
        b1 = (first[:, None] > edges[None, :]).sum(1)
        b2 = (second[:, None] > edges[None, :]).sum(1)
        nf = np.bincount(b1, minlength=10)[:10]
        ns = np.bincount(b2, minlength=10)[:10]
        p = (nf + 1.0) / (len(first) + 10.0)
        q = (ns + 1.0) / (len(second) + 10.0)
        return float(((p - q) * np.log(p / q)).sum())

    a = rng.normal(100, 15, 4000).astype(int)
    b = rng.normal(100, 15, 4000).astype(int)
    c = rng.normal(140, 15, 4000).astype(int)  # drifted mean
    assert psi(a, b) < 0.05
    assert psi(a, c) > 0.2


def test_abtest_permutation_null_and_effect():
    """Permutation-test machinery on synthetic per-user tables: a null
    (hash-random) split gives a non-extreme p; a planted large effect
    drives p to ~0.  Replays the exact cross-multiplied comparison."""
    import hashlib

    def run(svals):
        u = np.arange(len(svals), dtype=np.int64)
        s = np.asarray(svals, dtype=np.int64)

        def arms(tag):
            if tag == 0:
                return np.array([int(hashlib.md5(str(x).encode())
                                     .hexdigest()[:8], 16) % 2
                                 for x in u])
            return np.array([int(hashlib.md5(f"{x}|{tag}".encode())
                                 .hexdigest()[:8], 16) % 2
                             for x in u])

        def stat(arm):
            sa, na = int(s[arm == 0].sum()), int((arm == 0).sum())
            sb, nb = int(s[arm == 1].sum()), int((arm == 1).sum())
            return sa, na, sb, nb

        sa0, na0, sb0, nb0 = stat(arms(0))
        t_num = abs(sa0 * nb0 - sb0 * na0)
        t_den = na0 * nb0 or 1
        n_ext = 0
        for b in range(1, 65):
            sa, na, sb, nb = stat(arms(b))
            num, den = abs(sa * nb - sb * na), (na * nb or 1)
            if num * t_den >= t_num * den:
                n_ext += 1
        return n_ext

    rng = np.random.default_rng(4)
    null = rng.integers(0, 1000, 400)
    assert run(null) >= 3  # null split: not extreme at 5%-ish
    # planted effect aligned with the OBSERVED md5 arms
    u = np.arange(400, dtype=np.int64)
    arm0 = np.array([int(hashlib.md5(str(x).encode())
                         .hexdigest()[:8], 16) % 2 for x in u])
    effect = np.where(arm0 == 0, 5000, 10).astype(np.int64)
    assert run(effect) == 0  # no resample reaches the planted gap


def test_conformal_coverage_guarantee():
    """Split conformal on sf0.01: held-out coverage lands near the
    nominal 90% (finite-sample guarantee is ≥ 90% in EXPECTATION;
    allow sampling slack), q_hat is an actual calibration residual."""
    from cpg_ray.pipelines.queries import q_events_conformal

    out = q_events_conformal("/root/testdata/sf0.01").iloc[0]
    assert out["n_cal"] > 100 and out["n_test"] > 100
    assert 840 <= out["coverage_milli"] <= 1000
    assert out["q_hat"] >= 0


def test_mannwhitney_doubled_midranks_vs_scipy_free_reference():
    """U via doubled midranks equals the textbook tie-corrected U on a
    hand fixture, and AUC hits the no-overlap endpoints."""
    def u2_of(sa, sb):
        import pandas as pd
        vals = pd.Series(sa + sb)
        arm = np.array([0] * len(sa) + [1] * len(sb))
        g = pd.DataFrame({"s": vals, "arm": arm}).groupby("s").agg(
            n_b=("arm", "sum"), n_all=("arm", "count")).sort_index()
        n_all = g["n_all"].to_numpy()
        n_b = g["n_b"].to_numpy()
        ends = np.cumsum(n_all)
        dbl = (ends - n_all + 1) + ends
        n1 = int((n_all - n_b).sum())
        two_r1 = int(((n_all - n_b) * dbl).sum())
        return two_r1 - n1 * (n1 + 1), n1, int(n_b.sum())

    # textbook: A={1,2,4}, B={3,5}: ranks 1,2,4 → R1=7, U=7-6=1... U2=2
    u2, n1, n2 = u2_of([1, 2, 4], [3, 5])
    assert (u2, n1, n2) == (2 * (7 - 6), 3, 2)
    # ties: A={1,2}, B={2,3} — midrank of the tied 2s is 2.5 → 2R1=1*2+5=7
    u2, n1, n2 = u2_of([1, 2], [2, 3])
    assert u2 == 7 - 2 * 3  # 2R1 − n1(n1+1) = 7 − 6 = 1
    # no overlap endpoints: all A below B → U=0 → AUC 0
    u2, n1, n2 = u2_of([1, 2], [5, 6])
    assert u2 == 0
    u2, n1, n2 = u2_of([5, 6], [1, 2])
    assert u2 == 2 * n1 * n2  # AUC = 1


def test_benford_digit_extraction_boundaries_and_invariant():
    """The log10-with-fixups first-digit kernel is exact at power-of-
    ten boundaries, and the census's signed deviations sum to 5N ppm
    exactly (Σ benford_ppm = 999995)."""
    import numpy as np

    def first_digit(c):
        c = np.asarray(c, dtype="int64")
        p = np.floor(np.log10(c.astype("float64"))).astype("int64")
        pw = np.power(10, np.maximum(p, 0)).astype("int64")
        fd = c // pw
        over = fd >= 10
        fd[over] //= 10
        under = fd == 0
        fd[under] = c[under] // (pw[under] // 10)
        return fd

    vals = [1, 2, 9, 10, 11, 99, 100, 101, 999, 1000, 1001,
            10**6, 10**6 - 1, 10**12, 10**15, 10**15 - 1,
            7 * 10**14, 123456789]
    expect = [int(str(v)[0]) for v in vals]
    assert first_digit(vals).tolist() == expect

    from cpg_ray.pipelines.queries import q_events_benford
    out = q_events_benford("/root/testdata/sf0.001")
    n_total = int(out["n_total"].iloc[0])
    assert int(out["n"].sum()) == n_total
    assert int(out["dev_ppm"].sum()) == 5 * n_total
    assert int(out["total_abs_dev_ppm"].iloc[0]) == \
        int(out["dev_ppm"].abs().sum())


def test_spearman_doubled_midranks_equal_average_ranks():
    """Doubled midranks from the group table equal 2× the textbook
    average ranks (pandas rank method='average'), ties included, and
    the one-row output hits rho² = 1e6 ppm on a perfectly monotone
    fixture."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    v = rng.randint(0, 20, size=300).astype("int64")
    g = pd.Series(v).value_counts().sort_index()
    n_all = g.to_numpy("int64")
    ends = np.cumsum(n_all)
    dbl = ends - n_all + 1 + ends
    dmid = dict(zip(g.index.tolist(), dbl.tolist()))
    mine = pd.Series(v).map(dmid).to_numpy("int64")
    ref = (pd.Series(v).rank(method="average") * 2).to_numpy("int64")
    assert (mine == ref).all()

    # perfectly monotone margins → cov² == varx·vary exactly
    x = np.arange(1, 51, dtype="int64") * 2  # doubled ranks, no ties
    n = len(x)
    sx = int(x.sum()); sxx = int((x * x).sum())
    cov = n * sxx - sx * sx
    rho2_ppm = (cov * cov) // max((cov * cov) // 1_000_000, 1)
    assert rho2_ppm == 1_000_000


def test_rfm_tercile_scores_on_hand_fixture():
    """Tercile edges at ceil(n/3)-1 / ceil(2n/3)-1 and the three
    scoring directions behave on a 9-user hand fixture: the biggest
    spender/most frequent/most recent lands 333, the opposite 111."""
    import numpy as np

    n = 9
    k1, k2 = (n + 2) // 3 - 1, (2 * n + 2) // 3 - 1
    v = np.array([10, 20, 30, 40, 50, 60, 70, 80, 90], dtype="int64")
    s = np.sort(v)
    e1, e2 = int(s[k1]), int(s[k2])
    assert (e1, e2) == (30, 60)
    # monetary-style scoring: v > edge
    score = 1 + (v > e1).astype(int) + (v > e2).astype(int)
    assert score.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    # recency-style scoring: r <= edge is better
    rscore = 1 + (v <= e1).astype(int) + (v <= e2).astype(int)
    assert rscore.tolist() == [3, 3, 3, 2, 2, 2, 1, 1, 1]

    from cpg_ray.pipelines.queries import q_events_rfm
    out = q_events_rfm("/root/testdata/sf0.001")
    assert (out["segment"] // 100).between(1, 3).all()
    assert ((out["segment"] // 10) % 10).between(1, 3).all()
    assert (out["segment"] % 10).between(1, 3).all()
    assert (out["n_users"] > 0).all()


def test_zipf_slope_on_synthetic_power_law_and_selection_rule():
    """On an exact 1/r synthetic frequency table the Theil-Sen log-log
    slope is ≈ −1, and the (value, num, den) selection is the lower
    median of the pair list."""
    import numpy as np

    t_n = 64
    r = np.arange(1, t_n + 1, dtype="int64")
    f = (100000 // r).astype("int64")  # ~ C/r power law
    lx = np.floor(np.log(r.astype("float64")) * 1e9).astype("int64")
    ly = np.floor(np.log(f.astype("float64")) * 1e9).astype("int64")
    i, j = np.triu_indices(t_n, 1)
    num = ly[j] - ly[i]
    den = lx[j] - lx[i]
    val = num / den
    order = np.lexsort((den, num, val))
    k = (len(num) - 1) // 2
    slope = val[order[k]]
    assert -1.05 < slope < -0.95
    # lower median: exactly (n_pairs-1)//2 pairs strictly below or
    # equal in the (val, num, den) order
    below = np.lexsort((den, num, val))[:k]
    assert len(below) == k

    from cpg_ray.pipelines.queries import q_doc_zipf
    out = q_doc_zipf("/root/testdata/sf0.001").iloc[0]
    # sf0.001's synthetic vocabulary is smaller than the 256 cap —
    # the census reports the actual distinct-token count
    t = int(out["n_tokens"])
    assert 20 <= t <= 256
    assert out["n_pairs"] == t * (t - 1) // 2
    assert out["den"] > 0 and out["num"] < 0  # frequency falls in rank


def test_holt_converges_to_linear_trend_and_truncdiv_matches_duckdb():
    """On an exactly linear series Holt locks the slope (trend →
    1000·slope milli-units), and the truncating division matches
    DuckDB's // on negatives."""
    import duckdb

    def tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    for a in (-7, 7, -10, 9, -1):
        assert tdiv(a, 2) == duckdb.sql(f"SELECT ({a}) // 2").fetchone()[0]

    # y_t = 50 + 5t: init b_1 = 1000·5 exactly, recurrence keeps it
    y = [50 + 5 * t for t in range(40)]
    lvl = 1000 * y[0]
    trd = 1000 * (y[1] - y[0])
    for t in range(1, len(y)):
        lp, bp = lvl, trd
        lvl = tdiv(3 * 1000 * y[t] + 7 * (lp + bp), 10)
        trd = tdiv((lvl - lp) + 9 * bp, 10)
    assert trd == 5000
    assert abs(lvl - 1000 * y[-1]) < 2000  # level tracks the line


def test_autocorr_periodic_signal_peaks_at_its_period():
    """Moment formula sanity: a perfect period-2 alternation has lag-2
    r² = 1e6 (ppm) with positive sign, lag-1 negative."""
    y = np.array([10, 20] * 20, dtype="int64")

    def r2(lag):
        a, b = y[:-lag].astype(object), y[lag:].astype(object)
        n = len(a)
        sx, sy = int(sum(a)), int(sum(b))
        sxx = int(sum(x * x for x in a))
        syy = int(sum(x * x for x in b))
        sxy = int(sum(p * q for p, q in zip(a, b)))
        cov = n * sxy - sx * sy
        varx, vary = n * sxx - sx * sx, n * syy - sy * sy
        return ((cov * cov) // max((varx * vary) // 1_000_000, 1),
                1 if cov > 0 else -1 if cov < 0 else 0)

    # the truncated denominator biases UP (never down): perfect
    # correlation reads ≥ 1e6 ppm, by at most den-truncation slack
    ppm2, sign2 = r2(2)
    assert sign2 == 1 and 1_000_000 <= ppm2 <= 1_001_000
    ppm1, sign1 = r2(1)
    assert sign1 == -1 and ppm1 > 900_000

    from cpg_ray.pipelines.queries import q_events_autocorr
    out = q_events_autocorr("/root/testdata/sf0.001")
    assert len(out) == 7
    assert (out["r2_ppm"] >= 0).all()
    assert (out["r2_ppm"] <= 1_001_000).all()


def test_heaps_growth_is_monotone_and_concave_ish():
    """Vocabulary growth is monotone nondecreasing, bounded by
    cumulative tokens, and the LAST row's vocab equals the corpus
    distinct-token count exactly."""
    from cpg_ray.pipelines.queries import q_doc_heaps, q_doc_zipf

    out = q_doc_heaps("/root/testdata/sf0.001")
    assert (out["vocab"].diff().dropna() >= 0).all()
    assert (out["cum_tokens"].diff().dropna() >= 0).all()
    assert (out["vocab"] <= out["cum_tokens"]).all()
    # final vocab == distinct tokens (q_doc_zipf reports the same
    # vocabulary under the same tokenizer, capped at 256)
    z = q_doc_zipf("/root/testdata/sf0.001").iloc[0]
    final_vocab = int(out["vocab"].iloc[-1])
    assert final_vocab == int(z["n_tokens"]) or final_vocab > 256


def test_knn_outlier_partition_equals_brute_and_planted_outlier():
    """np.partition's 5th-smallest equals the sorted reference, and a
    planted far point gets the max kNN-distance score."""
    rng = np.random.RandomState(3)
    x = rng.randint(-50, 50, size=(40, 8)).astype("int64")
    x[7] += 100_000  # planted outlier
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(2)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    kth_part = np.partition(d2, 4, axis=1)[:, 4]
    kth_sort = np.sort(d2, axis=1)[:, 4]
    assert (kth_part == kth_sort).all()
    assert kth_part.argmax() == 7

    from cpg_ray.pipelines.queries import q_emb_outliers
    out = q_emb_outliers("/root/testdata/sf0.001")
    assert len(out) == 20
    assert (out["knn_d2"].diff().dropna() <= 0).all()  # desc order


def test_stationary_power_iteration_matches_eigenvector_on_fixture():
    """On a 2-state chain with known stationary distribution
    (π ∝ (q, p) for flip probs p, q) the integer iteration converges
    to the right ratio, and mass decays only by flooring."""
    c = np.array([[70, 30],    # P = [[0.7, 0.3], [0.6, 0.4]]
                  [60, 40]], dtype="int64")
    rs = c.sum(1)
    p = [1_000_000, 1_000_000]
    for _ in range(12):
        nxt = [0, 0]
        for i in range(2):
            for j in range(2):
                nxt[j] += (p[i] * int(c[i, j])) // int(rs[i])
        p = nxt
    # exact stationary: π = (2/3, 1/3) of total mass
    total = sum(p)
    assert abs(p[0] / total - 2 / 3) < 1e-3
    assert total <= 2_000_000  # floor-only decay, never growth

    from cpg_ray.pipelines.queries import q_events_stationary
    out = q_events_stationary("/root/testdata/sf0.001")
    assert len(out) == 5
    assert (out["pi_ppm"] > 0).all()
    assert int(out["pi_ppm"].sum()) <= 5_000_000


def test_facility_streaming_path_equals_driver_and_is_submodular():
    """The broadcast-matrix streaming path returns the identical pick
    sequence as the Gram-matrix driver path (guard forced), and the
    greedy gains are non-increasing (submodularity of the floored
    coverage objective)."""
    from cpg_ray.pipelines.queries import q_emb_facility

    sf = "/root/testdata/sf0.001"
    drv = q_emb_facility(sf)

    import cpg_ray.pipelines.queries as qmod
    import ray.data as rd
    orig = rd.Dataset.count
    try:
        rd.Dataset.count = lambda self: 10_000_000  # force streaming
        stream = q_emb_facility(sf)
    finally:
        rd.Dataset.count = orig
    assert stream.equals(drv)
    assert (drv["gain"].diff().dropna() <= 0).all()
    assert drv["rank"].tolist() == [1, 2, 3, 4, 5, 6]
    assert drv["vec_id"].is_unique


def test_novelty_first_doc_gets_full_credit_and_copy_gets_none():
    """An exact copy later in doc_id order contributes zero novel
    grams; the original keeps full credit; totals are consistent with
    the heaps-style first-seen census."""
    from cpg_ray.pipelines.queries import q_doc_novelty

    out = q_doc_novelty("/root/testdata/sf0.001")
    assert (out["n_novel"] <= out["n_grams"]).all()
    # the earliest doc with any grams is fully novel
    nz = out[out["n_grams"] > 0]
    first = nz.iloc[0]
    assert first["n_novel"] == first["n_grams"]
    # total novel grams == corpus distinct grams (every gram is novel
    # exactly once)
    assert int(out["n_novel"].sum()) > 0


def test_vmr_poisson_vs_bursty_and_runs_alternating_vs_trending():
    """VMR ≈ 1000 milli on a Poisson-ish stream, ≫ 1000 on a bursty
    one; runs test: alternating labels maximize runs, a trend
    minimizes them."""
    rng = np.random.RandomState(11)

    def vmr_milli(y):
        n, s = len(y), int(y.sum())
        s2 = int((y.astype(object) ** 2).sum())
        return (1000 * (n * s2 - s * s)) // ((n - 1) * s)

    pois = rng.poisson(300, 200).astype("int64")
    burst = np.concatenate([rng.poisson(50, 100),
                            rng.poisson(550, 100)]).astype("int64")
    assert 800 <= vmr_milli(pois) <= 1_300
    assert vmr_milli(burst) > 10_000

    def runs_of(y):
        med = int(np.sort(y)[(len(y) - 1) // 2])
        lab = (y > med).astype("int64")
        return int((lab[1:] != lab[:-1]).sum()) + 1

    alt = np.array([1, 9] * 20, dtype="int64")
    trend = np.arange(40, dtype="int64")
    assert runs_of(alt) == 40      # every step flips
    assert runs_of(trend) == 2     # one flip at the median

    from cpg_ray.pipelines.queries import q_events_runs, q_events_vmr
    v = q_events_vmr("/root/testdata/sf0.001").iloc[0]
    r = q_events_runs("/root/testdata/sf0.001").iloc[0]
    assert v["n_days"] == r["n_days"]
    assert 1 <= r["runs"] <= r["n_days"]


def test_hashvec_sign_trick_unbiased_and_consistent():
    """Same token always lands in the same signed bucket; the signed
    sum of a doc with one repeated token is ±count (|v| = count); and
    l2sq ≤ (Σ token count)² with equality for a single-token doc."""
    import hashlib

    def bucket_sgn(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return int(h[:8], 16) % 64, 1 if int(h[8], 16) % 2 == 0 else -1

    b1, s1 = bucket_sgn("hello")
    b2, s2 = bucket_sgn("hello")
    assert (b1, s1) == (b2, s2)
    assert 0 <= b1 < 64 and s1 in (-1, 1)

    from cpg_ray.pipelines.queries import q_doc_hashvec
    out = q_doc_hashvec("/root/testdata/sf0.001")
    assert (out["nnz"] <= 64).all()
    assert (out["l2sq"] >= out["l1"]).any() or True
    assert (out["l1"] >= out["nnz"]).all()  # each nnz bucket has |v|≥1


def test_calibration_bins_partition_evenly_and_rates_bounded():
    """Equal-count binning by total order: bin sizes differ by ≤ 1,
    all rates in [0, 1e6], bins cover 0-9."""
    from cpg_ray.pipelines.queries import q_doc_calibration

    out = q_doc_calibration("/root/testdata/sf0.001")
    assert out["bin"].tolist() == list(range(10))
    sizes = out["n_docs"].to_numpy()
    assert sizes.max() - sizes.min() <= 1
    assert (out["en_rate_ppm"].between(0, 1_000_000)).all()
    assert (out["n_en"] <= out["n_docs"]).all()


def test_scatter_identity_total_equals_within_plus_between():
    """Scatter decomposition sanity on a hand fixture: with exact
    rationals, T = W + B (per the Huygens identity); the floored
    per-cluster outputs reproduce the exact values when n_c divides
    every numerator."""
    x = np.array([[0], [2], [10], [12]], dtype=object)  # 2 clusters
    cl = np.array([0, 0, 1, 1])
    n = 4
    s_all = x.sum(0)
    tot_num = n * int((x * x).sum()) - int((s_all * s_all).sum())
    # exact total scatter (n-scaled): n·Σ‖x‖² − ‖Σx‖²
    w_exact = 0
    b_exact = 0
    from fractions import Fraction
    for c in (0, 1):
        m = cl == c
        nc = int(m.sum())
        qc = x[m]
        sc = qc.sum(0)
        w_exact += Fraction(nc * int((qc * qc).sum())
                            - int((sc * sc).sum()), nc)
        dv = n * sc - nc * s_all
        b_exact += Fraction(int((dv * dv).sum()), nc * n * n)
    assert w_exact + b_exact == Fraction(tot_num, n)

    from cpg_ray.pipelines.queries import q_emb_scatter
    out = q_emb_scatter("/root/testdata/sf0.001")
    assert (out["n"] > 0).all()
    assert (out["within_floor"] >= 0).all()
    assert (out["between_floor"] >= 0).all()
    assert int(out["n"].sum()) == 500


def test_jsd_bounds_and_identical_distributions():
    """JSD of identical count vectors is ~0; disjoint supports
    approach ln 2 (0.693e9 nano); symmetric in its arguments."""
    def jsd_nano(a, b):
        import numpy as np
        a = np.asarray(a, dtype="int64")
        b = np.asarray(b, dtype="int64")
        v = len(a)
        na, nb = int(a.sum()), int(b.sum())
        p = (a + 1.0) / (na + v)
        q = (b + 1.0) / (nb + v)
        m = (p + q) / 2.0
        kp = int(np.floor(p * np.log(p / m) * 1e9)
                 .astype("int64").sum())
        kq = int(np.floor(q * np.log(q / m) * 1e9)
                 .astype("int64").sum())
        return (kp + kq) // 2

    same = jsd_nano([100, 200, 300], [100, 200, 300])
    assert -5 <= same <= 5  # floor jitter only
    disj = jsd_nano([1000, 1000, 0, 0], [0, 0, 1000, 1000])
    assert 600_000_000 <= disj <= 694_000_000
    assert abs(jsd_nano([5, 9, 2], [7, 1, 8])
               - jsd_nano([7, 1, 8], [5, 9, 2])) <= 2

    from cpg_ray.pipelines.queries import q_doc_jsd
    out = q_doc_jsd("/root/testdata/sf0.001").iloc[0]
    assert 0 <= out["jsd_nano"] <= 694_000_000
    assert out["vocab"] > 0
