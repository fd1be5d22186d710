"""n-gram benchmark decontamination vs a string-level pandas oracle,
on both the broadcast and the bucketed fallback paths."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.dedup import ngram_contamination


def _kgrams(text, k):
    w = text.lower().split()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _oracle(corpus, bench, k):
    bset = set()
    for t in bench["text"]:
        bset |= _kgrams(t, k)
    rows = []
    for did, t in zip(corpus["doc_id"], corpus["text"]):
        gs = _kgrams(t, k)
        hits = len(gs & bset)
        rows.append((did, len(gs), hits, int(hits > 0)))
    return pd.DataFrame(rows, columns=["doc_id", "n_shingles", "n_hits", "contaminated"])


@pytest.fixture
def data():
    rng = np.random.default_rng(5)
    vocab = ["red", "green", "blue", "cyan", "teal"]
    mk = lambda n: " ".join(rng.choice(vocab, size=n).tolist())
    corpus = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [mk(rng.integers(1, 25)) for _ in range(30)],
    })
    bench = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [mk(12) for _ in range(5)],
    })
    return corpus, bench


@pytest.mark.parametrize("broadcast_limit", [50_000_000, 1])
def test_contamination_matches_oracle(ray_session, data, broadcast_limit):
    corpus, bench = data
    k = 3
    got = (
        ngram_contamination(
            rd.from_pandas(corpus), rd.from_pandas(bench), k=k,
            broadcast_limit=broadcast_limit, num_partitions=3,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(corpus, bench, k).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got["contaminated"].sum() > 0  # the fixture actually overlaps
    assert (got["n_hits"] <= got["n_shingles"]).all()


def _fuzzy_fixture():
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(40)]
    bench_rows, corpus_rows, planted = [], [], []
    for b in range(10):
        words = list(rng.choice(vocab, 30))
        bench_rows.append((b, " ".join(words)))
        if b < 4:  # planted near-dups: perturb 3 words of a bench doc
            mut = words.copy()
            for p in range(3):
                mut[5 + p] = f"x{b}_{p}"
            corpus_rows.append((100 + b, " ".join(mut)))
            planted.append(100 + b)
    for c in range(50):  # unrelated corpus docs
        corpus_rows.append((200 + c, " ".join(rng.choice(vocab, 30))))
    return (
        pd.DataFrame(corpus_rows, columns=["doc_id", "text"]),
        pd.DataFrame(bench_rows, columns=["doc_id", "text"]),
        planted,
    )


def test_fuzzy_contamination_finds_planted_near_dups(ray_session):
    from graphx_ray.functions.dedup import fuzzy_contamination

    corpus, bench, planted = _fuzzy_fixture()
    got = fuzzy_contamination(
        rd.from_pandas(corpus), rd.from_pandas(bench), threshold=0.5
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # every planted near-dup is flagged with its source benchmark doc
    flagged = dict(zip(got["doc_id"], got["bench_id"]))
    for pid in planted:
        assert pid in flagged and flagged[pid] == pid - 100
    # jaccard of a 3-of-30-word perturbation lands near (n-k)/(n+k)
    assert (got.set_index("doc_id").loc[planted, "jaccard_e6"] > 500_000).all()
    # one row per contaminated corpus doc, never a benchmark id
    assert got["doc_id"].is_unique
    assert not set(got["doc_id"]) & set(bench["doc_id"])


def test_fuzzy_contamination_parallelism_invariant(ray_session):
    from graphx_ray.functions.dedup import fuzzy_contamination

    corpus, bench, _ = _fuzzy_fixture()
    outs = []
    for parts in (2, 5):
        outs.append(
            fuzzy_contamination(
                rd.from_pandas(corpus).repartition(parts),
                rd.from_pandas(bench).repartition(max(1, parts - 1)),
                threshold=0.5,
                num_partitions=parts + 3,
            ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
