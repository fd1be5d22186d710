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
