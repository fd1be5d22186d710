"""Hashed linear classifier vs a pure-python oracle; parallelism invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.classifier import classify, seeded_weights
from graphx_ray.ids import fnv1a64_words

DIM, SEED = 256, 17


def _oracle(docs: pd.DataFrame, *, dim=DIM, seed=SEED, threshold=0) -> pd.DataFrame:
    w = seeded_weights(dim, seed)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = ("" if text is None else text).lower().split()
        sc = 0
        for t in toks:
            h = int(fnv1a64_words(np.array([t], dtype="U"))[0])
            sc += int(w[h % dim])
        rows.append((int(doc_id), sc, len(toks), int(sc > threshold)))
    return pd.DataFrame(rows, columns=["doc_id", "score", "n_tokens", "keep"])


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(5)
    vocab = ["alpha", "Beta", "GAMMA", "delta-9", "x", "yy", "1234", "ösch"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(80)
    ]
    texts += ["", "   ", "repeat repeat repeat repeat"]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


def test_classifier_matches_oracle(docs, ray_session):
    got = (
        classify(rd.from_pandas(docs).repartition(7), dim=DIM, seed=SEED, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_classifier_parallelism_invariant(docs, ray_session):
    a = (
        classify(rd.from_pandas(docs).repartition(1), dim=DIM, seed=SEED)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        classify(rd.from_pandas(docs).repartition(13), dim=DIM, seed=SEED, concurrency=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_classifier_custom_weights(ray_session):
    """Caller-supplied trained weights drive the same kernel."""
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["good good", "bad"]})
    w = np.zeros(DIM, np.int64)
    gh = int(fnv1a64_words(np.array(["good"], dtype="U"))[0]) % DIM
    bh = int(fnv1a64_words(np.array(["bad"], dtype="U"))[0]) % DIM
    w[gh], w[bh] = 3, -5
    got = (
        classify(rd.from_pandas(docs), dim=DIM, weights=w)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["score"].tolist() == ([6, -5] if gh != bh else [2 * w[gh], w[bh]])
    assert got["keep"].tolist() == [1, 0]
