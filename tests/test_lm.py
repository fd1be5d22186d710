"""Bigram surprisal scoring vs a pure-python oracle; invariance checks."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.lm import bigram_surprisal


def lm_oracle(docs: pd.DataFrame) -> pd.DataFrame:
    toks = {
        int(d): ("" if t is None else t).lower().split()
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    uni: collections.Counter = collections.Counter()
    big: collections.Counter = collections.Counter()
    for ws in toks.values():
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    v = len(uni)
    rows = []
    for d, ws in sorted(toks.items()):
        bits = sum(
            (uni[p] + v).bit_length() - (big[(p, c)] + 1).bit_length()
            for p, c in zip(ws, ws[1:])
        )
        rows.append((d, max(len(ws) - 1, 0), bits))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "total_bits"])


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(31)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "Zebra"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for _ in range(60)
    ]
    texts += ["", "single", "the the the the the the"]
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _run(docs_df, parts) -> pd.DataFrame:
    return (
        bigram_surprisal(rd.from_pandas(docs_df).repartition(parts), num_partitions=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_lm_matches_oracle(docs, ray_session):
    got = _run(docs, 5)
    want = lm_oracle(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lm_parallelism_invariant(docs, ray_session):
    a = _run(docs, 1)
    b = _run(docs, 11)
    pd.testing.assert_frame_equal(a, b)


def test_lm_repetition_scores_lower(ray_session):
    """A repetitive doc has lower mean surprisal than a shuffled-vocab
    doc — the signal CCNet uses, direction-checked."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    rep = " ".join(["alpha beta"] * 40)
    rnd = " ".join(rng.choice(vocab, size=80))
    filler = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
    docs_df = pd.DataFrame(
        {"doc_id": np.arange(22, dtype=np.int64),
         "text": [rep, rnd] + filler}
    )
    got = _run(docs_df, 4).set_index("doc_id")
    mean_rep = got.loc[0, "total_bits"] / got.loc[0, "n_bigrams"]
    mean_rnd = got.loc[1, "total_bits"] / got.loc[1, "n_bigrams"]
    assert mean_rep < mean_rnd


def kn_oracle(docs: pd.DataFrame) -> pd.DataFrame:
    """Pure-python interpolated KN (d = 3/4) under the pinned rational."""
    toks = {
        int(d): ("" if t is None else t).lower().split()
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    big: collections.Counter = collections.Counter()
    for ws in toks.values():
        big.update(zip(ws, ws[1:]))
    B = len(big)
    c = collections.Counter()
    n1p = collections.Counter()
    nl = collections.Counter()
    for (p, w), k in big.items():
        c[p] += k
        n1p[p] += 1
        nl[w] += 1
    rows = []
    for d, ws in sorted(toks.items()):
        bits = 0
        for p, w in zip(ws, ws[1:]):
            den = 4 * c[p] * B
            num = max(4 * big[(p, w)] - 3, 0) * B + 3 * n1p[p] * nl[w]
            bits += den.bit_length() - num.bit_length()
        rows.append((d, max(len(ws) - 1, 0), bits))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "total_bits"])


def test_kn_matches_oracle_and_invariance(docs, ray_session):
    from graphx_ray.functions.lm import kn_surprisal

    outs = [
        kn_surprisal(rd.from_pandas(docs).repartition(p), num_partitions=q)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
        for p, q in ((5, 3), (1, 7))
    ]
    want = kn_oracle(docs)
    pd.testing.assert_frame_equal(outs[0], want, check_dtype=False)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_kn_probability_sanity(docs, ray_session):
    """KN bits ≥ 0 (a proper probability) and rare continuations cost
    more bits than frequent ones on a crafted corpus."""
    crafted = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3],
         "text": ["a b", "a b", "a b", "a q"]}
    )
    from graphx_ray.functions.lm import kn_surprisal

    got = (
        kn_surprisal(rd.from_pandas(crafted), num_partitions=2)
        .to_pandas().set_index("doc_id")
    )
    assert (got["total_bits"] >= 0).all()
    assert got.loc[3, "total_bits"] > got.loc[0, "total_bits"]
