"""Winnowing fingerprints vs an independent per-doc python oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.functions.dedup import _ROLL_C, winnow_fingerprints
from graphx_ray.ids import fnv1a64_words, mix64


def _as_int64(u):
    return int(np.uint64(u).astype(np.int64))


def test_winnow_matches_oracle(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 60)).tolist())
        for _ in range(40)
    ]
    texts += ["", "one two", "a b c d e f g h", "x " * 3]  # edge sizes
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    k, w = 5, 4
    got = (
        winnow_fingerprints(rd.from_pandas(df), k=k, window=w)
        .to_pandas()
        .groupby("doc_id")["fp"]
        .agg(set)
        .to_dict()
    )
    for did, text in zip(df["doc_id"], df["text"]):
        want = {_as_int64(v) for v in _oracle_raw(text, k, w)}
        assert got.get(did, set()) == want, f"doc {did}"


def _oracle_raw(text, k, w):
    words = text.lower().split()
    if len(words) < k:
        return set()
    wh = fnv1a64_words(np.asarray(words, object))
    sh = []
    for i in range(len(words) - k + 1):
        acc = np.uint64(wh[i])
        for j in range(1, k):
            acc = mix64(np.uint64(acc * _ROLL_C) ^ np.uint64(wh[i + j]))
        sh.append(np.uint64(acc))
    sel = set()
    if len(sh) < w:
        m = min(sh)
        sel.add(max(i for i, v in enumerate(sh) if v == m))
    else:
        for s in range(len(sh) - w + 1):
            win = sh[s : s + w]
            m = min(win)
            sel.add(s + max(i for i, v in enumerate(win) if v == m))
    return {sh[p] for p in sel}


def test_winnow_shared_run_guarantee(ray_session):
    """Any shared run of >= window+k-1 words shares >= 1 fingerprint."""
    k, w = 5, 4
    shared = "the quick brown fox jumps over the lazy dog today"  # 10 >= w+k-1=8
    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["intro words here " + shared + " tail one",
                 "completely different prefix tokens " + shared],
    })
    fp = winnow_fingerprints(rd.from_pandas(df), k=k, window=w).to_pandas()
    s0 = set(fp[fp.doc_id == 0]["fp"])
    s1 = set(fp[fp.doc_id == 1]["fp"])
    assert s0 & s1
