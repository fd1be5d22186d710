"""Distributed BPE trainer vs a pure-python Sennrich replay."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.bpe import bpe_round1_pairs, bpe_train


def sennrich_oracle(texts, merges):
    wc: collections.Counter = collections.Counter()
    for t in texts:
        wc.update(("" if t is None else t).lower().split())
    syms = {w: list(w) for w in wc}
    out = []
    for rank in range(merges):
        pc: collections.Counter = collections.Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # pinned tie-break: max count, then lexicographically smallest pair
        mx = max(pc.values())
        best = min(p for p, c in pc.items() if c == mx)
        out.append((rank, best[0], best[1], pc[best]))
        l, r = best
        for w, s in syms.items():
            i, ns = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return pd.DataFrame(out, columns=["rank", "left", "right", "count"])


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(3)
    vocab = ["banana", "bandana", "ananas", "cabana", "abba", "na", "low", "lowest", "newer"]
    return [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20)))
        for _ in range(50)
    ] + ["", "aaaa aaaa aaaaaa"]  # overlap stress: runs of identical pairs


def test_bpe_matches_sennrich(texts, ray_session):
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = bpe_train(
        rd.from_pandas(docs).repartition(5), merges=8, num_partitions=3
    ).to_pandas()
    want = sennrich_oracle(texts, 8)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_overlap_rule(ray_session):
    """'aaaa' with merge (a,a): greedy left-to-right gives aa+aa, count
    3 occurrences per word-instance of the pair before merging."""
    docs = pd.DataFrame({"doc_id": [0], "text": ["aaaa"]})
    got = bpe_train(rd.from_pandas(docs), merges=2, num_partitions=2).to_pandas()
    want = sennrich_oracle(["aaaa"], 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.iloc[0][["left", "right"]].tolist() == ["a", "a"]
    assert got.iloc[1][["left", "right"]].tolist() == ["aa", "aa"]


def test_bpe_round1_pairs(texts, ray_session):
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = (
        bpe_round1_pairs(rd.from_pandas(docs).repartition(4), num_partitions=3)
        .to_pandas()
        .sort_values(["l", "r"])
        .reset_index(drop=True)
    )
    wc: collections.Counter = collections.Counter()
    for t in texts:
        wc.update(t.lower().split())
    pc: collections.Counter = collections.Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += n
    want = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(pc.items())], columns=["l", "r", "n"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
