"""Funnel analysis (temporal.funnel_steps) and PMI collocations
(functions/text.pmi_bigrams) — pure-python replays of the pinned integer
recipes, parallelism invariance, and semantic laws."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.text import pmi_bigrams
from graphx_ray.stages.temporal import funnel_steps


def _py_funnel(df, steps):
    reach = []
    n = {}
    for j, s in enumerate(steps, 1):
        n[j] = 0
    for uid, grp in df.groupby("user_id"):
        g = grp.sort_values(["ts_us", "event_id"], kind="stable")
        types = g["event_type"].tolist()
        pos = -1
        for j, s in enumerate(steps, 1):
            nxt = next((i for i, t in enumerate(types) if t == s and i > pos), None)
            if nxt is None:
                break
            pos = nxt
            n[j] += 1
    n1 = n[1]
    return [
        (j, steps[j - 1], n[j], (1_000_000 * n[j]) // n1 if n1 else 0)
        for j in range(1, len(steps) + 1)
    ]


def _rand_events(seed, n_users=25, n_ev=300):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {"user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
         "ts_us": rng.integers(0, 50, n_ev).astype(np.int64),  # many ties
         "event_id": np.arange(n_ev, dtype=np.int64),
         "event_type": rng.choice(["view", "click", "purchase", "error"], n_ev)}
    )


@pytest.mark.parametrize("seed", [1, 2])
def test_funnel_matches_python_replay(seed):
    df = _rand_events(seed)
    steps = ["view", "click", "purchase"]
    got = (
        funnel_steps(rd.from_pandas(df), steps, key_col="user_id",
                     ts_us_col="ts_us", type_col="event_type",
                     tiebreak_col="event_id", num_partitions=4)
        .to_pandas().sort_values("step").reset_index(drop=True)
    )
    want = pd.DataFrame(
        _py_funnel(df, steps),
        columns=["step", "event_type", "n_users", "conv_micro"],
    )
    assert got.astype(want.dtypes.to_dict()).equals(want)


def test_funnel_parallelism_invariance_and_laws():
    df = _rand_events(7, n_users=40, n_ev=600)
    steps = ["view", "click", "purchase"]
    kw = dict(key_col="user_id", ts_us_col="ts_us", type_col="event_type",
              tiebreak_col="event_id")
    a = funnel_steps(rd.from_pandas(df), steps, num_partitions=2, **kw).to_pandas()
    b = funnel_steps(rd.from_pandas(df).repartition(13), steps,
                     num_partitions=7, **kw).to_pandas()
    a = a.sort_values("step").reset_index(drop=True)
    b = b.sort_values("step").reset_index(drop=True)
    assert a.equals(b)
    # monotone: each step's reach is a subset of the previous step's
    n = a["n_users"].to_numpy()
    assert (n[1:] <= n[:-1]).all()
    assert a["conv_micro"].iloc[0] == 1_000_000 and n[0] > 0
    # a user whose events are in reverse order converts only step 1
    rev = pd.DataFrame(
        {"user_id": [1, 1, 1], "ts_us": [1, 2, 3],
         "event_id": [1, 2, 3],
         "event_type": ["purchase", "click", "view"]}
    )
    r = funnel_steps(rd.from_pandas(rev), steps, num_partitions=2, **kw).to_pandas()
    assert list(r.sort_values("step")["n_users"]) == [1, 0, 0]


def _py_pmi(texts, min_count):
    toks = [t for s in texts for t in s.lower().split()]
    unis = Counter(toks)
    bis = Counter()
    for s in texts:
        w = s.lower().split()
        bis.update(zip(w, w[1:]))
    W, B = len(toks), sum(bis.values())
    rows = []
    for (a, b), c in bis.items():
        if c >= min_count:
            pmi = (c.bit_length() + 2 * W.bit_length()
                   - B.bit_length() - unis[a].bit_length() - unis[b].bit_length())
            rows.append((a, b, c, unis[a], unis[b], pmi))
    return pd.DataFrame(
        rows, columns=["w1", "w2", "n_xy", "n_x", "n_y", "pmi_bits"]
    ).sort_values(["w1", "w2"]).reset_index(drop=True)


def test_pmi_matches_python_replay_and_invariance():
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 30)))
        for _ in range(40)
    ] + ["alpha beta alpha beta alpha beta"] * 3  # a planted collocation
    docs = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        pmi_bigrams(rd.from_pandas(docs), min_count=3, num_partitions=4)
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    )
    want = _py_pmi(texts, 3)
    assert got.astype(want.dtypes.to_dict()).equals(want)
    got2 = (
        pmi_bigrams(rd.from_pandas(docs).repartition(9), min_count=3,
                    num_partitions=2)
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    )
    assert got2.astype(want.dtypes.to_dict()).equals(want)
    # the planted collocation scores at (or within the quantization bit
    # of) the top — exact top-1 would over-read the ±3-bit contract
    ab = got[(got["w1"] == "alpha") & (got["w2"] == "beta")]
    assert len(ab) == 1
    assert ab["pmi_bits"].iloc[0] >= got["pmi_bits"].max() - 1


def test_pmi_quantization_bound_and_empty():
    # |pmi_bits − log2 PMI| ≤ 3 by the bitlength composition
    import math

    texts = ["a b a b a b c d c d", "b a d c a b x y x y"]
    docs = pd.DataFrame({"doc_id": [0, 1], "text": texts})
    got = pmi_bigrams(rd.from_pandas(docs), min_count=1, num_partitions=2).to_pandas()
    toks = [t for s in texts for t in s.split()]
    W = len(toks)
    B = sum(len(s.split()) - 1 for s in texts)
    for r in got.itertuples():
        true = math.log2(r.n_xy * W * W / (B * r.n_x * r.n_y))
        assert abs(r.pmi_bits - true) <= 3.0 + 1e-9
    empty = pmi_bigrams(
        rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [""]})),
        min_count=1, num_partitions=2,
    ).to_pandas()
    assert len(empty) == 0
