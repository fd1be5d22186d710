"""Seeded (semi-supervised) label propagation — pure-python replay of the
pinned synchronous semantics (frozen seeds, labeled-neighbor Σw majority,
smallest-label ties, voteless keep), parallelism invariance, and the
two-cliques separation law."""

import itertools
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.pipelines.graph import Graph


def _py_seeded_lpa(edges, seeds, iters):
    adj = defaultdict(lambda: defaultdict(float))
    for u, v, w in edges:
        if u == v:
            continue
        adj[u][v] += w
        adj[v][u] += w
    lab = {v: -1 for v in adj}
    lab.update(seeds)
    frozen = set(seeds)
    for _ in range(iters):
        new = dict(lab)
        changed = 0
        for v in adj:
            if v in frozen:
                continue
            score = defaultdict(float)
            for u, w in adj[v].items():
                if lab[u] >= 0:
                    score[lab[u]] += w
            if score:
                best = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                if best != lab[v]:
                    changed += 1
                new[v] = best
        lab = new
        if changed == 0:
            break
    return lab


@pytest.mark.parametrize("seed", [0, 1])
def test_seeded_lpa_matches_python_replay(ray_session, seed):
    rng = np.random.default_rng(seed)
    m, n = 150, 35
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    df = pd.DataFrame(
        {"src": src[keep], "dst": dst[keep],
         "w": np.ones(int(keep.sum()), np.int64)}
    )
    seeds = {int(df["src"].iloc[0]): 100, int(df["dst"].iloc[1]): 200}
    g = Graph(rd.from_pandas(df), num_parts=3)
    try:
        got = g.label_propagation_seeded(
            list(seeds), list(seeds.values()), max_iter=6
        ).to_pandas()
    finally:
        g.close()
    gd = dict(zip(got["vid"].astype(int), got["label"].astype(int)))
    want = _py_seeded_lpa(list(df.itertuples(index=False)), seeds, 6)
    assert gd == {v: l for v, l in want.items()}


def test_seeded_lpa_cliques_and_invariance(ray_session):
    e1 = [(a, b, 1) for a, b in itertools.combinations(range(5), 2)]
    e2 = [(a, b, 1) for a, b in itertools.combinations(range(10, 15), 2)]
    df = pd.DataFrame(e1 + e2 + [(4, 10, 1)], columns=["src", "dst", "w"])
    outs = []
    for p in (2, 5):
        g = Graph(rd.from_pandas(df), num_parts=p)
        try:
            outs.append(
                g.label_propagation_seeded([0, 14], [7, 9], max_iter=8)
                .to_pandas().sort_values("vid").reset_index(drop=True)
            )
        finally:
            g.close()
    pd.testing.assert_frame_equal(outs[0], outs[1])
    gd = dict(zip(outs[0]["vid"].astype(int), outs[0]["label"].astype(int)))
    assert all(gd[v] == 7 for v in range(5))
    assert all(gd[v] == 9 for v in range(10, 15))
    # validation: mismatched lengths / negative labels / duplicate seeds
    g = Graph(rd.from_pandas(df), num_parts=2)
    try:
        with pytest.raises(ValueError):
            g.label_propagation_seeded([1], [1, 2])
        with pytest.raises(ValueError):
            g.label_propagation_seeded([1], [-5])
        with pytest.raises(ValueError):
            g.label_propagation_seeded([1, 1], [2, 3])
        # absent seed vids are ignored; unreached vertices stay -1
        got = g.label_propagation_seeded([99_999], [1], max_iter=3).to_pandas()
        assert (got["label"] == -1).all()
    finally:
        g.close()
