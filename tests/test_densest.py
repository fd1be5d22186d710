"""Densest-subgraph BKV peel vs a pure-python round simulation."""

import collections

import numpy as np
import pandas as pd
import pytest

from graphx_ray.stages.structural import densest_subgraph
from oracles import fixture_graphs

FIX = fixture_graphs()


def densest_oracle(edges_df, *, factor=4, max_rounds=32) -> pd.DataFrame:
    es = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in zip(edges_df["src"], edges_df["dst"])
        if s != d
    }
    stats, last = [], {}
    for r in range(max_rounds):
        deg = collections.Counter()
        for u, v in es:
            deg[u] += 1
            deg[v] += 1
        if not deg:
            break
        V, E = len(deg), len(es)
        stats.append((r, V, E))
        for v in deg:
            last[v] = r
        drop = {v for v, d in deg.items() if d * V <= factor * E}
        if not drop:
            break
        es = {(u, v) for u, v in es if u not in drop and v not in drop}
    if not stats:
        return pd.DataFrame(columns=["vid", "last_round", "in_best"])
    br, bv, be = stats[0]
    for r, v, e in stats[1:]:
        if e * bv > be * v:
            br, bv, be = r, v, e
    rows = [(v, lr, int(lr >= br)) for v, lr in sorted(last.items())]
    return pd.DataFrame(rows, columns=["vid", "last_round", "in_best"])


def _run(edges_df, **kw) -> pd.DataFrame:
    got = densest_subgraph(edges_df, num_partitions=3, **kw).to_pandas()
    if got.empty:
        return pd.DataFrame(columns=["vid", "last_round", "in_best"])
    return got.sort_values("vid").reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "ring_n", "star_hub", "parallel_self", "random_multi"]
)
def test_densest_matches_oracle(name, ray_session):
    edges, _ = FIX[name]
    got = _run(edges)
    want = densest_oracle(edges)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_densest_random(ray_session):
    rng = np.random.default_rng(23)
    m = 500
    edges = pd.DataFrame(
        {"src": rng.integers(0, 80, m), "dst": rng.integers(0, 80, m), "w": 1}
    )
    got = _run(edges)
    want = densest_oracle(edges)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_densest_finds_planted_clique(ray_session):
    """K10 planted in a sparse ring: the best prefix must contain the
    clique and achieve ≥ half its density (2-approx at factor 4 on this
    instance's actual peel — check membership, the semantic point)."""
    k10 = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    ring = [(100 + i, 100 + (i + 1) % 40) for i in range(40)]
    ring += [(0, 100)]
    edges = pd.DataFrame(k10 + ring, columns=["src", "dst"])
    edges["w"] = 1
    got = _run(edges)
    best = set(got[got["in_best"] == 1]["vid"])
    assert set(range(10)) <= best
