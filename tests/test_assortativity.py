"""Degree-assortativity sufficient stats vs brute force + networkx r."""

import numpy as np
import pandas as pd
import pytest

from graphx_ray.stages.structural import degree_assortativity_stats
from oracles import fixture_graphs

FIX = fixture_graphs()


def _stats_oracle(edges_df):
    es = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in zip(edges_df["src"], edges_df["dst"])
        if s != d
    }
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in es:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x, y = np.array(xs, np.int64), np.array(ys, np.int64)
    return len(x), int(x.sum()), int((x * x).sum()), int((x * y).sum())


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "ring_n", "star_hub", "random_multi"]
)
def test_assortativity_stats(name, ray_session):
    edges, _ = FIX[name]
    got = degree_assortativity_stats(edges, num_partitions=3).to_pandas()
    assert len(got) == 1
    m2, sx, sxx, sxy = _stats_oracle(edges)
    assert got.iloc[0].tolist() == [m2, sx, sxx, sxy]


def test_assortativity_matches_networkx(ray_session):
    nx = pytest.importorskip("networkx")
    rng = np.random.default_rng(9)
    m = 400
    edges = pd.DataFrame(
        {"src": rng.integers(0, 60, m), "dst": rng.integers(0, 60, m), "w": 1}
    )
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in zip(edges["src"], edges["dst"]) if s != d
    )
    want = nx.degree_assortativity_coefficient(g)
    got = degree_assortativity_stats(edges, num_partitions=2).to_pandas().iloc[0]
    m2, sx, sxx, sxy = (int(got[c]) for c in ["m2", "sx", "sxx", "sxy"])
    r = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    assert abs(r - want) < 1e-9
