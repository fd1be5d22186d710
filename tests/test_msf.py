"""Borůvka minimum spanning forest vs networkx (unique weights) and the
forest laws (ties)."""

import numpy as np
import pandas as pd
import pytest

nx = pytest.importorskip("networkx")

from graphx_ray.pipelines.msf import minimum_spanning_forest


def _nx_graph(edges_df):
    g = nx.Graph()
    for s, d, w in zip(edges_df["src"], edges_df["dst"], edges_df["w"]):
        s, d, w = int(s), int(d), int(w)
        if s == d:
            continue
        if g.has_edge(s, d):
            if w < g[s][d]["weight"]:
                g[s][d]["weight"] = w
        else:
            g.add_edge(s, d, weight=w)
    return g


def _run(edges_df) -> pd.DataFrame:
    got = minimum_spanning_forest(edges_df, num_partitions=3).to_pandas()
    if got.empty:
        return pd.DataFrame(columns=["u", "v", "w"])
    return got.sort_values(["u", "v"]).reset_index(drop=True)


def test_msf_unique_weights_matches_networkx(ray_session):
    rng = np.random.default_rng(17)
    m = 300
    edges = pd.DataFrame(
        {"src": rng.integers(0, 70, m), "dst": rng.integers(0, 70, m)}
    )
    edges["w"] = rng.permutation(10_000)[:m]  # unique weights → unique MSF
    got = _run(edges)
    g = _nx_graph(edges)
    want = sorted(
        (min(u, v), max(u, v), d["weight"])
        for u, v, d in nx.minimum_spanning_edges(g, data=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == want


def test_msf_with_ties_is_valid_msf(ray_session):
    """Duplicate weights: the result must be acyclic, span the same
    components, and match networkx's total weight (all MSFs agree)."""
    rng = np.random.default_rng(23)
    m = 400
    edges = pd.DataFrame(
        {"src": rng.integers(0, 60, m), "dst": rng.integers(0, 60, m),
         "w": rng.integers(1, 5, m)}
    )
    got = _run(edges)
    g = _nx_graph(edges)
    want_w = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(g, data=True)
    )
    f = nx.Graph()
    f.add_nodes_from(g.nodes)
    for u, v, w in got.to_numpy():
        assert g.has_edge(u, v) and g[u][v]["weight"] == w
        f.add_edge(u, v)
    assert nx.is_forest(f)
    assert got["w"].sum() == want_w
    assert nx.number_connected_components(f) == nx.number_connected_components(g)


def test_msf_disconnected_and_chain(ray_session):
    """A long path plus a separate triangle: the path forces many
    Borůvka rounds of pointer-jump chains; forest = path edges + the two
    cheapest triangle edges."""
    path = [(i, i + 1, 10 + i) for i in range(40)]
    tri = [(100, 101, 1), (101, 102, 2), (100, 102, 3)]
    edges = pd.DataFrame(path + tri, columns=["src", "dst", "w"])
    got = _run(edges)
    want = sorted(
        [(min(s, d), max(s, d), w) for s, d, w in path]
        + [(100, 101, 1), (101, 102, 2)]
    )
    assert [tuple(r) for r in got.to_numpy()] == want


def test_msf_parallel_and_self_edges(ray_session):
    edges = pd.DataFrame(
        {"src": [0, 0, 1, 1, 2, 2], "dst": [1, 1, 0, 1, 0, 1],
         "w": [5, 3, 4, 9, 7, 2]}
    )
    got = _run(edges)
    assert [tuple(r) for r in got.to_numpy()] == [(0, 1, 3), (1, 2, 2)]
