"""Eigenvector centrality: exact integer replay + numpy eigh direction."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.pipelines.graph import Graph
from oracles import fixture_graphs

FIX = fixture_graphs()


def _eig_replay(edges_df, iters):
    """The pinned recipe in pure python ints: symmetrized multi-edge list
    (self-loops doubled — the undirected_weighted staging), D = max
    weighted degree, x' = (Σ w·x + x) // (D+1) from x⁰ = 2⁶²//(D+1)."""
    sym = []
    for s, d, w in zip(edges_df["src"], edges_df["dst"], edges_df["w"]):
        s, d, w = int(s), int(d), int(w)
        sym.append((s, d, w))
        sym.append((d, s, w))
    deg = collections.Counter()
    for s, d, w in sym:
        deg[s] += w
    verts = sorted(deg)
    import math
    bound = 0
    for s, d, w in sym:
        bound = max(bound, int(np.ceil(np.sqrt(float(deg[s] * deg[d])))))
    shift = bound + 1
    big_d = max(deg.values())
    scale = (1 << 62) // ((big_d + 1) * (int(np.floor(np.sqrt(float(len(verts))))) + 2))
    x = {v: scale for v in verts}
    for _ in range(iters):
        m = collections.Counter()
        for s, d, w in sym:
            m[d] += w * x[s]
        x = {v: (m[v] + x[v]) // shift for v in verts}
    return pd.DataFrame(
        {"vid": verts, "eig_fix": [x[v] for v in verts]}
    ).astype({"vid": np.int64, "eig_fix": np.int64})


def _run(edges_df, iters, parts):
    g = Graph(rd.from_pandas(edges_df), num_parts=parts)
    try:
        return (
            g.eigenvector_centrality(iters=iters)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
            .astype({"vid": np.int64, "eig_fix": np.int64})
        )
    finally:
        g.close()


@pytest.mark.parametrize(
    "name", ["star_hub", "two_cliques_bridge", "ring_n", "parallel_self"]
)
def test_eigencentrality_matches_replay(name, ray_session):
    edges, _ = FIX[name]
    got = _run(edges, 8, 3)
    want = _eig_replay(edges, 8)
    pd.testing.assert_frame_equal(got, want)


def test_eigencentrality_direction_vs_eigh(ray_session):
    # star (bipartite — the +I shift prevents oscillation): hub dominates
    edges, _ = FIX["star_hub"]
    # |λ_min+1|/(λ₁+1) = 13.14/15.14 ≈ 0.868 per round (the bipartite
    # reflection is the slow mode) — 30 rounds reach cos > 0.999
    got = _run(edges, 30, 2)
    v = got.set_index("vid")["eig_fix"].astype(np.float64)
    n = 201
    A = np.zeros((n, n))
    for s, d, w in zip(edges["src"], edges["dst"], edges["w"]):
        A[int(s), int(d)] += w
        A[int(d), int(s)] += w
    evals, evecs = np.linalg.eigh(A)
    top = np.abs(evecs[:, -1])
    ve = v.reindex(range(n)).to_numpy()
    ve = ve / np.linalg.norm(ve)
    assert float(ve @ (top / np.linalg.norm(top))) > 0.999
    # hub strictly above every leaf, leaves all equal
    assert v[0] > v[1] and v[1:].nunique() == 1

    # two cliques + bridge: slower gap, symmetric start kills the
    # antisymmetric λ₂ component — 30 rounds reach the eigh direction
    edges2, _ = FIX["two_cliques_bridge"]
    got2 = _run(edges2, 30, 3)
    ids = got2["vid"].to_numpy()
    idx = {v: i for i, v in enumerate(ids)}
    m = len(ids)
    A2 = np.zeros((m, m))
    for s, d, w in zip(edges2["src"], edges2["dst"], edges2["w"]):
        A2[idx[int(s)], idx[int(d)]] += w
        A2[idx[int(d)], idx[int(s)]] += w
    _, ev2 = np.linalg.eigh(A2)
    t2 = np.abs(ev2[:, -1])
    v2 = got2["eig_fix"].to_numpy().astype(np.float64)
    v2 /= np.linalg.norm(v2)
    assert float(v2 @ (t2 / np.linalg.norm(t2))) > 0.99


def test_eigencentrality_parallelism_invariance(ray_session):
    edges, _ = FIX["two_cliques_bridge"]
    a = _run(edges, 8, 2)
    b = _run(edges, 8, 5)
    pd.testing.assert_frame_equal(a, b)
