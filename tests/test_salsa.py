"""SALSA (SURVEY.md A.18) vs an exact numpy replay of the pinned integer
semantics, plus salted-hub bit-parity, parallelism invariance, and the
degree-normalization property that separates SALSA from HITS."""

import numpy as np
import pandas as pd
import pytest
import ray

from graphx_ray.pipelines.graph import Graph
from oracles import fixture_graphs

FIX = fixture_graphs()


def salsa_replay(edges: pd.DataFrame, iters: int = 3, scale: int = 1_000_000):
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    w = (
        edges["w"].to_numpy(np.int64)
        if "w" in edges.columns
        else np.ones(len(src), np.int64)
    )
    vids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    od = np.zeros(len(vids), np.int64)
    np.add.at(od, si, w)
    od = np.maximum(od, 1)
    ind = np.zeros(len(vids), np.int64)
    np.add.at(ind, di, w)
    ind = np.maximum(ind, 1)
    h = np.full(len(vids), scale, np.int64)
    a = np.zeros(len(vids), np.int64)
    for _ in range(iters):
        a = np.zeros(len(vids), np.int64)
        np.add.at(a, di, (h[si] * w) // od[si])
        h = np.zeros(len(vids), np.int64)
        np.add.at(h, si, (a[di] * w) // ind[di])
    return pd.DataFrame({"vid": vids, "hub": h, "auth": a})


def _run(edges, *, num_parts=3, salt_threshold=None, iters=3):
    g = Graph(
        ray.data.from_pandas(edges), num_parts=num_parts, salt_threshold=salt_threshold
    )
    try:
        return (
            g.salsa(iters=iters, as_table=True)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        g.close()


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "ring_n", "star_hub", "random_multi"]
)
def test_salsa_matches_replay(name, ray_session):
    edges, _ = FIX[name]
    got = _run(edges)
    want = salsa_replay(edges).sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salsa_salted_hub_bit_parity(ray_session):
    rows = [(0, i) for i in range(1, 41)] + [(i, 0) for i in range(41, 60)]
    rows += [(5, 6), (6, 7)]
    edges = pd.DataFrame(rows, columns=["src", "dst"])
    plain = _run(edges, num_parts=4)
    salted = _run(edges, num_parts=4, salt_threshold=10)
    pd.testing.assert_frame_equal(plain, salted)


def test_salsa_parallelism_invariant(ray_session):
    edges, _ = FIX["random_multi"]
    outs = [_run(edges, num_parts=p) for p in (1, 3, 5)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)


def test_salsa_degree_normalization_vs_hits(ray_session):
    """The TKC-effect fixture (Lempel & Moran §3): a tight 3-clique of
    mutually-reinforcing pages vs one page cited by many weak sources.
    HITS auth concentrates on the clique; SALSA's random-walk
    normalization ranks the widely-cited page at least as high."""
    clique = [(i, j) for i in (100, 101, 102) for j in (100, 101, 102) if i != j]
    popular = [(k, 7) for k in range(20)]
    edges = pd.DataFrame(clique + popular, columns=["src", "dst"])
    got = _run(edges, iters=4).set_index("vid")
    assert got.loc[7, "auth"] >= got.loc[100, "auth"]
