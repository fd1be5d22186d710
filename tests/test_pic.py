"""Power iteration clustering vs an exact numpy replay of the pinned
integer semantics (pipelines/pic.py module doc), plus structural sanity:
two cliques joined by one bridge separate into different clusters."""

import numpy as np
import pandas as pd
import pytest

from graphx_ray.pipelines.pic import power_iteration_clustering
from oracles import fixture_graphs

FIX = fixture_graphs()


def pic_oracle(edges_df, *, k=4, iters=3, kmeans_iters=2, scale=1_000_000):
    src = edges_df["src"].to_numpy(np.int64)
    dst = edges_df["dst"].to_numpy(np.int64)
    w = edges_df["w"].to_numpy(np.int64)
    # undirected weighted view: both directions, self-loops kept (doubled)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    verts = np.unique(np.concatenate([s, d]))
    vi = {int(v): i for i, v in enumerate(verts)}
    deg = np.zeros(len(verts), np.int64)
    for a, wt in zip(s, ww):
        deg[vi[int(a)]] += wt
    x = np.full(len(verts), scale, np.int64)
    for _ in range(iters):
        nx = np.zeros(len(verts), np.int64)
        for a, b, wt in zip(s, d, ww):
            nx[vi[int(b)]] += (wt * x[vi[int(a)]]) // deg[vi[int(a)]]
        x = nx
    xmin, xmax = int(x.min()), int(x.max())
    if k <= 1:
        cent = np.array([xmin], np.int64)
    else:
        cent = xmin + ((xmax - xmin) * np.arange(k, dtype=np.int64)) // (k - 1)
    for _ in range(kmeans_iters):
        a = np.abs(x[:, None] - cent[None, :]).argmin(1)
        nc = cent.copy()
        for j in range(len(cent)):
            if (a == j).any():
                nc[j] = x[a == j].sum() // (a == j).sum()
        cent = nc
    a = np.abs(x[:, None] - cent[None, :]).argmin(1)
    return pd.DataFrame(
        {"vid": verts, "pic_micro": x, "cluster": a.astype(np.int64)}
    )


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "ring_n", "star_hub", "random_multi"]
)
def test_pic_matches_oracle(name, ray_session):
    edges, _ = FIX[name]
    got = (
        power_iteration_clustering(edges, k=3, iters=3, kmeans_iters=2, num_parts=3)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    want = pic_oracle(edges, k=3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pic_separates_unequal_cliques(ray_session):
    """K6 and K4 joined by one bridge: the cliques' interiors land in
    different clusters. (The symmetric two-K6 fixture is genuinely
    inseparable by ANY 1-D PIC embedding — mirror-image vertices get
    identical values — so the structural check needs asymmetry.)"""
    k6 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    k4 = [(i + 10, j + 10) for i in range(4) for j in range(i + 1, 4)]
    edges = pd.DataFrame(k6 + k4 + [(5, 10)], columns=["src", "dst"])
    edges["w"] = 1
    got = power_iteration_clustering(
        edges, k=3, iters=3, kmeans_iters=2, num_parts=2
    ).to_pandas()
    lab = got.set_index("vid")["cluster"]
    c1 = set(lab[v] for v in range(0, 5))      # K6 interior
    c2 = set(lab[v] for v in range(11, 14))    # K4 interior
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_pic_parallelism_invariant(ray_session):
    edges, _ = FIX["random_multi"]
    outs = [
        power_iteration_clustering(edges, k=4, iters=4, kmeans_iters=3, num_parts=p)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
        for p in (2, 5)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
