"""Session windows (gap-based) and weighted SSSP vs oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.mark.parametrize("nblocks", [1, 4])
def test_session_window_matches_pandas(ray_session, nblocks):
    from graphx_ray.stages.temporal import session_window

    rng = np.random.default_rng(6)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "ts_us": rng.integers(0, 10_000_000, n),
            "v": rng.random(n),
        }
    )
    GAP = 50_000
    got = (
        session_window(
            rd.from_pandas(df).repartition(nblocks),
            ts_us_col="ts_us", gap_us=GAP, key_cols=["k"], value_col="v",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "session_start_us"])
        .reset_index(drop=True)
    )
    rows = []
    for k, grp in df.groupby("k"):
        g = grp.sort_values("ts_us")
        ts = g["ts_us"].to_numpy()
        ve6 = np.floor(g["v"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        new = np.ones(len(ts), bool)
        new[1:] = (ts[1:] - ts[:-1]) > GAP
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            m = sid == s
            rows.append((k, ts[m][0], ts[m][-1], int(m.sum()), int(ve6[m].sum())))
    want = pd.DataFrame(
        rows, columns=["k", "session_start_us", "session_end_us", "n_rows", "sum_v_e6"]
    ).sort_values(["k", "session_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sssp_weighted_matches_networkx(ray_session):
    import networkx as nx

    from graphx_ray.pipelines.graph import Graph

    rng = np.random.default_rng(8)
    n = 260
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 60, n),
            "dst": rng.integers(0, 60, n),
            "w": rng.integers(1, 9, n),
        }
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    verts = pd.DataFrame({"vid": np.arange(60, dtype=np.int64)})
    g = Graph(edges, verts, num_parts=3)
    try:
        got = g.sssp_weighted(0).to_pandas().set_index("vid")["dist"]
    finally:
        g.close()
    G = nx.Graph()
    for r in edges.itertuples():
        w = r.w
        if G.has_edge(r.src, r.dst):
            w = min(w, G[r.src][r.dst]["weight"])
        G.add_edge(r.src, r.dst, weight=w)
    dist = nx.single_source_dijkstra_path_length(G, 0)
    for v in verts.vid:
        want = dist.get(int(v), -1)
        assert got[v] == want, (v, got[v], want)
