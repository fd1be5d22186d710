import numpy as np
import pandas as pd
import pytest

from graphx_ray.pipelines.triangles import triangle_count
from oracles import fixture_graphs, triangles_oracle

FIX = fixture_graphs()


@pytest.mark.parametrize("name", list(FIX.keys()))
def test_triangles_match_oracle(name):
    edges, verts = FIX[name]
    vdf = pd.DataFrame({"vid": verts.astype(np.int64)})
    got = (
        triangle_count(edges, vertices=vdf, num_parts=3)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    want = triangles_oracle(edges, verts)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_k6_counts():
    edges, verts = FIX["two_cliques_bridge"]
    got = triangle_count(edges, num_parts=2).to_pandas().set_index("vid")["count"]
    # every K6 vertex is in C(5,2)=10 triangles
    for v in [0, 1, 2, 3, 4, 11, 12]:
        assert got[v] == 10


def test_triangle_count_approx_accuracy_and_determinism(ray_session):
    """DOULION estimator: global estimate within a loose relative bound of
    the exact count on a dense-ish random graph; identical at any
    parallelism (threshold sample is a pure hash function)."""
    import ray.data as rd

    from graphx_ray.pipelines.triangles import triangle_count, triangle_count_approx

    rng = np.random.default_rng(17)
    n = 6000
    edges = pd.DataFrame(
        {"src": rng.integers(0, 120, n), "dst": rng.integers(0, 120, n)}
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    exact = triangle_count(rd.from_pandas(edges), num_parts=3).to_pandas()
    total_exact = exact["count"].sum()  # 3x the triangle count
    got = {}
    for nblocks in (1, 5):
        est = triangle_count_approx(
            rd.from_pandas(edges).repartition(nblocks), p_inv=4, seed=13, num_parts=3
        ).to_pandas().sort_values("vid").reset_index(drop=True)
        got[nblocks] = est
    pd.testing.assert_frame_equal(got[1], got[5])  # parallelism-invariant
    total_est = got[1]["count"].sum()
    assert total_exact > 0
    assert abs(total_est - total_exact) / total_exact < 0.35, (total_est, total_exact)


def test_triangle_approx_zero_fills_sampled_out_vertices(ray_session):
    """ADVICE r3: a vertex whose EVERY incident edge is dropped by the
    DOULION sample must still appear with count 0 — the zero-fill universe
    is the PRE-sample graph's endpoints, not the sampled graph's."""
    import ray.data as rd

    from graphx_ray.pipelines.triangles import triangle_count_approx

    rng = np.random.default_rng(5)
    n = 1500
    edges = pd.DataFrame(
        {"src": rng.integers(0, 400, n), "dst": rng.integers(0, 400, n)}
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    universe = set(edges["src"]) | set(edges["dst"])
    # aggressive sampling so some vertices certainly lose all their edges
    est = triangle_count_approx(
        rd.from_pandas(edges), p_inv=16, seed=13, num_parts=3
    ).to_pandas()
    assert set(est["vid"]) == universe


def test_clustering_stats_matches_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from graphx_ray.pipelines.triangles import clustering_stats

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "src": rng.integers(0, 25, 150),
        "dst": rng.integers(0, 25, 150),
        "w": np.ones(150, np.int64),
    })
    got = clustering_stats(rd.from_pandas(df), num_parts=3).to_pandas()
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in zip(df.src, df.dst) if s != d
    )
    tri = nx.triangles(g)
    for vid, t, w in got[["vid", "tri", "wedges"]].itertuples(index=False):
        d = g.degree(int(vid))
        assert t == tri[int(vid)], vid
        assert w == d * (d - 1) // 2, vid
    assert set(got.vid) == set(g.nodes)
    # the exact-integer pair reproduces nx.clustering
    cl = nx.clustering(g)
    for vid, t, w in got[["vid", "tri", "wedges"]].itertuples(index=False):
        want = cl[int(vid)]
        assert abs((t / w if w else 0.0) - want) < 1e-12
