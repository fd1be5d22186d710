"""Widest (bottleneck) path and topological layering vs numpy oracles.

Both run the engine's max-gather supersteps (state/csr.py gather_max):
widest_path on the max-min semiring over the undirected weighted graph,
topo_layers on the max-plus semiring over the directed graph.
"""

import numpy as np
import pandas as pd
import pytest


def _widest_oracle(src, dst, w, n, source):
    """Max-min Bellman fixpoint: width(v) = max over paths source→v of the
    min edge weight; symmetrized like the engine's undirected pool."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w]).astype(np.int64)
    width = np.full(n, -1, np.int64)
    width[source] = np.iinfo(np.int64).max
    for _ in range(2 * n + 2):
        msg = np.where(width[s] < 0, np.int64(-1), np.minimum(width[s], ww))
        new = width.copy()
        np.maximum.at(new, d, msg)
        if np.array_equal(new, width):
            break
        width = new
    out = width.copy()
    out[source] = 0
    return out


def _topo_oracle(src, dst, n, rounds=None):
    """Max-plus Bellman from all-zeros: layer(v) = longest directed path
    ending at v. ``rounds`` pins the iterate count (pre-fixpoint replay)."""
    layer = np.zeros(n, np.int64)
    limit = rounds if rounds is not None else n + 1
    for _ in range(limit):
        new = layer.copy()
        np.maximum.at(new, dst, layer[src] + 1)
        if rounds is None and np.array_equal(new, layer):
            return layer
        layer = new
    if rounds is None:
        raise AssertionError("oracle graph had a cycle")
    return layer


@pytest.mark.parametrize("salt", [None, 4])
def test_widest_path_matches_oracle(ray_session, salt):
    from graphx_ray.pipelines.graph import Graph

    rng = np.random.default_rng(11)
    n_edges, n_verts = 300, 70
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n_verts, n_edges),
            "dst": rng.integers(0, n_verts, n_edges),
            "w": rng.integers(1, 9, n_edges),
        }
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    # vertex 69 isolated on purpose (unreachable → −1)
    edges = edges[(edges.src != 69) & (edges.dst != 69)].reset_index(drop=True)
    verts = pd.DataFrame({"vid": np.arange(n_verts, dtype=np.int64)})
    g = Graph(edges, verts, num_parts=3, salt_threshold=salt)
    try:
        got = (
            g.widest_path(0)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        g.close()
    want = _widest_oracle(
        edges.src.to_numpy(), edges.dst.to_numpy(), edges.w.to_numpy(), n_verts, 0
    )
    assert np.array_equal(got["vid"].to_numpy(), np.arange(n_verts))
    assert np.array_equal(got["width"].to_numpy(), want)
    assert got["width"].iloc[69] == -1  # isolated vertex unreachable
    assert got["width"].iloc[0] == 0  # source reports 0


def test_widest_path_pinned_rounds_stable(ray_session):
    """A reached fixpoint is stable: max_iter beyond convergence equals
    the converged run (the SQL-unroll contract)."""
    from graphx_ray.pipelines.graph import Graph

    edges = pd.DataFrame(
        {"src": [0, 1, 2, 0], "dst": [1, 2, 3, 3], "w": [5, 3, 7, 2]}
    )
    g = Graph(edges, num_parts=2)
    try:
        free = g.widest_path(0, as_table=True).to_pandas().sort_values("vid")
        pinned = g.widest_path(0, max_iter=12, as_table=True).to_pandas().sort_values("vid")
    finally:
        g.close()
    pd.testing.assert_frame_equal(
        free.reset_index(drop=True), pinned.reset_index(drop=True)
    )
    # path 0→1→2→3 has bottleneck min(5,3,7)=3 > direct edge w=2
    assert int(free.set_index("vid").loc[3, "width"]) == 3


@pytest.mark.parametrize("salt", [None, 3])
def test_topo_layers_matches_oracle_on_dag(ray_session, salt):
    from graphx_ray.pipelines.graph import Graph

    rng = np.random.default_rng(12)
    n_verts = 60
    a = rng.integers(0, n_verts, 400)
    b = rng.integers(0, n_verts, 400)
    keep = a != b
    src = np.minimum(a[keep], b[keep])  # u < v ⇒ acyclic
    dst = np.maximum(a[keep], b[keep])
    edges = pd.DataFrame({"src": src, "dst": dst})
    verts = pd.DataFrame({"vid": np.arange(n_verts, dtype=np.int64)})
    g = Graph(edges, verts, num_parts=3, salt_threshold=salt)
    try:
        got = (
            g.topo_layers()
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        g.close()
    want = _topo_oracle(src, dst, n_verts)
    assert np.array_equal(got["layer"].to_numpy(), want)


def test_topo_layers_grid_closed_form(ray_session):
    """Grid DAG (right/down edges): layer(r·C+c) = r + c exactly."""
    from graphx_ray.pipelines.graph import Graph
    from graphx_ray.sources.generators import grid_graph

    R, C = 6, 7
    g = Graph(grid_graph(R, C), num_parts=2)
    try:
        got = g.topo_layers(as_table=True).to_pandas().sort_values("vid")
    finally:
        g.close()
    v = got["vid"].to_numpy()
    assert np.array_equal(got["layer"].to_numpy(), v // C + v % C)


def test_topo_layers_cycle_detection(ray_session):
    from graphx_ray.pipelines.graph import Graph

    edges = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 0, 0]})
    g = Graph(edges, num_parts=2)
    try:
        with pytest.raises(ValueError, match="directed cycle"):
            g.topo_layers()
        # pinned rounds still replay deterministically on the cyclic graph
        got = (
            g.topo_layers(max_iter=3, as_table=True)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        g.close()
    want = _topo_oracle(
        np.array([0, 1, 2, 3]), np.array([1, 2, 0, 0]), 4, rounds=3
    )
    assert np.array_equal(got["layer"].to_numpy(), want)


def test_condensation_matches_networkx(ray_session):
    import networkx as nx

    from graphx_ray.pipelines.graph import Graph

    rng = np.random.default_rng(21)
    n_verts = 40
    # 70 edges / 40 verts: a 22-vertex giant SCC plus 18 smaller ones and
    # 27 cross edges — non-trivial contraction (240 edges collapse to ONE
    # SCC and an empty result, which ray.data to_pandas strips of columns)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, n_verts, 70),
            "dst": rng.integers(0, n_verts, 70),
        }
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    g = Graph(edges, num_parts=3)
    try:
        got = (
            g.condensation()
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
    finally:
        g.close()

    G = nx.DiGraph()
    G.add_nodes_from(range(n_verts))
    G.add_edges_from(edges.itertuples(index=False))
    lab = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            lab[v] = m
    agg: dict = {}
    for r in edges.itertuples(index=False):
        a, b = lab[r.src], lab[r.dst]
        if a != b:
            agg[(a, b)] = agg.get((a, b), 0) + 1
    want = (
        pd.DataFrame(
            [(a, b, w) for (a, b), w in agg.items()], columns=["src", "dst", "w"]
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the condensation is a DAG: topo_layers must converge, not raise
    g2 = Graph(got, num_parts=2)
    try:
        layers = g2.topo_layers(as_table=True).to_pandas()
    finally:
        g2.close()
    assert len(layers) == len(set(lab.values())) or len(layers) == len(
        np.unique(want[["src", "dst"]].to_numpy())
    )  # isolated components absent from the edge-derived universe


def test_approx_distances_matches_replay(ray_session):
    import networkx as nx

    from graphx_ray.pipelines.graph import Graph

    rng = np.random.default_rng(41)
    n_verts = 50
    edges = pd.DataFrame(
        {"src": rng.integers(0, n_verts, 120), "dst": rng.integers(0, n_verts, 120)}
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    verts = pd.DataFrame({"vid": np.arange(n_verts, dtype=np.int64)})
    lms, qv = [0, 1, 2], [3, 4, 5, 6]
    g = Graph(edges, verts, num_parts=3)
    try:
        got = (
            g.approx_distances(lms, qv)
            .to_pandas()
            .sort_values(["u", "v"])
            .reset_index(drop=True)
        )
    finally:
        g.close()
    G = nx.Graph()
    G.add_nodes_from(range(n_verts))
    G.add_edges_from(edges.itertuples(index=False))
    dl = {l: nx.single_source_shortest_path_length(G, l) for l in lms}
    rows = []
    for u in range(n_verts):
        for v in qv:
            cands = [dl[l][u] + dl[l][v] for l in lms if u in dl[l] and v in dl[l]]
            rows.append((u, v, min(cands) if cands else -1))
    want = pd.DataFrame(rows, columns=["u", "v", "est"]).sort_values(
        ["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # upper-bound property vs true distances (where both defined)
    for u in range(n_verts):
        for v in qv:
            e = int(want[(want.u == u) & (want.v == v)].est.iloc[0])
            try:
                true = nx.shortest_path_length(G, u, v)
            except nx.NetworkXNoPath:
                continue
            if e >= 0:
                assert e >= true
