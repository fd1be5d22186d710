"""GraphFrames bfs(fromExpr, toExpr) path search vs a networkx oracle."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphx_ray.pipelines.bfs_paths import bfs_paths


def _nx_oracle(edges: pd.DataFrame, fset, tset, max_len=10) -> set[str]:
    """All shortest directed paths from any f∈fset to any t∈tset at the
    GLOBAL minimal from-set→to-set distance, as '->'-joined strings."""
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(edges[["src", "dst"]].itertuples(index=False))
    best = None
    dists = {}
    for f in fset:
        if f not in g:
            continue
        d = nx.single_source_shortest_path_length(g, f, cutoff=max_len)
        dists[f] = d
        for t in tset:
            if t in d:
                best = d[t] if best is None else min(best, d[t])
    if best is None:
        return set()
    out = set()
    for f in fset:
        if f not in dists:
            continue
        for t in tset:
            if dists[f].get(t) == best:
                if best == 0:
                    out.add(str(f))
                else:
                    for p in nx.all_shortest_paths(g, f, t):
                        out.add("->".join(map(str, p)))
    return out


def _engine(edges: pd.DataFrame, verts: np.ndarray, from_expr, to_expr) -> pd.DataFrame:
    vdf = pd.DataFrame({"vid": verts.astype(np.int64)})
    res = bfs_paths(
        rd.from_pandas(edges), rd.from_pandas(vdf), from_expr, to_expr,
        num_partitions=4,
    )
    return res.to_pandas()


def test_bfs_paths_random_graph(ray_session):
    rng = np.random.default_rng(5)
    n = 40
    edges = pd.DataFrame(
        {"src": rng.integers(0, n, 220), "dst": rng.integers(0, n, 220)}
    )
    edges = edges[edges.src != edges.dst].reset_index(drop=True)
    verts = np.arange(n)
    fset = [0, 1]
    tset = [37, 38, 39]
    got = _engine(edges, verts, "vid <= 1", "vid >= 37")
    want = _nx_oracle(edges, fset, tset)
    assert set(got["path"]) == want
    if len(got):
        k = int(got["hops"].iloc[0])
        assert (got["hops"] == k).all()
        assert (got["from"].astype(str) == got["path"].str.split("->").str[0]).all()
        assert (got["to"].astype(str) == got["path"].str.split("->").str[-1]).all()


def test_bfs_paths_zero_hop_and_unreachable(ray_session):
    edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    verts = np.array([1, 2, 3, 9])
    # 2 matches both expressions -> single k=0 row
    got = _engine(edges, verts, "vid == 2", "vid >= 2")
    assert got.to_dict("list") == {"from": [2], "to": [2], "hops": [0], "path": ["2"]}
    # 9 is isolated -> unreachable -> empty with stable schema
    got = _engine(edges, verts, "vid == 1", "vid == 9")
    assert len(got) == 0
    # ray.data drops the schema of an EMPTY Dataset on to_pandas()
    # (documented sharp edge) — tolerate the columnless zero-row frame
    assert list(got.columns) in ([], ["from", "to", "hops", "path"])


def test_bfs_paths_all_paths_multiplicity(ray_session):
    # diamond: 0->{1,2}->3 — two shortest 2-hop paths
    edges = pd.DataFrame({"src": [0, 0, 1, 2, 0], "dst": [1, 2, 3, 3, 4]})
    verts = np.arange(5)
    got = _engine(edges, verts, "vid == 0", "vid == 3")
    assert sorted(got["path"]) == ["0->1->3", "0->2->3"]
    assert (got["hops"] == 2).all()
