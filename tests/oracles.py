"""Closed-form single-process oracles for the algorithm contracts
(SURVEY.md Appendix A) — implemented verbatim from the spec text."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _index(vertices: np.ndarray):
    vs = np.sort(np.unique(vertices))
    return vs, {v: i for i, v in enumerate(vs)}


def pagerank_oracle(edges: pd.DataFrame, vertices, alpha=0.15, max_iter=20) -> pd.DataFrame:
    """A.1: r0=1; r' = α + (1−α)·Σ w·r(u)/outdeg(u); no dangling fix, no
    normalization; parallel edges (weights) count."""
    vs, idx = _index(np.asarray(vertices))
    n = len(vs)
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["w"].to_numpy().astype(np.float64) if "w" in edges else np.ones(len(src))
    outdeg = np.zeros(n)
    np.add.at(outdeg, src, w)
    r = np.ones(n)
    for _ in range(max_iter):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1.0), 0.0)
        acc = np.zeros(n)
        np.add.at(acc, dst, contrib[src] * w)
        r = alpha + (1 - alpha) * acc
    return pd.DataFrame({"vid": vs, "rank": r})


def cc_oracle(edges: pd.DataFrame, vertices) -> pd.DataFrame:
    """A.2: component = min vid of the component; canonical undirected."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(np.asarray(vertices).tolist())
    g.add_edges_from(
        (int(a), int(b))
        for a, b in zip(edges["src"], edges["dst"])
        if int(a) != int(b)
    )
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    df = pd.DataFrame({"vid": list(out.keys()), "component": list(out.values())})
    return df.astype({"vid": "int64", "component": "int64"}).sort_values("vid").reset_index(drop=True)


def lpa_oracle(edges: pd.DataFrame, vertices, max_iter=5) -> pd.DataFrame:
    """A.3: synchronous; each directed edge contributes both directions with
    its weight; no messages ⇒ keep; tie → smallest label."""
    vs, idx = _index(np.asarray(vertices))
    n = len(vs)
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["w"].to_numpy().astype(np.float64) if "w" in edges else np.ones(len(src))
    labels = vs.astype(np.int64).copy()
    for _ in range(max_iter):
        hist: list[dict] = [dict() for _ in range(n)]
        for s, d, ww in zip(src, dst, w):
            hist[d][labels[s]] = hist[d].get(labels[s], 0.0) + ww
            hist[s][labels[d]] = hist[s].get(labels[d], 0.0) + ww
        new = labels.copy()
        for v in range(n):
            if hist[v]:
                best = max(hist[v].items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        labels = new
    return pd.DataFrame({"vid": vs, "label": labels})


def triangles_oracle(edges: pd.DataFrame, vertices) -> pd.DataFrame:
    """A.4: per-vertex triangle count on the canonical simple graph."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(np.asarray(vertices).tolist())
    g.add_edges_from(
        (int(a), int(b))
        for a, b in zip(edges["src"], edges["dst"])
        if int(a) != int(b)
    )
    tri = nx.triangles(g)
    df = pd.DataFrame({"vid": list(tri.keys()), "count": list(tri.values())})
    return df.astype({"vid": "int64", "count": "int64"}).sort_values("vid").reset_index(drop=True)


# ------------------------------------------------------- adversarial fixtures


def fixture_graphs() -> dict[str, tuple[pd.DataFrame, np.ndarray]]:
    """(edges df (src,dst,w), vertex universe) per FIXTURES.md §3."""
    rng = np.random.default_rng(42)
    out = {}

    hub_leaves = np.arange(1, 201)
    out["star_hub"] = (
        pd.DataFrame({"src": np.zeros(200, np.int64), "dst": hub_leaves, "w": 1}),
        np.arange(0, 201),
    )

    k6a = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    k6b = [(i + 10, j + 10) for i, j in k6a]
    bridge = [(5, 10)]
    e = pd.DataFrame(k6a + k6b + bridge, columns=["src", "dst"])
    e["w"] = 1
    out["two_cliques_bridge"] = (e, np.concatenate([np.arange(6), np.arange(10, 16)]))

    ring = pd.DataFrame({"src": np.arange(12), "dst": (np.arange(12) + 1) % 12, "w": 1})
    out["ring_n"] = (ring, np.arange(12))

    out["isolated"] = (
        pd.DataFrame({"src": [1], "dst": [2], "w": [1]}),
        np.array([1, 2, 50, 60, 70]),
    )

    par = pd.DataFrame(
        {
            "src": [0, 0, 0, 1, 2, 3, 3],
            "dst": [1, 1, 0, 2, 0, 3, 1],
            "w": [2, 1, 1, 3, 1, 2, 1],
        }
    )
    out["parallel_self"] = (par, np.arange(4))

    out["empty"] = (
        pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64), "w": np.empty(0, np.int64)}),
        np.array([7, 8, 9]),
    )

    n = 60
    m = 150
    re = pd.DataFrame(
        {
            "src": rng.integers(0, n, m),
            "dst": rng.integers(0, n, m),
            "w": rng.integers(1, 4, m),
        }
    )
    out["random_multi"] = (re, np.arange(n))
    return out
