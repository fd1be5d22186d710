"""Link prediction (common neighbors + Jaccard) vs a brute-force oracle."""

import collections
import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphx_ray.pipelines.linkpred import edge_jaccard, link_prediction
from oracles import fixture_graphs

FIX = fixture_graphs()


def lp_oracle(edges_df, *, max_degree=None, min_cn=1, candidates="non_edges") -> pd.DataFrame:
    adj: dict[int, set] = collections.defaultdict(set)
    for s, d in zip(edges_df["src"], edges_df["dst"]):
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    eset = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in zip(edges_df["src"], edges_df["dst"])
        if s != d
    }
    cnt: collections.Counter = collections.Counter()
    for _, ns in adj.items():
        if max_degree is not None and len(ns) > max_degree:
            continue
        for a, b in itertools.combinations(sorted(ns), 2):
            cnt[(a, b)] += 1
    rows = []
    for (a, b), cn in sorted(cnt.items()):
        is_edge = (a, b) in eset
        if cn < min_cn or (is_edge if candidates == "non_edges" else not is_edge):
            continue
        da, db = len(adj[a]), len(adj[b])
        jm = int(np.floor(1e6 * cn / (da + db - cn) + 0.5))
        rows.append((a, b, cn, jm))
    return pd.DataFrame(rows, columns=["a", "b", "cn", "jacc_micro"])


def _run(edges_df, **kw) -> pd.DataFrame:
    got = link_prediction(edges_df, num_parts=3, **kw).to_pandas()
    if got.empty:
        return pd.DataFrame(columns=["a", "b", "cn", "jacc_micro"])
    return (
        got[["a", "b", "cn", "jacc_micro"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "name",
    ["two_cliques_bridge", "ring_n", "star_hub", "parallel_self", "random_multi"],
)
def test_linkpred_matches_oracle(name, ray_session):
    edges, _ = FIX[name]
    got = _run(edges)
    want = lp_oracle(edges)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_linkpred_random_graph(ray_session):
    rng = np.random.default_rng(7)
    m = 400
    edges = pd.DataFrame(
        {"src": rng.integers(0, 60, m), "dst": rng.integers(0, 60, m), "w": 1}
    )
    got = _run(edges)
    want = lp_oracle(edges)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_linkpred_degree_cap_and_min_cn(ray_session):
    rng = np.random.default_rng(11)
    m = 300
    edges = pd.DataFrame(
        {"src": rng.integers(0, 40, m), "dst": rng.integers(0, 40, m), "w": 1}
    )
    got = _run(edges, max_degree=8, min_cn=2)
    want = lp_oracle(edges, max_degree=8, min_cn=2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_linkpred_cap_empties_star(ray_session):
    """Star graph with the hub capped out: leaves have degree 1 (no pairs
    from leaf centers), so the result is empty — exercises the
    empty-schema path end to end."""
    edges, _ = FIX["star_hub"]
    got = _run(edges, max_degree=1)
    assert len(got) == 0


def test_edge_jaccard_matches_oracle(ray_session):
    """Existing-edge embeddedness: triangle edges score, bridge scores 0
    common neighbors (absent)."""
    rng = np.random.default_rng(19)
    m = 350
    edges = pd.DataFrame(
        {"src": rng.integers(0, 50, m), "dst": rng.integers(0, 50, m), "w": 1}
    )
    got = (
        edge_jaccard(edges, num_parts=3)
        .to_pandas()[["a", "b", "cn", "jacc_micro"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = lp_oracle(edges, candidates="edges")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the two-cliques bridge edge has no common neighbor → absent
    e2, _ = FIX["two_cliques_bridge"]
    g2 = edge_jaccard(e2, num_parts=2).to_pandas()
    assert not ((g2["a"] == 5) & (g2["b"] == 10)).any()
    assert len(g2) == 30  # every K6 edge is embedded (2 × C(6,2))


def test_linkpred_top_k(ray_session):
    rng = np.random.default_rng(3)
    m = 300
    edges = pd.DataFrame(
        {"src": rng.integers(0, 40, m), "dst": rng.integers(0, 40, m), "w": 1}
    )
    k = 2
    got = _run(edges, top_k=k)
    want = lp_oracle(edges)
    top = (
        want.sort_values(["a", "jacc_micro", "b"], ascending=[True, False, True])
        .groupby("a")
        .head(k)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, top, check_dtype=False)


def test_linkpred_default_cap_and_uncapped_warning(ray_session):
    """Round-5: max_degree defaults to the finite DEFAULT_MAX_DEGREE so an
    uncapped call cannot hub-bomb by accident; max_degree=None is the
    explicit uncapped opt-in and warns."""
    import warnings

    from graphx_ray.pipelines.linkpred import DEFAULT_MAX_DEGREE

    assert DEFAULT_MAX_DEGREE < 10**6
    edges = pd.DataFrame(
        {"src": [0, 0, 1, 2], "dst": [1, 2, 3, 3], "w": 1}
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # default call must NOT warn
        capped = link_prediction(edges, num_parts=2).to_pandas()
    with pytest.warns(RuntimeWarning, match="max_degree=None"):
        uncapped = link_prediction(edges, max_degree=None, num_parts=2).to_pandas()
    # degrees far below the default cap → identical results
    pd.testing.assert_frame_equal(
        capped.sort_values(["a", "b"]).reset_index(drop=True),
        uncapped.sort_values(["a", "b"]).reset_index(drop=True),
    )


# ------------------------------------------------ RA / PA extra scores


def lp_all_oracle(edges_df, *, max_degree=None) -> pd.DataFrame:
    """Python replay of scores='all': jaccard base + resource allocation
    (Σ floor(1e6/deg(z)) over shared capped centers) + Adamic-Adar
    (Σ floor(1e6/ln deg(z)), python-log LUT) + preferential attachment
    deg(a)·deg(b)."""
    import math
    adj: dict[int, set] = collections.defaultdict(set)
    for s, d in zip(edges_df["src"], edges_df["dst"]):
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    eset = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in zip(edges_df["src"], edges_df["dst"])
        if s != d
    }
    cnt: collections.Counter = collections.Counter()
    ra: collections.Counter = collections.Counter()
    aa: collections.Counter = collections.Counter()
    for _, ns in adj.items():
        if max_degree is not None and len(ns) > max_degree:
            continue
        w = 1_000_000 // len(ns)
        wa = int(1_000_000 / math.log(len(ns))) if len(ns) >= 2 else 0
        for a, b in itertools.combinations(sorted(ns), 2):
            cnt[(a, b)] += 1
            ra[(a, b)] += w
            aa[(a, b)] += wa
    rows = []
    for (a, b), cn in sorted(cnt.items()):
        if (a, b) in eset:
            continue
        da, db = len(adj[a]), len(adj[b])
        jm = int(np.floor(1e6 * cn / (da + db - cn) + 0.5))
        rows.append((a, b, cn, jm, ra[(a, b)], aa[(a, b)], da * db))
    return pd.DataFrame(
        rows,
        columns=["a", "b", "cn", "jacc_micro", "ra_micro", "aa_micro", "pa"],
    )


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "star_hub", "random_multi"]
)
def test_linkpred_all_scores(name, ray_session):
    edges, _ = FIX[name]
    got = link_prediction(edges, num_parts=3, scores="all").to_pandas()
    cols = ["a", "b", "cn", "jacc_micro", "ra_micro", "aa_micro", "pa"]
    if got.empty:
        got = pd.DataFrame(columns=cols)
    got = got[cols].sort_values(["a", "b"]).reset_index(drop=True)
    ora = lp_all_oracle(edges, max_degree=10_000)
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)
    # the jaccard columns are bit-identical to the default path
    base = _run(edges)
    pd.testing.assert_frame_equal(
        got[["a", "b", "cn", "jacc_micro"]], base, check_dtype=False
    )


@pytest.mark.parametrize("onto", ["dst", "src"])
def test_bipartite_project_matches_pandas(ray_session, onto):
    from graphx_ray.pipelines.linkpred import bipartite_project

    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 40, n),
            "dst": rng.integers(1000, 1030, n),
        }
    )
    got = (
        bipartite_project(rd.from_pandas(df).repartition(3), onto=onto,
                          max_degree=10_000, num_parts=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ccol, ncol = ("src", "dst") if onto == "dst" else ("dst", "src")
    dd = df[[ccol, ncol]].drop_duplicates()
    agg: dict = {}
    for _, grp in dd.groupby(ccol):
        ns = np.sort(grp[ncol].to_numpy())
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                agg[(ns[i], ns[j])] = agg.get((ns[i], ns[j]), 0) + 1
    want = (
        pd.DataFrame([(a, b, w) for (a, b), w in agg.items()],
                     columns=["a", "b", "w"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bipartite_project_degree_cap(ray_session):
    from graphx_ray.pipelines.linkpred import bipartite_project

    # center 0 has 5 neighbors, center 1 has 2: cap=4 drops center 0's pairs
    df = pd.DataFrame(
        {"src": [0] * 5 + [1] * 2, "dst": [10, 11, 12, 13, 14, 10, 11]}
    )
    got = (
        bipartite_project(rd.from_pandas(df), onto="dst", max_degree=4)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert got.to_records(index=False).tolist() == [(10, 11, 1)]


def _butterfly_brute(df, onto):
    """Independent per-vertex butterfly count: set intersections over
    every unordered onto-side pair (no shared code with the engine)."""
    ccol, ncol = ("src", "dst") if onto == "dst" else ("dst", "src")
    nbrs: dict[int, set] = collections.defaultdict(set)
    for _, row in df.drop_duplicates().iterrows():
        nbrs[row[ncol]].add(row[ccol])
    counts: dict[int, int] = collections.defaultdict(int)
    for a, b in itertools.combinations(sorted(nbrs), 2):
        w = len(nbrs[a] & nbrs[b])
        c2 = w * (w - 1) // 2
        if c2:
            counts[a] += c2
            counts[b] += c2
    return (
        pd.DataFrame(sorted(counts.items()), columns=["vid", "butterflies"])
        if counts else pd.DataFrame(columns=["vid", "butterflies"])
    )


@pytest.mark.parametrize("onto", ["dst", "src"])
def test_butterfly_counts_match_brute_force(ray_session, onto):
    from graphx_ray.pipelines.linkpred import butterfly_counts

    rng = np.random.default_rng(23)
    n = 500
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 35, n),
            "dst": rng.integers(1000, 1026, n),
        }
    )
    got = (
        butterfly_counts(rd.from_pandas(df).repartition(3), onto=onto,
                         max_degree=10_000, num_parts=4)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    want = _butterfly_brute(df, onto)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # total butterflies double-count once per endpoint
    assert int(got["butterflies"].sum()) % 2 == 0


def test_butterfly_counts_k22_and_invariance(ray_session):
    from graphx_ray.pipelines.linkpred import butterfly_counts

    # K_{2,2} is exactly one butterfly: each onto vertex counts 1
    df = pd.DataFrame({"src": [0, 0, 1, 1], "dst": [10, 11, 10, 11]})
    got = (
        butterfly_counts(rd.from_pandas(df), onto="dst")
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert got.to_records(index=False).tolist() == [(10, 1), (11, 1)]

    rng = np.random.default_rng(7)
    big = pd.DataFrame(
        {"src": rng.integers(0, 20, 300), "dst": rng.integers(50, 70, 300)}
    )
    runs = [
        butterfly_counts(rd.from_pandas(big).repartition(p), onto="dst",
                         num_parts=q)
        .to_pandas().sort_values("vid").reset_index(drop=True)
        for p, q in ((1, 2), (5, 8))
    ]
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_two_hop_counts_match_networkx(ray_session):
    import networkx as nx

    from graphx_ray.pipelines.linkpred import two_hop_counts

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"src": rng.integers(0, 60, 260), "dst": rng.integers(0, 60, 260)}
    )
    G = nx.Graph()
    G.add_edges_from(
        (int(a), int(b)) for a, b in zip(df["src"], df["dst"]) if a != b
    )
    want = {}
    for v in G:
        two = {
            u for n in G.neighbors(v) for u in G.neighbors(n)
            if u != v and not G.has_edge(v, u)
        }
        if two:
            want[v] = len(two)
    outs = [
        two_hop_counts(rd.from_pandas(df).repartition(p), max_degree=10_000,
                       num_parts=q)
        .to_pandas().sort_values("vid").reset_index(drop=True)
        for p, q in ((2, 3), (5, 6))
    ]
    gd = dict(zip(outs[0]["vid"].astype(int), outs[0]["fof"].astype(int)))
    assert gd == want
    pd.testing.assert_frame_equal(outs[0], outs[1])
