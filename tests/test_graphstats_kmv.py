"""Round-5 late additions: KMV bottom-k distinct sketch (order-free, so
bit-identical at any parallelism) and the single-row graph statistics
(reciprocity / transitivity / power-law tail MLE) — each pinned against a
pure-python replay of the SAME integer recipe plus networkx where a
published definition exists."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.sketch import (
    grouped_kmv_ndv,
    kmv_set_similarity,
    kmv_sketch,
)
from graphx_ray.ids import mix64
from graphx_ray.stages.structural import (
    log_micro,
    powerlaw_alpha_stats,
    reciprocity_stats,
    transitivity_stats,
)


def _py_kmv(vals: np.ndarray, k: int) -> tuple[np.ndarray, int]:
    """Pure-python replay of the pinned sketch + estimate."""
    hs = np.unique(mix64(np.asarray(vals, np.int64).astype(np.uint64)))[:k]
    if len(hs) < k:
        return hs, int(len(hs))
    return hs, ((k - 1) << 64) // int(hs[k - 1])


def test_kmv_sketch_bit_identical_and_exact_below_k():
    vals = np.arange(100, dtype=np.int64) * 7919
    df = pd.DataFrame({"x": np.repeat(vals, 3)})
    got = kmv_sketch(rd.from_pandas(df), "x", k=256).to_pandas()["h"].to_numpy()
    want, est = _py_kmv(vals, 256)
    assert np.array_equal(got.astype(np.uint64), want)
    assert est == 100  # below k → exact


def test_kmv_parallelism_invariance_and_accuracy():
    n = 30_000
    vals = np.arange(n, dtype=np.int64) * 104729 + 7
    df = pd.DataFrame({"x": np.repeat(vals, 2)})
    k = 512
    a = kmv_sketch(rd.from_pandas(df), "x", k=k).to_pandas()["h"].to_numpy()
    b = kmv_sketch(rd.from_pandas(df).repartition(17), "x", k=k).to_pandas()[
        "h"
    ].to_numpy()
    assert np.array_equal(a, b)  # order-free: sketch identical at any blocks
    want, est = _py_kmv(vals, k)
    assert np.array_equal(a.astype(np.uint64), want)
    assert abs(est - n) / n < 4 / math.sqrt(k - 2)  # ~4σ of 1/√(k−2)


def test_grouped_kmv_ndv_exact_small_groups_and_estimate_parity():
    rng = np.random.default_rng(5)
    frames = []
    sizes = {"a": 40, "b": 5000, "c": 1}
    for g, n in sizes.items():
        x = rng.integers(0, n, n * 2, dtype=np.int64) + hash(g) % 89
        frames.append(pd.DataFrame({"g": g, "x": x}))
    df = pd.concat(frames, ignore_index=True)
    k = 128
    got = (
        grouped_kmv_ndv(rd.from_pandas(df), ["g"], "x", k=k, num_partitions=4)
        .to_pandas()
        .set_index("g")["kmv_ndv"]
    )
    for g in sizes:
        _, want = _py_kmv(df[df["g"] == g]["x"].to_numpy(), k)
        assert got[g] == want, g
    # small groups below k are exact
    exact = df.groupby("g")["x"].nunique()
    assert got["a"] == exact["a"] and got["c"] == exact["c"]
    # the big group's estimate is within the sketch error
    assert abs(got["b"] - exact["b"]) / exact["b"] < 4 / math.sqrt(k - 2)


def test_kmv_set_similarity_laws_and_parity():
    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(1500, 4500, dtype=np.int64)  # true jaccard = 1500/4500
    da = rd.from_pandas(pd.DataFrame({"x": np.repeat(a, 2)}))
    db = rd.from_pandas(pd.DataFrame({"x": b}))
    k = 256
    row = kmv_set_similarity(da, db, "x", k=k).to_pandas().iloc[0]
    assert row["n_sample"] == k
    assert abs(row["jacc_micro"] / 1e6 - 1 / 3) < 4 / math.sqrt(k)
    assert abs(row["union_ndv"] - 4500) / 4500 < 4 / math.sqrt(k - 2)
    # identical sets → jaccard exactly 1, union exact via the same estimator
    same = kmv_set_similarity(da, da, "x", k=k).to_pandas().iloc[0]
    assert same["jacc_micro"] == 1_000_000 and same["n_both"] == same["n_sample"]
    # disjoint sets → 0
    dc = rd.from_pandas(pd.DataFrame({"x": a + 1_000_000}))
    dis = kmv_set_similarity(da, dc, "x", k=k).to_pandas().iloc[0]
    assert dis["n_both"] == 0 and dis["jacc_micro"] == 0
    # below-k union is counted exactly
    small = kmv_set_similarity(
        rd.from_pandas(pd.DataFrame({"x": a[:50]})),
        rd.from_pandas(pd.DataFrame({"x": a[25:75]})),
        "x", k=k,
    ).to_pandas().iloc[0]
    assert small["n_sample"] == 75 and small["n_both"] == 25
    assert small["union_ndv"] == 75
    assert small["jacc_micro"] == (1_000_000 * 25) // 75


def _rand_directed(seed: int, n: int = 40, m: int = 160):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m, dtype=np.int64)
    dst = rng.integers(0, n, m, dtype=np.int64)
    return pd.DataFrame({"src": src, "dst": dst, "w": np.ones(m, np.int64)})


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_reciprocity_matches_networkx(seed):
    nx = pytest.importorskip("networkx")
    df = _rand_directed(seed)
    got = reciprocity_stats(rd.from_pandas(df), num_partitions=4).to_pandas().iloc[0]
    g = nx.DiGraph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in zip(df["src"], df["dst"]) if s != d
    )
    nd = g.number_of_edges()
    nr = sum(1 for u, v in g.edges if g.has_edge(v, u))
    assert got["n_directed"] == nd
    assert got["n_reciprocal"] == nr
    assert got["reciprocity_micro"] == (1_000_000 * nr) // nd
    # sanity vs the library's own definition
    assert abs(got["reciprocity_micro"] / 1e6 - nx.overall_reciprocity(g)) < 1e-5


def test_reciprocity_extremes():
    # pure bidirectional pair → 1.0; pure one-way chain → 0
    bi = pd.DataFrame({"src": [1, 2], "dst": [2, 1], "w": [1, 1]})
    row = reciprocity_stats(rd.from_pandas(bi), num_partitions=2).to_pandas().iloc[0]
    assert row["reciprocity_micro"] == 1_000_000
    ch = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4], "w": [1, 1, 1]})
    row = reciprocity_stats(rd.from_pandas(ch), num_partitions=2).to_pandas().iloc[0]
    assert row["n_directed"] == 3 and row["reciprocity_micro"] == 0
    # self-loops and duplicate edges are dropped before counting
    dup = pd.DataFrame({"src": [1, 1, 1, 2], "dst": [2, 2, 1, 1], "w": [1] * 4})
    row = reciprocity_stats(rd.from_pandas(dup), num_partitions=2).to_pandas().iloc[0]
    assert row["n_directed"] == 2 and row["n_reciprocal"] == 2


@pytest.mark.parametrize("seed", [4, 5])
def test_transitivity_matches_networkx(seed):
    nx = pytest.importorskip("networkx")
    df = _rand_directed(seed, n=30, m=120)
    got = transitivity_stats(rd.from_pandas(df), num_partitions=4).to_pandas().iloc[0]
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in zip(df["src"], df["dst"]) if s != d
    )
    wedges = sum(d * (d - 1) // 2 for _, d in g.degree)
    closed = sum(nx.triangles(g).values())  # = 3·triangles
    assert got["wedges"] == wedges
    assert got["closed"] == closed
    assert got["transitivity_micro"] == (1_000_000 * closed) // wedges
    assert abs(got["transitivity_micro"] / 1e6 - nx.transitivity(g)) < 1e-5


def test_transitivity_triangle_free():
    # 4-cycle: wedges 4, no triangles
    df = pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 1], "w": [1] * 4})
    row = transitivity_stats(rd.from_pandas(df), num_partitions=2).to_pandas().iloc[0]
    assert row["wedges"] == 4 and row["closed"] == 0
    assert row["transitivity_micro"] == 0


def test_powerlaw_alpha_pinned_formula_and_range():
    # synthetic Zipf-ish degree sequence realized as a star forest: hub i
    # has d_i leaves (leaves have degree 1 < d_min and drop out of the tail)
    degs = [2, 2, 3, 4, 6, 9, 14, 22, 40]
    rows = []
    nxt = 10_000
    for i, d in enumerate(degs):
        for _ in range(d):
            rows.append((i, nxt))
            nxt += 1
    df = pd.DataFrame(rows, columns=["src", "dst"])
    df["w"] = 1
    got = powerlaw_alpha_stats(
        rd.from_pandas(df), d_min=2, num_partitions=4
    ).to_pandas().iloc[0]
    lmin = log_micro(2)
    slog = sum(log_micro(d) - lmin for d in degs)
    assert got["n_tail"] == len(degs)
    assert got["sum_log_micro"] == slog
    assert got["alpha_micro"] == 1_000_000 + (len(degs) * 10**12) // slog
    assert 1_500_000 < got["alpha_micro"] < 3_000_000  # plausible exponent
    # degenerate tail (every degree == d_min) → pinned 0
    tri = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1], "w": [1, 1, 1]})
    row = powerlaw_alpha_stats(rd.from_pandas(tri), d_min=2).to_pandas().iloc[0]
    assert row["sum_log_micro"] == 0 and row["alpha_micro"] == 0


@pytest.mark.parametrize("seed", [6, 8])
def test_rich_club_matches_networkx(seed):
    nx = pytest.importorskip("networkx")
    from graphx_ray.stages.structural import rich_club_stats

    df = _rand_directed(seed, n=35, m=140)
    g = nx.Graph()
    g.add_edges_from(
        (int(s), int(d)) for s, d in zip(df["src"], df["dst"]) if s != d
    )
    got = (
        rich_club_stats(rd.from_pandas(df), [0, 1, 2, 3, 5], num_partitions=4)
        .to_pandas().set_index("k")
    )
    rc = nx.rich_club_coefficient(g, normalized=False)
    for k in [0, 1, 2, 3, 5]:
        nk = sum(1 for _, d in g.degree if d > k)
        ek = sum(1 for u, v in g.edges if g.degree[u] > k and g.degree[v] > k)
        assert got.loc[k, "n_k"] == nk
        assert got.loc[k, "e_k"] == ek
        want = (2_000_000 * ek) // (nk * (nk - 1)) if nk >= 2 else 0
        assert got.loc[k, "phi_micro"] == want
        if k in rc and nk >= 2:
            assert abs(got.loc[k, "phi_micro"] / 1e6 - rc[k]) < 1e-5
    # threshold above the max degree: empty club, phi pinned 0
    hi = rich_club_stats(rd.from_pandas(df), [10_000], num_partitions=2).to_pandas()
    assert hi.iloc[0]["n_k"] == 0 and hi.iloc[0]["phi_micro"] == 0


def test_kmv_overlap_matrix_parity_and_laws():
    from graphx_ray.functions.sketch import kmv_overlap_matrix

    rng = np.random.default_rng(17)
    # three groups with engineered overlaps: a∩b large, a∩c empty
    a = np.arange(0, 2000, dtype=np.int64)
    b = np.arange(1000, 3000, dtype=np.int64)
    c = np.arange(50_000, 52_000, dtype=np.int64)
    df = pd.concat([
        pd.DataFrame({"g": "a", "x": rng.permutation(np.repeat(a, 2))}),
        pd.DataFrame({"g": "b", "x": rng.permutation(b)}),
        pd.DataFrame({"g": "c", "x": rng.permutation(c)}),
    ], ignore_index=True)
    k = 256
    got = (
        kmv_overlap_matrix(rd.from_pandas(df), "g", "x", k=k, num_partitions=4)
        .to_pandas().set_index(["g1", "g2"]).sort_index()
    )
    assert list(got.index) == [("a", "b"), ("a", "c"), ("b", "c")]
    # python replay via the same pinned rule
    hs = {g: np.unique(mix64(df[df["g"] == g]["x"].to_numpy().astype(np.uint64)))[:k]
          for g in "abc"}
    for (g1, g2), row in got.iterrows():
        hu = np.unique(np.concatenate([hs[g1], hs[g2]]))[:k]
        n_both = int(np.isin(hu, hs[g1]).astype(int) @ np.isin(hu, hs[g2]).astype(int))
        assert row["n_sample"] == len(hu)
        assert row["n_both"] == n_both
        assert row["jacc_micro"] == (1_000_000 * n_both) // len(hu)
    # laws: disjoint pairs are exactly 0; the engineered a/b overlap lands
    # near the true 1000/3000
    assert got.loc[("a", "c"), "n_both"] == 0
    assert got.loc[("b", "c"), "n_both"] == 0
    assert abs(got.loc[("a", "b"), "jacc_micro"] / 1e6 - 1 / 3) < 4 / math.sqrt(k)
    # parallelism invariance (order-free sketches)
    got2 = (
        kmv_overlap_matrix(rd.from_pandas(df).repartition(11), "g", "x", k=k,
                           num_partitions=2)
        .to_pandas().set_index(["g1", "g2"]).sort_index()
    )
    pd.testing.assert_frame_equal(got.reset_index(), got2.reset_index())


def test_degree_gini_pinned_identity_and_laws():
    from graphx_ray.stages.structural import degree_gini_stats

    # star: one hub degree n-1, n-1 leaves degree 1 — high concentration
    n_leaves = 20
    star = pd.DataFrame(
        {"src": np.zeros(n_leaves, np.int64),
         "dst": np.arange(1, n_leaves + 1, dtype=np.int64),
         "w": np.ones(n_leaves, np.int64)}
    )
    row = degree_gini_stats(rd.from_pandas(star), num_partitions=3).to_pandas().iloc[0]
    degs = sorted([n_leaves] + [1] * n_leaves)
    n = len(degs)
    s0 = sum(degs)
    s1 = sum(i * d for i, d in enumerate(degs, 1))
    assert row["n_vertices"] == n and row["sum_deg"] == s0 and row["s1"] == s1
    want = (1_000_000 * (2 * s1 - (n + 1) * s0)) // (n * s0)
    assert row["gini_micro"] == want
    # sanity vs the float Gini definition
    mean_abs = sum(abs(a - b) for a in degs for b in degs) / (n * n)
    g_float = mean_abs / (2 * s0 / n)
    assert abs(row["gini_micro"] / 1e6 - g_float) < 2e-6
    # regular graph (cycle): all degrees equal → Gini exactly 0
    cyc = pd.DataFrame(
        {"src": np.arange(10, dtype=np.int64),
         "dst": np.roll(np.arange(10, dtype=np.int64), -1),
         "w": np.ones(10, np.int64)}
    )
    row = degree_gini_stats(rd.from_pandas(cyc), num_partitions=2).to_pandas().iloc[0]
    assert row["gini_micro"] == 0 and row["n_vertices"] == 10
    # parallelism invariance (exact integers)
    df = _rand_directed(12, n=50, m=300)
    a = degree_gini_stats(rd.from_pandas(df), num_partitions=2).to_pandas()
    b = degree_gini_stats(rd.from_pandas(df).repartition(9), num_partitions=7).to_pandas()
    pd.testing.assert_frame_equal(a, b)
