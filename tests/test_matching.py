"""Maximal matching (SURVEY.md A.17) vs a pure-python replay of the pinned
local-max tuple semantics, plus matching validity (symmetric, disjoint),
maximality (no active edge left), salted-hub bit-parity and parallelism
invariance."""

import numpy as np
import pandas as pd
import pytest
import ray

from graphx_ray.ids import mix64
from graphx_ray.pipelines.graph import Graph
from oracles import fixture_graphs

FIX = fixture_graphs()


def matching_replay(edges: pd.DataFrame, seed: int = 42, max_rounds: int = 100):
    u = np.minimum(edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64))
    v = np.maximum(edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64))
    keep = u != v
    pairs = np.unique(np.stack([u[keep], v[keep]], 1), axis=0)
    cu, cv = pairs[:, 0], pairs[:, 1]
    vids = np.unique(np.concatenate([cu, cv]))
    partner = {int(x): -1 for x in vids}
    for r in range(max_rounds):
        act = np.array(
            [partner[int(a)] < 0 and partner[int(b)] < 0 for a, b in zip(cu, cv)]
        )
        if not act.any():
            break
        c = mix64(np.uint64(seed) ^ np.uint64(r))
        p = (
            mix64(mix64(c ^ cu.astype(np.uint64)) ^ cv.astype(np.uint64))
            >> np.uint64(1)
        ) + np.uint64(1)
        best = {}
        for i in np.flatnonzero(act):
            t = (int(p[i]), int(cu[i]), int(cv[i]))
            for x in (int(cu[i]), int(cv[i])):
                if x not in best or t > best[x]:
                    best[x] = t
        for i in np.flatnonzero(act):
            t = (int(p[i]), int(cu[i]), int(cv[i]))
            if best.get(int(cu[i])) == t and best.get(int(cv[i])) == t:
                partner[int(cu[i])] = int(cv[i])
                partner[int(cv[i])] = int(cu[i])
    return pd.DataFrame({"vid": vids, "partner": [partner[int(x)] for x in vids]})


def _run(edges, *, num_parts=3, salt_threshold=None):
    g = Graph(
        ray.data.from_pandas(edges), num_parts=num_parts, salt_threshold=salt_threshold
    )
    try:
        return (
            g.maximal_matching(as_table=True)
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
    finally:
        g.close()


@pytest.mark.parametrize(
    "name", ["two_cliques_bridge", "ring_n", "star_hub", "random_multi"]
)
def test_matching_matches_replay(name, ray_session):
    edges, _ = FIX[name]
    got = _run(edges)
    want = matching_replay(edges).sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_matching_valid_and_maximal(ray_session):
    rng = np.random.default_rng(5)
    edges = pd.DataFrame(
        {"src": rng.integers(0, 80, 400), "dst": rng.integers(0, 80, 400)}
    )
    got = _run(edges, num_parts=4)
    lab = got.set_index("vid")["partner"]
    m = got[got["partner"] >= 0]
    # symmetric + disjoint: partner(partner(v)) == v
    assert all(lab[p] == v for v, p in zip(m["vid"], m["partner"]))
    # maximal: every canonical edge has a matched endpoint
    u = np.minimum(edges["src"], edges["dst"])
    v = np.maximum(edges["src"], edges["dst"])
    for a, b in zip(u, v):
        if a != b:
            assert lab[a] >= 0 or lab[b] >= 0


def test_matching_salted_hub_bit_parity(ray_session):
    rows = [(0, i) for i in range(1, 41)]
    rows += [(i, j) for i in range(50, 56) for j in range(i + 1, 56)]
    rows += [(1, 50)]
    edges = pd.DataFrame(rows, columns=["src", "dst"])
    plain = _run(edges, num_parts=4)
    salted = _run(edges, num_parts=4, salt_threshold=10)
    pd.testing.assert_frame_equal(plain, salted)


def test_matching_parallelism_invariant(ray_session):
    edges, _ = FIX["random_multi"]
    outs = [_run(edges, num_parts=p) for p in (1, 3, 5)]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
