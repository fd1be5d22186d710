"""GraphX PartitionStrategy parity: determinism, balance, and the
EdgePartition2D replication bound (≤ 2·ceil(sqrt(P)) − 1 per vertex)."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphx_ray.state.partition import (
    STRATEGIES,
    assign_partitions,
    partition_by,
    replication_factor,
)


def _rmat_edges(n=20000, nv=512, seed=4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # Zipf-ish skew: hub 0 gets ~8% of endpoints
    src = rng.zipf(1.3, n) % nv
    dst = rng.zipf(1.3, n) % nv
    df = pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    return df[df.src != df.dst].reset_index(drop=True)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_assign_deterministic_and_in_range(strategy):
    df = _rmat_edges()
    P = 12
    a = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(), strategy, P)
    b = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(), strategy, P)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < P
    # balance: no partition holds more than 4x its fair share (skewed
    # input; vertex-cut strategies must still spread hub edges)
    if strategy != "EdgePartition1D":  # 1D intentionally concentrates hubs
        cnt = np.bincount(a, minlength=P)
        assert cnt.max() <= 4 * len(df) / P


def test_canonical_vertex_cut_orientation_invariant():
    df = _rmat_edges()
    a = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(),
                          "CanonicalRandomVertexCut", 16)
    b = assign_partitions(df.dst.to_numpy(), df.src.to_numpy(),
                          "CanonicalRandomVertexCut", 16)
    assert np.array_equal(a, b)


def test_2d_replication_bound():
    """EdgePartition2D: every vertex touches at most one grid row + one
    grid column = 2*ceil(sqrt(P)) - 1 partitions, REGARDLESS of degree;
    RandomVertexCut has no such bound for a hub."""
    df = _rmat_edges(n=40000, nv=256)
    P = 16
    bound = 2 * math.ceil(math.sqrt(P)) - 1
    p2 = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(), "EdgePartition2D", P)
    both = pd.concat([
        pd.DataFrame({"vid": df.src, "p": p2}),
        pd.DataFrame({"vid": df.dst, "p": p2}),
    ])
    per_vertex = both.groupby("vid")["p"].nunique()
    assert per_vertex.max() <= bound
    # the hub (max-degree vertex) exceeds the 2D bound under RandomVertexCut
    prv = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(), "RandomVertexCut", P)
    bothrv = pd.concat([
        pd.DataFrame({"vid": df.src, "p": prv}),
        pd.DataFrame({"vid": df.dst, "p": prv}),
    ])
    hub = both.groupby("vid").size().idxmax()
    assert bothrv[bothrv.vid == hub]["p"].nunique() > bound


def test_partition_by_and_replication_factor(ray_session):
    df = _rmat_edges(n=10000, nv=256)
    P = 16
    ds = rd.from_pandas(df).repartition(3)
    tagged = partition_by(ds, "EdgePartition2D", P).to_pandas()
    want = assign_partitions(df.src.to_numpy(), df.dst.to_numpy(),
                             "EdgePartition2D", P)
    got = tagged.sort_values(["src", "dst"]).reset_index(drop=True)
    exp = df.assign(part=want).sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # distributed replication factor: 2D beats 1D on this skewed graph
    rf2d = replication_factor(ds, "EdgePartition2D", P)
    rf1d = replication_factor(ds, "EdgePartition1D", P)
    assert 1.0 <= rf2d <= 2 * math.ceil(math.sqrt(P)) - 1
    assert rf2d < rf1d
