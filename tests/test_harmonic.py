"""HyperBall harmonic centrality: integer composition over hyperanf."""

import numpy as np
import pandas as pd
import pytest

from graphx_ray.pipelines.hyperanf import hyperanf, hyperball_harmonic
from oracles import fixture_graphs

FIX = fixture_graphs()


@pytest.mark.parametrize("name", ["ring_n", "two_cliques_bridge", "star_hub"])
def test_harmonic_matches_ball_composition(name, ray_session):
    edges, _ = FIX[name]
    got = (
        hyperball_harmonic(edges, p=4, iters=2, num_parts=3)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    balls = hyperanf(edges, p=4, iters=2, num_parts=3).to_pandas()
    piv = balls.pivot(index="vid", columns="t", values="ball")
    want = (
        ((piv[1] - piv[0]) * 2_000_000 + (piv[2] - piv[1]) * 1_000_000)
        .astype(np.int64).rename("harmonic_2e6").reset_index()
        .sort_values("vid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_harmonic_hub_dominates(ray_session):
    """On the star, the hub's 1-hop ball is the whole graph: its harmonic
    estimate exceeds every leaf's (leaves reach 1 node at t=1)."""
    edges, _ = FIX["star_hub"]
    got = hyperball_harmonic(edges, p=8, iters=2, num_parts=2).to_pandas()
    hub = int(got.loc[got["vid"] == 0, "harmonic_2e6"].iloc[0])
    leaves = got.loc[got["vid"] != 0, "harmonic_2e6"]
    assert hub > leaves.max()


def test_harmonic_rejects_inexact_weights(ray_session):
    edges, _ = FIX["ring_n"]
    with pytest.raises(ValueError):
        hyperball_harmonic(edges, iters=3)
