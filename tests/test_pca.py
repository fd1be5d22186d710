"""Distributed exact-integer PCA vs a pure-python replay; direction
sanity vs numpy eigendecomposition; parallelism invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.functions.pca import pca_model, pca_power, pca_project


def _mk(n=400, d=10, seed=11, spike=4.0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    vecs = (base + spike * rng.normal(size=(n, 1)) * direction[None, :]).astype(
        np.float32
    )
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    return vecs, ids, df, direction


def _replay(vecs, iters=6, shift_bits=20):
    """The pinned recipe in pure python/numpy — independent of the engine."""
    mx = np.abs(vecs.astype(np.float32)).max(axis=0).astype(np.float64)
    scale = np.where(mx > 0, 127.0 / mx, 0.0)
    q = np.clip(
        np.floor(vecs.astype(np.float64) * scale[None, :] + 0.5), -127, 127
    ).astype(np.int64)
    n, d = q.shape
    G = (q.T @ q).tolist()
    s = q.sum(axis=0).tolist()
    M = [[n * G[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]
    v = [1] * d
    for _ in range(iters):
        w = [sum(M[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx_w = max(abs(x) for x in w)
        if mx_w == 0:
            v = [0] * d
            break
        v = [(x << shift_bits) // mx_w for x in w]
    proj = q @ np.asarray(v, dtype=np.int64)
    return np.asarray(v, np.int64), proj


def test_pca_matches_replay(ray_session):
    vecs, ids, df, _ = _mk()
    want_v, want_proj = _replay(vecs)
    model = pca_model(rd.from_pandas(df).repartition(5))
    assert model["n"] == len(vecs)
    np.testing.assert_array_equal(model["v"], want_v)
    got = (
        pca_project(rd.from_pandas(df).repartition(3), model, concurrency=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(got["proj"].to_numpy(), want_proj)


def test_pca_direction_matches_numpy(ray_session):
    vecs, ids, df, direction = _mk(seed=3, spike=6.0)
    model = pca_model(rd.from_pandas(df).repartition(4), iters=12)
    v = model["v"].astype(np.float64)
    v /= np.linalg.norm(v)
    # float reference: top eigenvector of the covariance of the QUANTIZED data
    mx = np.abs(vecs.astype(np.float32)).max(axis=0).astype(np.float64)
    scale = np.where(mx > 0, 127.0 / mx, 0.0)
    q = np.clip(
        np.floor(vecs.astype(np.float64) * scale[None, :] + 0.5), -127, 127
    )
    cov = np.cov(q.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(float(v @ top)) > 0.999
    # and the planted spike direction is recovered through the quantizer:
    # q = diag(scale)·x (+rounding), so the planted direction in quantized
    # units is direction·scale
    planted = direction * scale
    planted /= np.linalg.norm(planted)
    assert abs(float(v @ planted)) > 0.95


def test_pca_parallelism_invariance(ray_session):
    vecs, ids, df, _ = _mk(n=257, d=7, seed=9)
    outs = []
    for parts, nparts in ((1, 2), (6, 4)):
        got = (
            pca_power(
                rd.from_pandas(df).repartition(parts),
                num_partitions=nparts,
                concurrency=2,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pca_zero_dim_and_degenerate(ray_session):
    # one all-zero dim (scale 0) + otherwise constant rows → M = 0 → v = 0
    n, d = 40, 5
    vecs = np.ones((n, d), dtype=np.float32)
    vecs[:, 2] = 0.0
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v for v in vecs]}
    )
    model = pca_model(rd.from_pandas(df).repartition(3))
    assert model["n"] == n
    np.testing.assert_array_equal(model["v"], np.zeros(d, np.int64))
    got = pca_project(rd.from_pandas(df), model).to_pandas()
    assert (got["proj"] == 0).all()
