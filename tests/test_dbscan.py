"""Deterministic cosine DBSCAN vs an independent python reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.functions.dbscan import dbscan_cosine


def _blobs(n_per=40, k=4, d=16, seed=7, tight=0.18):
    rng = np.random.default_rng(seed)
    # orthonormal centers (QR) — blobs can't merge through cosine chains
    centers = np.linalg.qr(rng.normal(size=(d, k)))[0].T[:k]
    rows = [
        c[None, :] + tight * rng.normal(size=(n_per, d)) for c in centers
    ]
    # plus diffuse noise points
    rows.append(rng.normal(size=(n_per // 2, d)))
    vecs = np.concatenate(rows).astype(np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    return vecs, ids, df


def _ref(vecs, ids, threshold, min_pts):
    """Pinned-rule DBSCAN in plain numpy/python: same float recipe as the
    engine (float64 normalize + dot), min-id cluster labels, border →
    min core-neighbor label."""
    m = vecs.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = m @ m.T
    nbr = sims >= threshold
    np.fill_diagonal(nbr, False)
    deg = nbr.sum(axis=1)
    core = deg + 1 >= min_pts
    n = len(ids)
    # CC over core-core edges (label = min id in component)
    label = {int(ids[i]): int(ids[i]) for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not core[i]:
                continue
            for j in np.nonzero(nbr[i])[0]:
                if core[j]:
                    lo = min(label[int(ids[i])], label[int(ids[j])])
                    if label[int(ids[i])] != lo or label[int(ids[j])] != lo:
                        label[int(ids[i])] = label[int(ids[j])] = lo
                        changed = True
    rows = []
    for i in range(n):
        vid = int(ids[i])
        if core[i]:
            rows.append((vid, label[vid], 1))
        else:
            cn = [label[int(ids[j])] for j in np.nonzero(nbr[i])[0] if core[j]]
            if cn:
                rows.append((vid, min(cn), 0))
            elif min_pts <= 1:
                rows.append((vid, vid, 1))
            else:
                rows.append((vid, -1, 0))
    return (
        pd.DataFrame(rows, columns=["vec_id", "cluster", "is_core"])
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def _run(df, **kw):
    got = dbscan_cosine(rd.from_pandas(df).repartition(5), **kw).to_pandas()
    if len(got) == 0:
        return pd.DataFrame(columns=["vec_id", "cluster", "is_core"])
    return got.sort_values("vec_id").reset_index(drop=True).astype(
        {"vec_id": np.int64, "cluster": np.int64, "is_core": np.int64}
    )


def test_dbscan_matches_reference(ray_session):
    vecs, ids, df = _blobs()
    want = _ref(vecs, ids, 0.8, 5)
    got = _run(df, threshold=0.8, min_pts=5, num_buckets=4)
    pd.testing.assert_frame_equal(got, want)
    # sanity: the 4 planted blobs come out as ≥4 real clusters + noise
    real = want[want["cluster"] >= 0]["cluster"].nunique()
    assert real >= 4
    assert (want["cluster"] == -1).any()


def test_dbscan_border_and_minpts_sweep(ray_session):
    vecs, ids, df = _blobs()
    for mp in (2, 8):
        want = _ref(vecs, ids, 0.8, mp)
        got = _run(df, threshold=0.8, min_pts=mp, num_buckets=3)
        pd.testing.assert_frame_equal(got, want)
    # border points exist at the strict setting (pinned min-label rule)
    w8 = _ref(vecs, ids, 0.8, 8)
    assert ((w8["is_core"] == 0) & (w8["cluster"] >= 0)).any()


def test_dbscan_parallelism_invariance(ray_session):
    vecs, ids, df = _blobs(n_per=30, k=3, seed=21)
    outs = []
    for parts, buckets, nparts in ((1, 2, 4), (7, 5, 8)):
        got = dbscan_cosine(
            rd.from_pandas(df).repartition(parts),
            threshold=0.8, min_pts=4, num_buckets=buckets,
            num_partitions=nparts,
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append(got.astype({"vec_id": np.int64, "cluster": np.int64,
                                "is_core": np.int64}))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_dbscan_degenerate(ray_session):
    vecs, ids, df = _blobs(n_per=10, k=2, seed=5)
    # threshold above any off-diag sim → zero pairs → all noise
    got = _run(df, threshold=1.01, min_pts=3)
    assert (got["cluster"] == -1).all() and (got["is_core"] == 0).all()
    assert len(got) == len(ids)
    # min_pts=1 → every point a core singleton (or clustered)
    want = _ref(vecs, ids, 1.01, 1)
    got1 = _run(df, threshold=1.01, min_pts=1)
    pd.testing.assert_frame_equal(got1, want)
