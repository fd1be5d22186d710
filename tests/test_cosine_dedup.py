"""Embedding-cosine near-dup: exact 2D-bucketed operator vs numpy
all-pairs; LSH variant recall on clustered vectors."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.functions.similarity import (
    _normalize,
    cosine_near_dup_lsh,
    cosine_near_dup_pairs,
)


def _clustered(n_clusters=12, per=6, d=16, noise=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    vecs, ids = [], []
    for c in range(n_clusters):
        for k in range(per):
            vecs.append(centers[c] + noise * rng.standard_normal(d))
            ids.append(c * 100 + k)
    return np.array(ids, np.int64), np.stack(vecs)


def _ref_pairs(ids, vecs, threshold):
    m = _normalize(vecs.astype(np.float64))
    sims = m @ m.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def _ds(ids, vecs):
    return rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [v.astype(np.float32) for v in vecs]})
    )


def test_exact_pairs_match_bruteforce():
    ids, vecs = _clustered()
    want = _ref_pairs(ids, vecs, 0.9)
    got = cosine_near_dup_pairs(_ds(ids, vecs), threshold=0.9, num_buckets=4).to_pandas()
    got_set = set(map(tuple, got[["a", "b"]].to_numpy()))
    assert got_set == want
    assert len(want) > 10  # the fixture actually has near-dups


def test_lsh_recall_and_precision():
    ids, vecs = _clustered()
    want = _ref_pairs(ids, vecs, 0.9)
    got = cosine_near_dup_lsh(
        _ds(ids, vecs), threshold=0.9, n_planes=16, bands=8, num_partitions=4
    ).to_pandas()
    got_set = set(map(tuple, got[["a", "b"]].to_numpy()))
    # every reported pair is verified exactly => precision 1.0
    assert got_set <= want
    # banded sign-LSH recall on tightly clustered dups
    assert len(got_set) >= 0.8 * len(want)


def test_lsh_keeps_sim_column():
    ids, vecs = _clustered()
    got = cosine_near_dup_lsh(
        _ds(ids, vecs), threshold=0.9, n_planes=16, bands=8, num_partitions=4
    ).to_pandas()
    assert sorted(got.columns) == ["a", "b", "sim"]
    assert (got["sim"] >= 0.9).all()


def test_lsh_rademacher_deterministic_and_precise():
    """planes='rademacher': same pairs at any parallelism, and precision 1
    (every returned pair really has cosine >= t)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from graphx_ray.functions.similarity import cosine_near_dup_lsh

    rng = np.random.default_rng(2)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    # plant near-dups: slightly perturbed copies
    dups = base[:10] + rng.normal(scale=0.05, size=(10, 16)).astype(np.float32)
    vecs = np.vstack([base, dups])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
    )
    results = []
    for nblocks in (1, 5):
        out = cosine_near_dup_lsh(
            rd.from_pandas(pdf).repartition(nblocks),
            threshold=0.9, n_planes=16, bands=8, num_partitions=4,
            planes="rademacher",
        ).to_pandas()
        results.append(set(zip(out["a"], out["b"])))
    assert results[0] == results[1] and len(results[0]) > 0
    nm = vecs.astype(np.float64)
    nm /= np.linalg.norm(nm, axis=1, keepdims=True)
    sims = nm @ nm.T
    for a, b in results[0]:
        assert sims[a, b] >= 0.9
