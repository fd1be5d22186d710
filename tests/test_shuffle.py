"""deterministic_shuffle vs a python replay of the (hash, key) total order."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _oracle_pos(keys, seed):
    from graphx_ray.ids import hash_text64, mix64

    kv = (
        np.asarray(keys, dtype=np.uint64)
        if np.issubdtype(np.asarray(keys).dtype, np.integer)
        else hash_text64(pd.Series(keys))
    )
    h = mix64(kv ^ mix64(np.uint64(seed)))
    order = np.lexsort((np.asarray(keys), h))
    pos = np.empty(len(keys), np.int64)
    pos[order] = np.arange(len(keys))
    return pos


@pytest.mark.parametrize("nblocks", [1, 4])
def test_shuffle_matches_oracle_and_parallelism(ray_session, nblocks):
    from graphx_ray.stages.derive import deterministic_shuffle

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {"doc_id": rng.permutation(n).astype(np.int64), "v": rng.random(n)}
    )
    got = (
        deterministic_shuffle(
            rd.from_pandas(df).repartition(nblocks), on="doc_id", seed=7,
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(got["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    assert np.allclose(got["v"].to_numpy(), want["v"].to_numpy())
    assert np.array_equal(
        got["pos"].to_numpy(), _oracle_pos(want["doc_id"].to_numpy(), 7)
    )
    # a permutation: every position exactly once
    assert np.array_equal(np.sort(got["pos"].to_numpy()), np.arange(n))


def test_shuffle_seed_changes_permutation_string_keys(ray_session):
    from graphx_ray.stages.derive import deterministic_shuffle

    keys = [f"doc-{i:05d}" for i in range(800)]
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    a = (
        deterministic_shuffle(ds, on="k", seed=1, num_buckets=4)
        .to_pandas().sort_values("k")["pos"].to_numpy()
    )
    b = (
        deterministic_shuffle(ds, on="k", seed=2, num_buckets=4)
        .to_pandas().sort_values("k")["pos"].to_numpy()
    )
    assert np.array_equal(a, _oracle_pos(keys, 1))
    assert np.array_equal(b, _oracle_pos(keys, 2))
    assert not np.array_equal(a, b)
    # bucket count must not affect the order, only the task layout
    c = (
        deterministic_shuffle(ds, on="k", seed=1, num_buckets=16)
        .to_pandas().sort_values("k")["pos"].to_numpy()
    )
    assert np.array_equal(a, c)


@pytest.mark.parametrize("nblocks,descending", [(1, False), (4, False), (4, True)])
def test_global_rank_matches_pandas(ray_session, nblocks, descending):
    from graphx_ray.stages.derive import global_rank

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "score": np.round(rng.normal(size=n) * 100, 3),
            "payload": rng.integers(0, 9, n),
        }
    )
    # duplicated score values exercise the tiebreak
    df.loc[rng.choice(n, 500, replace=False), "score"] = 42.0
    got = (
        global_rank(
            rd.from_pandas(df).repartition(nblocks), by="score", tiebreak="id",
            descending=descending, num_buckets=8,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df.sort_values(
        ["score", "id"], ascending=[not descending, True]
    ).reset_index(drop=True)
    want["pos"] = np.arange(n, dtype=np.int64)
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id", "score", "payload", "pos"]],
        want[["id", "score", "payload", "pos"]],
        check_dtype=False,
    )


def test_global_rank_all_equal_and_bucket_invariance(ray_session):
    from graphx_ray.stages.derive import global_rank

    df = pd.DataFrame({"id": np.arange(300, dtype=np.int64), "v": 7.0})
    a = (
        global_rank(rd.from_pandas(df), by="v", tiebreak="id", num_buckets=1)
        .to_pandas().sort_values("id")["pos"].to_numpy()
    )
    b = (
        global_rank(rd.from_pandas(df), by="v", tiebreak="id", num_buckets=8)
        .to_pandas().sort_values("id")["pos"].to_numpy()
    )
    assert np.array_equal(a, np.arange(300))  # all-equal: pure tiebreak order
    assert np.array_equal(a, b)  # bucket count never changes the order


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_int64_keys_exact_past_2_53(ray_session, descending):
    """Integer sort keys must never round through float64: these pairs
    differ by 1 ulp-sub-float64 and MUST order exactly (the simhash/SNM
    regression); float64 boundaries only steer bucket balance."""
    from graphx_ray.stages.derive import global_rank

    base = 5_713_911_345_596_143_756
    keys = np.array(
        [base, base + 1, base - 1, -base, -base - 1, 0, 1, -1],
        np.int64,
    )
    df = pd.DataFrame({"id": np.arange(len(keys), dtype=np.int64), "k": keys})
    got = (
        global_rank(rd.from_pandas(df).repartition(3), by="k", tiebreak="id",
                    num_buckets=4, descending=descending)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = df.sort_values(["k", "id"], ascending=[not descending, True])
    want = want.reset_index(drop=True)
    want["pos"] = np.arange(len(keys), dtype=np.int64)
    want = want.sort_values("id").reset_index(drop=True)
    assert np.array_equal(got["pos"].to_numpy(), want["pos"].to_numpy())


def test_snm_pairs_matches_pandas_and_invariance(ray_session):
    from graphx_ray.functions.dedup import snm_pairs

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "key": rng.integers(-(2**62), 2**62, n, dtype=np.int64)}
    )
    w = 5
    ranked = df.sort_values(["key", "doc_id"]).reset_index(drop=True)
    want = []
    for o in range(1, w):
        a = ranked["doc_id"].to_numpy()[:-o] if o else None
        want += list(zip(ranked["doc_id"].to_numpy()[:-o],
                         ranked["doc_id"].to_numpy()[o:],
                         [o] * (n - o)))
    want = pd.DataFrame(want, columns=["a", "b", "gap"]).sort_values(
        ["a", "b"]).reset_index(drop=True)
    outs = [
        snm_pairs(rd.from_pandas(df).repartition(p), key_col="key", window=w,
                  num_partitions=q, zone_size=zs)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        for p, q, zs in ((2, 3, 16), (5, 7, 101))
    ]
    pd.testing.assert_frame_equal(outs[0], want, check_dtype=False)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with pytest.raises(ValueError):
        snm_pairs(rd.from_pandas(df), key_col="key", window=1)
