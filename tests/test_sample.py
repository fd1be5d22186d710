"""O3 random_sample: deterministic, parallelism-invariant Bernoulli sample."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graphx_ray.stages.derive import random_sample


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_random_sample_deterministic_and_parallelism_invariant():
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(2000), type=pa.int64()),
            "text": pa.array([f"d{i}" for i in range(2000)]),
        }
    )
    ds1 = rd.from_arrow(tbl)
    ds4 = rd.from_arrow(tbl).repartition(7)  # different block structure

    s1 = _ids(random_sample(ds1, 0.25, on="doc_id", seed=3))
    s2 = _ids(random_sample(ds1, 0.25, on="doc_id", seed=3))
    s3 = _ids(random_sample(ds4, 0.25, on="doc_id", seed=3))
    assert s1 == s2 == s3  # same seed → same rows, at any parallelism
    assert 0.15 < len(s1) / 2000 < 0.35  # Bernoulli rate in the right range

    other = _ids(random_sample(ds1, 0.25, on="doc_id", seed=4))
    assert other != s1  # different seed → different sample

    # string key column works too and is deterministic
    t1 = _ids(random_sample(ds1, 0.5, on="text", seed=0))
    t2 = _ids(random_sample(ds4, 0.5, on="text", seed=0))
    assert t1 == t2

    assert _ids(random_sample(ds1, 0.0, on="doc_id")) == []
    assert len(_ids(random_sample(ds1, 1.0, on="doc_id"))) == 2000


def test_stratified_sample_rates_and_determinism(ray_session=None):
    import pandas as pd
    import ray.data as rd

    from graphx_ray.stages.derive import stratified_sample

    n = 20000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "cat": np.where(np.arange(n) % 3 == 0, "keep_all",
                            np.where(np.arange(n) % 3 == 1, "some", "rest")),
        }
    )
    fracs = {"keep_all": 1.0, "some": 0.2}
    got = (
        stratified_sample(rd.from_pandas(df), fracs, strata_col="cat", on="id",
                          seed=3, default_frac=0.05)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    rates = got["cat"].value_counts() / df["cat"].value_counts()
    # frac=1.0 must keep EVERY row (the float64-coercion regression dropped them)
    assert rates["keep_all"] == 1.0
    assert abs(rates["some"] - 0.2) < 0.03
    assert abs(rates["rest"] - 0.05) < 0.02
    # parallelism-invariant: same decision at a different block structure
    again = (
        stratified_sample(rd.from_pandas(df).repartition(7), fracs, strata_col="cat",
                          on="id", seed=3, default_frac=0.05)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_grouped_quantiles_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from graphx_ray.stages.derive import grouped_quantiles

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], 5000),
            "value": np.round(rng.normal(50, 20, 5000), 3),
        }
    )
    got = (
        grouped_quantiles(rd.from_pandas(df), ["g"], "value", [0.5, 0.9, 0.99],
                          num_partitions=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
               quantile_disc(value, 0.5) AS q50,
               quantile_disc(value, 0.9) AS q90,
               quantile_disc(value, 0.99) AS q99
        FROM df GROUP BY g ORDER BY g
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_hash_split_deterministic_rates_and_leakage_safety(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from graphx_ray.stages.derive import hash_split

    n = 20_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64)})
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(rd.from_pandas(df), splits, on="k", seed=3).to_pandas()
    b = hash_split(rd.from_pandas(df).repartition(13), splits, on="k",
                   seed=3).to_pandas()
    # pure per-row function: identical at any parallelism
    pd.testing.assert_frame_equal(
        a.sort_values("k").reset_index(drop=True),
        b.sort_values("k").reset_index(drop=True),
    )
    rates = a["split"].value_counts(normalize=True)
    for name, f in splits.items():
        assert abs(rates[name] - f) < 0.02, name
    # same key ⇒ same split even across tables (leakage safety)
    dup = pd.DataFrame({"k": np.arange(0, n, 7, dtype=np.int64)})
    c = hash_split(rd.from_pandas(dup), splits, on="k", seed=3).to_pandas()
    merged = c.merge(a, on="k", suffixes=("_c", "_a"))
    assert (merged["split_c"] == merged["split_a"]).all()
    # every row is assigned; validation errors
    assert set(a["split"].unique()) == set(splits)
    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), {"train": 1.0}, on="k")
    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), {"a": 0.5, "b": 0.4}, on="k")


def test_priority_sample_matches_replay_and_tilts(ray_session):
    import ray.data as rd

    from graphx_ray.ids import hash_text64, mix64
    from graphx_ray.stages.derive import priority_sample

    rng = np.random.default_rng(7)
    n, k = 5000, 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "w": rng.integers(1, 100, n).astype(np.float64),
        }
    )
    for nblocks in (1, 5):
        got = (
            priority_sample(
                rd.from_pandas(df).repartition(nblocks), k=k,
                weight_col="w", on="doc_id", seed=3,
            )
            .to_pandas()
            .sort_values("priority")
            .reset_index(drop=True)
        )
        u = mix64(df["doc_id"].to_numpy().astype(np.uint64)
                  ^ mix64(np.uint64(3))).astype(np.float64)
        p = u / df["w"].to_numpy()
        order = np.lexsort((df["doc_id"].to_numpy(), p))[:k]
        assert len(got) == k
        assert np.array_equal(
            np.sort(got["doc_id"].to_numpy()), np.sort(df["doc_id"].to_numpy()[order])
        )
        assert np.allclose(got["priority"].to_numpy(), np.sort(p[order]), rtol=0)
    # weighted tilt: mean weight of the kept set exceeds the corpus mean
    assert got["w"].mean() > df["w"].mean() * 1.3


def test_priority_sample_rejects_bad_weights(ray_session):
    import ray.data as rd

    from graphx_ray.stages.derive import priority_sample

    df = pd.DataFrame({"doc_id": [1, 2, 3], "w": [1.0, 0.0, 2.0]})
    with pytest.raises(Exception):
        priority_sample(
            rd.from_pandas(df), k=2, weight_col="w", on="doc_id"
        ).to_pandas()
