"""Exact two-pass heavy hitters (functions/sketch.heavy_hitters).

The output is EXACT by construction (Misra-Gries block candidates are a
superset of the true φ-heavy hitters; the verify pass recounts exactly),
so the pin is direct equality with a pandas value_counts + threshold —
on int and string keys, across different block layouts, on a stream with
no hitters, and on the boundary where a key sits exactly AT the
threshold (must be excluded: the rule is strict cnt·(k+1) > n).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.sketch import heavy_hitters


def exact(keys: pd.Series, k: int) -> pd.DataFrame:
    vc = keys.value_counts()
    out = vc[vc * (k + 1) > len(keys)].rename("cnt").rename_axis("key").reset_index()
    return out.sort_values("key").reset_index(drop=True)


def zipf_keys(n_head: int = 199, scale: int = 2000, seed: int = 0) -> np.ndarray:
    keys = np.repeat(
        np.arange(1, n_head + 1), (scale // np.arange(1, n_head + 1)).astype(int)
    )
    np.random.default_rng(seed).shuffle(keys)
    return keys


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_heavy_hitters_int_exact_any_layout(parts):
    keys = zipf_keys()
    ds = rd.from_pandas(pd.DataFrame({"key": keys})).repartition(parts)
    got = (
        heavy_hitters(ds, "key", k=10)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    want = exact(pd.Series(keys), k=10)
    assert np.array_equal(got["key"].to_numpy(), want["key"].to_numpy())
    assert np.array_equal(got["cnt"].to_numpy(), want["cnt"].to_numpy())


def test_heavy_hitters_string_keys():
    keys = pd.Series(zipf_keys(seed=1)).map(lambda x: f"w{x}")
    ds = rd.from_pandas(pd.DataFrame({"key": keys})).repartition(4)
    got = (
        heavy_hitters(ds, "key", k=10)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    want = exact(keys, k=10)
    assert got["key"].tolist() == want["key"].tolist()
    assert np.array_equal(got["cnt"].to_numpy(), want["cnt"].to_numpy())


def test_heavy_hitters_none_found_keeps_schema():
    ds = rd.from_pandas(pd.DataFrame({"key": np.arange(1000)})).repartition(4)
    out = heavy_hitters(ds, "key", k=1)
    assert out.schema().names == ["key", "cnt"]
    assert out.count() == 0


def test_heavy_hitters_strict_threshold_boundary():
    """10 distinct keys, 10 occurrences each, k=9: every key has
    cnt·(k+1) = 100 == n exactly — strict > excludes ALL of them; with
    k=10 (cnt·11 = 110 > 100) every key qualifies."""
    keys = np.repeat(np.arange(10), 10)
    ds = rd.from_pandas(pd.DataFrame({"key": keys})).repartition(2)
    assert heavy_hitters(ds, "key", k=9).count() == 0
    got = heavy_hitters(ds, "key", k=10).to_pandas()
    assert len(got) == 10 and (got["cnt"] == 10).all()


def test_heavy_hitters_nulls_excluded():
    """Nulls are dropped from both the count base n and the candidates."""
    keys = pd.Series([1.0, 1.0, 1.0, None, 2.0] * 10)
    ds = rd.from_pandas(pd.DataFrame({"key": keys.astype("Int64")})).repartition(2)
    got = heavy_hitters(ds, "key", k=2).to_pandas()
    # non-null n = 40; 1 appears 30 (30·3 > 40 ✓), 2 appears 10 (30 ≤ 40 ✗)
    assert got["key"].tolist() == [1] and got["cnt"].tolist() == [30]


def test_heavy_hitters_validation():
    ds = rd.from_pandas(pd.DataFrame({"key": [1, 2]}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "key", k=0)
