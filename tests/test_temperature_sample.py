"""Temperature mixing sampler vs an explicit threshold oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from graphx_ray.ids import mix64
from graphx_ray.stages.derive import temperature_sample

SEED = 11


def _mk():
    rng = np.random.default_rng(13)
    sizes = {"web": 3000, "books": 400, "code": 60, "tiny": 9}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    return df.sample(frac=1.0, random_state=rng.integers(1 << 30)).reset_index(
        drop=True
    )


def _oracle(df, coeff):
    n = df.groupby("source").size()
    keep = []
    seed_mix = mix64(np.uint64(SEED))
    for d, s in zip(df["doc_id"], df["source"]):
        p = min(1.0, coeff / np.sqrt(float(n[s])))
        th = np.uint64(min(int(p * 2.0**64), (1 << 64) - 1))
        if mix64(np.uint64(d) ^ seed_mix) < th:
            keep.append((d, s))
    return pd.DataFrame(keep, columns=["doc_id", "source"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def test_temperature_sample_matches_oracle(ray_session):
    df = _mk()
    got = (
        temperature_sample(
            rd.from_pandas(df).repartition(7),
            strata_col="source", on="doc_id", coeff=8.0, seed=SEED,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(df, 8.0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_temperature_sample_upweights_small_sources(ray_session):
    """Kept counts scale ≈ coeff·sqrt(n_s): the smallest source keeps
    everything, the largest keeps ≈ coeff·sqrt(n)."""
    df = _mk()
    got = temperature_sample(
        rd.from_pandas(df).repartition(4),
        strata_col="source", on="doc_id", coeff=8.0, seed=SEED,
    ).to_pandas()
    kept = got.groupby("source").size()
    n = df.groupby("source").size()
    assert kept["tiny"] == n["tiny"]  # p = 1 for n < coeff²
    for s in ["web", "books"]:
        expect = 8.0 * np.sqrt(n[s])
        assert abs(kept[s] - expect) < 4 * np.sqrt(expect), (s, kept[s], expect)
    # share of the small source rose relative to raw proportions
    assert kept["code"] / kept.sum() > n["code"] / n.sum()


def test_temperature_sample_null_strata_and_bad_coeff(ray_session):
    """ADVICE r4: null strata must fall to the default-frac path (not
    crash bincount / alias the last stratum's threshold), and a negative
    INT coeff must be rejected like a negative float."""
    import pytest

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "source": ["web"] * 20 + [None] * 20,
        }
    )
    got = temperature_sample(
        rd.from_pandas(df).repartition(3),
        strata_col="source", on="doc_id", coeff=100.0, seed=SEED,
    ).to_pandas()
    # coeff/sqrt(20) > 1 → every non-null "web" row kept; null-stratum
    # rows hit stratified_sample's default_frac = 0.0 and are dropped
    assert sorted(got["doc_id"]) == list(range(20))
    assert got["source"].notna().all()
    with pytest.raises(ValueError):
        temperature_sample(
            rd.from_pandas(df), strata_col="source", on="doc_id",
            coeff=-1, seed=SEED,
        )
