"""HyperLogLog approximate-distinct: accuracy, exact mergeability
(parallelism invariance), and the keyed variant vs exact nunique."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.sketch import approx_count_distinct, grouped_approx_ndv


def test_hll_accuracy_and_parallelism_invariance():
    rng = np.random.default_rng(9)
    true_n = 50_000
    # duplicates: every distinct value appears 1-4 times
    vals = np.repeat(np.arange(true_n, dtype=np.int64) * 7919, rng.integers(1, 5, true_n))
    df = pd.DataFrame({"x": rng.permutation(vals)})
    est = approx_count_distinct(rd.from_pandas(df), "x", p=14, num_partitions=4)
    assert abs(est - true_n) / true_n < 0.03  # 1.04/sqrt(2^14) ≈ 0.8%
    # register max-merge is exact → the estimate is identical at any
    # block structure
    est2 = approx_count_distinct(rd.from_pandas(df).repartition(13), "x", p=14,
                                 num_partitions=4)
    assert est == est2


def test_hll_string_column():
    n = 20_000
    df = pd.DataFrame({"s": [f"key-{i % 7000}" for i in range(n)]})
    est = approx_count_distinct(rd.from_pandas(df), "s", p=14)
    assert abs(est - 7000) / 7000 < 0.05


def test_grouped_approx_ndv_matches_exact_within_error():
    rng = np.random.default_rng(11)
    groups = ["a", "b", "c"]
    sizes = {"a": 1000, "b": 8000, "c": 30}
    frames = []
    for g in groups:
        n = sizes[g]
        frames.append(pd.DataFrame({"g": g, "x": rng.integers(0, n, n * 3) + hash(g) % 97}))
    df = pd.concat(frames, ignore_index=True)
    got = (
        grouped_approx_ndv(rd.from_pandas(df), ["g"], "x", p=12, num_partitions=4)
        .to_pandas()
        .set_index("g")["approx_ndv"]
    )
    exact = df.groupby("g")["x"].nunique()
    for g in groups:
        rel = abs(got[g] - exact[g]) / exact[g]
        assert rel < 0.08, (g, got[g], exact[g])


def test_approx_quantiles_accuracy_and_determinism():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from graphx_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(23)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": np.repeat(["a", "b"], n // 2),
            "value": np.concatenate(
                [rng.exponential(10, n // 2), rng.normal(100, 5, n // 2)]
            ),
        }
    )
    outs = []
    for nblocks in (2, 7):  # parallelism-invariant sample → identical result
        got = (
            approx_quantiles(
                rd.from_pandas(pdf).repartition(nblocks),
                ["g"], "value", [0.5, 0.9], frac=0.3, on="id", seed=19,
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # rank error of a 30% sample at n=10k is well under 2 quantile points
    for g, grp in pdf.groupby("g"):
        row = outs[0][outs[0].g == g].iloc[0]
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            lo, hi = np.quantile(grp["value"], [max(q - 0.02, 0), min(q + 0.02, 1)])
            assert lo <= row[col] <= hi, (g, col)
