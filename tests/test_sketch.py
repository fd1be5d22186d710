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


# ---------------------------------------------------------------- KLL


def test_kll_rank_error_bound():
    """Deterministic-compaction KLL: observed quantile-rank error stays
    within the ~log2(n/k)/k analysis bound (with a 2x margin) on uniform,
    normal and heavy-tail data."""
    from graphx_ray.functions.sketch import KLL

    rng = np.random.default_rng(11)
    n, k = 200_000, 256
    bound = 2.0 * np.log2(n / k) / k
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    for data in (
        rng.random(n),
        rng.normal(size=n),
        rng.pareto(1.5, n),
    ):
        sk = KLL(k)
        for chunk in np.array_split(data, 37):
            sk.insert(chunk)
        got = sk.quantiles(qs)
        srt = np.sort(data)
        for q, v in zip(qs, got):
            rank = np.searchsorted(srt, v, side="right") / n
            assert abs(rank - q) <= bound, (q, rank, bound)


def test_kll_merge_matches_single_sketch_error():
    """Mergeability: sketching 8 partitions independently then merging
    keeps the same rank-error bound as one sketch."""
    from graphx_ray.functions.sketch import KLL

    rng = np.random.default_rng(7)
    n, k = 120_000, 256
    data = rng.normal(size=n)
    parts = np.array_split(data, 8)
    merged = KLL(k)
    for p in parts:
        merged.merge(KLL(k).insert(p))
    srt = np.sort(data)
    bound = 2.0 * np.log2(n / k) / k
    for q, v in zip([0.1, 0.5, 0.9], merged.quantiles([0.1, 0.5, 0.9])):
        rank = np.searchsorted(srt, v, side="right") / n
        assert abs(rank - q) <= bound


def test_kll_quantiles_dataset_grouped(ray_session):
    """Dataset surface: per-group KLL quantiles land within the bound at
    any input parallelism; exact when a group fits one level."""
    import pandas as pd
    import ray.data as rd

    from graphx_ray.functions.sketch import kll_quantiles

    rng = np.random.default_rng(3)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "x": rng.random(n),
        }
    )
    qs = [0.1, 0.5, 0.9]
    for nblocks in (2, 9):
        out = (
            kll_quantiles(
                rd.from_pandas(df).repartition(nblocks), ["g"], "x", qs,
                k=256, num_partitions=4,
            )
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )
        assert len(out) == 9
        for g, grp in df.groupby("g"):
            srt = np.sort(grp["x"].to_numpy())
            ng = len(srt)
            bound = 2.5 * np.log2(max(ng / 256, 2)) / 256
            sub = out[out.g == g]
            for q, v in zip(sub["q"], sub["value"]):
                rank = np.searchsorted(srt, v, side="right") / ng
                assert abs(rank - q) <= bound, (g, q, rank, bound)
    # tiny group: sketch never compacts -> exact discrete quantiles
    small = pd.DataFrame({"g": ["z"] * 10, "x": np.arange(10, dtype=float)})
    out = kll_quantiles(rd.from_pandas(small), ["g"], "x", [0.5], k=256).to_pandas()
    assert out["value"].iloc[0] == 4.0  # ceil(0.5*10)=5th of 0..9


# ------------------------------------------------------- count-min sketch


def test_count_min_overestimates_and_is_partition_invariant(ray_session):
    import ray.data as rd

    from graphx_ray.functions.sketch import count_min, count_min_estimate

    rng = np.random.default_rng(9)
    vals = rng.zipf(1.5, size=20_000).astype(np.int64) % 500
    df = pd.DataFrame({"v": vals})
    true = pd.Series(vals).value_counts()

    cells_a = count_min(rd.from_pandas(df), "v", width=1024, depth=4,
                        num_partitions=2).to_pandas()
    cells_b = count_min(rd.from_pandas(df), "v", width=1024, depth=4,
                        num_partitions=7).to_pandas()
    key = ["d", "slot"]
    pd.testing.assert_frame_equal(
        cells_a.sort_values(key).reset_index(drop=True),
        cells_b.sort_values(key).reset_index(drop=True),
    )
    # every row's total mass equals the input size (sketch invariant)
    assert (cells_a.groupby("d")["n"].sum() == len(vals)).all()

    items = true.index.to_numpy()
    est = count_min_estimate(cells_a, items, width=1024, depth=4)
    assert (est >= true.to_numpy()).all()  # CM never underestimates
    # with 1024 slots and 500 keys, most estimates are exact
    assert (est == true.to_numpy()).mean() > 0.5


def test_count_min_string_column(ray_session):
    import ray.data as rd

    from graphx_ray.functions.sketch import count_min, count_min_estimate

    df = pd.DataFrame({"s": ["a"] * 7 + ["b"] * 3 + ["c"]})
    cells = count_min(rd.from_pandas(df), "s", width=64, depth=3).to_pandas()
    est = count_min_estimate(cells, np.array(["a", "b", "c"], object),
                             width=64, depth=3)
    assert (est >= np.array([7, 3, 1])).all()
    assert est[0] >= est[1] >= est[2]


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    from graphx_ray.functions.sketch import bloom_build, bloom_probe

    rng = np.random.default_rng(11)
    members = rng.choice(10_000_000, 2000, replace=False).astype(np.int64)
    m_bits, k = 1 << 15, 7
    bits = bloom_build(
        rd.from_pandas(pd.DataFrame({"x": members})), "x",
        m_bits=m_bits, k_hashes=k, seed=42,
    )
    absent = np.setdiff1d(
        rng.choice(10_000_000, 5000, replace=False).astype(np.int64), members
    )
    probe = rd.from_pandas(
        pd.DataFrame({"x": np.concatenate([members, absent])})
    )
    got = bloom_probe(probe, "x", bits, m_bits=m_bits, k_hashes=k, seed=42).to_pandas()
    mem = got[got["x"].isin(set(members.tolist()))]
    assert (mem["maybe"] == 1).all()  # no false negatives, ever
    fp = got[~got["x"].isin(set(members.tolist()))]["maybe"].mean()
    theory = (1 - np.exp(-k * len(members) / m_bits)) ** k
    assert fp <= max(2.5 * theory, 0.01)


def test_bloom_partition_invariance_and_strings(ray_session):
    from graphx_ray.functions.sketch import bloom_build, bloom_probe

    words = pd.DataFrame({"w": [f"tok{i}" for i in range(500)]})
    outs = []
    for parts in (1, 4):
        ds = rd.from_pandas(words).repartition(parts)
        bits = (
            bloom_build(ds, "w", m_bits=2048, k_hashes=4, seed=7, num_partitions=parts + 2)
            .to_pandas()
            .sort_values("bit")
            .reset_index(drop=True)
        )
        outs.append(bits)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bitmap OR is order-free
    probe = pd.DataFrame({"w": ["tok3", "definitely-not-present-aaaa"]})
    got = bloom_probe(
        rd.from_pandas(probe), "w", outs[0], m_bits=2048, k_hashes=4, seed=7
    ).to_pandas()
    assert got.loc[got["w"] == "tok3", "maybe"].iloc[0] == 1


def test_bloom_probe_matches_python_reference(ray_session):
    from graphx_ray.functions.sketch import _bloom_hashes, bloom_build, bloom_probe
    from graphx_ray.ids import mix64

    members = np.arange(100, 200, dtype=np.int64)
    m_bits, k, seed = 512, 3, 9
    bits_df = bloom_build(
        rd.from_pandas(pd.DataFrame({"x": members})), "x",
        m_bits=m_bits, k_hashes=k, seed=seed,
    ).to_pandas()
    # python reference: identical double-hash recipe
    s1 = mix64(np.uint64(seed))
    s2 = mix64(np.uint64(seed) + np.uint64(0x9E3779B97F4A7C15))
    h1 = mix64(members.astype(np.uint64) ^ s1)
    h2 = mix64(members.astype(np.uint64) ^ s2) | np.uint64(1)
    want = set()
    for i in range(k):
        want |= set(((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(int).tolist())
    assert set(bits_df["bit"].tolist()) == want
    probe = np.arange(90, 110, dtype=np.int64)
    got = bloom_probe(
        rd.from_pandas(pd.DataFrame({"x": probe})), "x", bits_df,
        m_bits=m_bits, k_hashes=k, seed=seed,
    ).to_pandas().set_index("x")["maybe"]
    pos = _bloom_hashes(probe.astype(np.uint64), m_bits=m_bits, k_hashes=k, seed=seed)
    ref = pos.reshape(len(probe), k)
    expect = np.array([all(p in want for p in row) for row in ref], dtype=np.int64)
    assert (got.loc[probe].to_numpy() == expect).all()
