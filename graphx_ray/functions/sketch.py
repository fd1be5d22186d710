"""Mergeable sketches for large-scale profiling (task addendum: "a novel
sketch" — implemented from the published HyperLogLog construction,
Flajolet et al. 2007, with the standard small-range linear-counting
correction).

HyperLogLog over a Ray Data column:

- each batch hashes its values (splitmix64 over ints, SipHash over
  strings — the repo's standard vectorized hashes) and emits its 2^p
  register maxima as (register, rho) rows — a PARTIAL sketch, mergeable
  by max;
- one storage-backed ``grouped_reduce(max)`` keyed by register merges all
  partials (registers ≪ data: the shuffle moves at most 2^p rows per
  block);
- the driver folds 2^p register values into the estimate — O(2^p) driver
  state, independent of input size.

``grouped_approx_ndv`` is the keyed variant: registers keyed by
(group, register), one reduce, one estimate row per group — the shape a
per-language distinct-token profile needs at 100 TB.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graphx_ray.ids import hash_text64, mix64


def _alpha(m: int) -> float:
    """Bias-correction constant of the published HLL estimator."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash_col(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return mix64(col.to_numpy().astype(np.uint64))
    import pandas as pd  # noqa: F401

    return hash_text64(col.to_pandas())


def _registers(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per value: register = top p bits, rho = 1 +
    leading zeros of the remaining 64−p bits (capped at 64−p+1)."""
    m = 1 << p
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # leading zeros of `rest` via float64 exponent is unsafe past 2^53 —
    # use a bit-length loop over the 64-bit lanes (6 vectorized steps)
    lz = np.zeros(len(h), np.uint64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint64(shift)
        x[mask] = x[mask] << np.uint64(shift)
    rho = lz.astype(np.int64) + 1
    np.minimum(rho, 64 - p + 1, out=rho)
    return reg, rho


def _estimate(regs: np.ndarray, p: int) -> float:
    """Fold a dense 2^p register vector into the HLL estimate (with the
    published linear-counting small-range correction)."""
    m = 1 << p
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_count_distinct(ds: Dataset, col: str, *, p: int = 14,
                          num_partitions: int = 8) -> float:
    """Approximate distinct count of ``ds[col]`` (relative error ≈
    1.04/√2^p ≈ 0.8% at the default p=14)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        reg, rho = _registers(_hash_col(batch[col]), p)
        order = np.argsort(reg, kind="stable")
        reg, rho = reg[order], rho[order]
        new = np.empty(len(reg), bool)
        new[0] = True
        np.not_equal(reg[1:], reg[:-1], out=new[1:])
        rs = np.flatnonzero(new)
        return pa.table(
            {"register": pa.array(reg[rs]), "rho": pa.array(np.maximum.reduceat(rho, rs))}
        )

    from graphx_ray.stages.derive import grouped_reduce

    merged = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["register"],
        sum_col="rho",
        agg="max",
        num_partitions=num_partitions,
    ).to_pandas()
    regs = np.zeros(1 << p, np.int64)
    if len(merged):
        regs[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    return _estimate(regs, p)


def grouped_approx_ndv(ds: Dataset, keys: list[str], col: str, *, p: int = 12,
                       num_partitions: int = 8) -> Dataset:
    """Per-group approximate distinct count of ``col``: (keys...,
    approx_ndv: int64). Registers are keyed by (group, register) through
    ONE storage-backed max-reduce; the final fold runs inside a group-
    partitioned map, so no group's registers ever assemble on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return pa.table(
                {**{k: batch[k] for k in keys},
                 "register": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        reg, rho = _registers(_hash_col(batch[col]), p)
        kcols = []
        decode = {}
        for k in keys:
            arr = batch[k]
            if pa.types.is_integer(arr.type):
                kcols.append(arr.to_numpy())
            else:
                codes, uniq = pd.factorize(arr.to_pandas())
                kcols.append(codes)
                decode[k] = uniq
        order = np.lexsort(tuple(reversed(kcols + [reg])))
        reg, rho = reg[order], rho[order]
        kcols = [c[order] for c in kcols]
        new = np.zeros(len(reg), bool)
        new[0] = True
        new[1:] |= reg[1:] != reg[:-1]
        for c in kcols:
            new[1:] |= c[1:] != c[:-1]
        rs = np.flatnonzero(new)
        data = {}
        for k, c in zip(keys, kcols):
            vals = c[rs]
            data[k] = (
                pa.array(np.asarray(decode[k], dtype=object)[vals], type=batch[k].type)
                if k in decode
                else pa.array(vals, type=batch[k].type)
            )
        data["register"] = pa.array(reg[rs])
        data["rho"] = pa.array(np.maximum.reduceat(rho, rs))
        return pa.table(data)

    from graphx_ray.stages.derive import grouped_reduce, partitioned_map

    merged = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys + ["register"],
        sum_col="rho",
        agg="max",
        num_partitions=num_partitions,
    )

    def fold(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        fields = [tbl.schema.field(k) for k in keys] + [pa.field("approx_ndv", pa.int64())]
        out_schema = pa.schema(fields)
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        d = tbl.to_pandas()
        rows = []
        for kv, grp in d.groupby(keys, sort=False):
            kt = kv if isinstance(kv, tuple) else (kv,)
            regs = np.zeros(1 << p, np.int64)
            regs[grp["register"].to_numpy()] = grp["rho"].to_numpy()
            # round half-up (floor(x+0.5)), matching the SQL oracle — the
            # repo-wide pinned recipe; Python round() is banker's rounding
            rows.append((*kt, int(math.floor(_estimate(regs, p) + 0.5))))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=keys + ["approx_ndv"]), preserve_index=False
        ).cast(out_schema)

    return partitioned_map(merged, keys, fold, num_partitions=num_partitions)


def approx_quantiles(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    qs: list[float],
    *,
    frac: float = 0.25,
    on: str | None = None,
    seed: int = 19,
    num_partitions: int = 8,
) -> Dataset:
    """Sample-based approximate per-group quantiles: a DETERMINISTIC
    splitmix64 Bernoulli sample (``derive.random_sample`` — identical at
    any parallelism and on resume) feeds the exact discrete-quantile
    kernel. Error is the binomial order-statistic bound of the sampled
    fraction (≈ 1/√(frac·n) quantile-rank error); the shuffle only ever
    moves frac·|rows|. Fully replayable: both stages are pure functions
    of the data, so a SQL oracle recomputes the identical sample and the
    identical order statistics."""
    from graphx_ray.stages.derive import grouped_quantiles, random_sample

    key_col = on or keys[0]
    sampled = random_sample(ds, frac, on=key_col, seed=seed)
    return grouped_quantiles(
        sampled, keys, value_col, qs, num_partitions=num_partitions
    )
