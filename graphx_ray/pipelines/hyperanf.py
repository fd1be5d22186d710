"""HyperANF: per-vertex neighborhood function via HLL register exchange.

The approximate-neighborhood-function algorithm of Boldi, Rosa & Vigna
(WWW 2011; the ANF idea is Palmer, Gibbons & Faloutsos, KDD 2002): give
every vertex a HyperLogLog counter initialized to {v}; at step t each
counter absorbs (register-wise MAX) its neighbors' counters, after which
counter v estimates |ball(v, t)| — the number of vertices within
distance t. Folding the per-vertex estimates gives the graph's
neighborhood function / effective-diameter curve, THE published way to
measure distance distributions on web-scale graphs (it replaced exact
BFS-from-every-vertex, which is O(V·E)).

Engine shape (all storage-backed, nothing driver-sized):

- counters live SPARSE as (vid, register, rho) rows — at most m = 2^p
  rows per vertex, exactly the representation ``sketch.grouped_approx_ndv``
  uses, so the DuckDB oracle replays registers bit-identically
  (splitmix64 hash, bit-length rho, max-merge is order-free);
- one step = one ``bucket_join`` (neighbor registers ride the symmetric
  adjacency) + one ``grouped_reduce(max)`` keyed (vid, register) — the
  same two-shuffle cost as a derive-composed superstep. A CSR-engine
  variant would pack registers into per-part arrays; this composition is
  the honest Dataset-API expression and keeps every step resumable;
- estimates fold inside a vid-keyed ``partitioned_map`` (never on the
  driver), with the published dense estimator + linear-counting
  small-range correction (the absent-register trick: each of the
  m − n_present empty registers contributes 2⁰ = 1 to the denominator);
- ball sizes are reported as ``floor(est + 0.5)`` int64 — the repo's
  pinned half-up recipe, shared with ``approx_ndv_events``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from graphx_ray.functions.sketch import _alpha, _registers
from graphx_ray.ids import mix64

REG_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("register", pa.int64()), ("rho", pa.int64())]
)
BALL_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("t", pa.int64()), ("ball", pa.int64())]
)


def _fold_balls(p: int, t: int):
    """vid-keyed fold of sparse registers → (vid, t, ball) — vectorized
    lexsort + reduceat over the whole partition."""
    m = 1 << p
    alpha = _alpha(m)

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return BALL_SCHEMA.empty_table()
        vid = tbl["vid"].to_numpy()
        reg = tbl["register"].to_numpy()
        rho = tbl["rho"].to_numpy()
        # register as the inner sort key pins the engine's summation order
        # (ascending register id) — see the oracle note on float sums
        order = np.lexsort((reg, vid))
        vid, rho = vid[order], rho[order]
        new = np.ones(len(vid), bool)
        new[1:] = vid[1:] != vid[:-1]
        starts = np.flatnonzero(new)
        npres = np.diff(np.append(starts, len(vid)))
        s = np.add.reduceat(np.power(2.0, -rho.astype(np.float64)), starts)
        zeros = m - npres
        raw = alpha * m * m / (s + zeros)
        with np.errstate(divide="ignore"):
            lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
        est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
        return pa.table(
            {
                "vid": pa.array(vid[starts]),
                "t": pa.array(np.full(len(starts), t, np.int64)),
                "ball": pa.array(np.floor(est + 0.5).astype(np.int64)),
            },
            schema=BALL_SCHEMA,
        )

    return fold


def hyperanf(
    edges, *, p: int = 4, iters: int = 3, num_parts: int = 16
) -> Dataset:
    """(vid, t, ball) for t = 0..iters over the undirected simple graph:
    ball(v, t) ≈ |{u : dist(u, v) ≤ t}| from a 2^p-register HLL."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import (
        canonical_edges,
        grouped_reduce,
        partitioned_map,
    )
    from graphx_ray.stages.motif import bucket_join

    can = canonical_edges(_as_dataset(edges))

    def both(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        return pa.table(
            {
                "c": pa.array(np.concatenate([u, v]), type=pa.int64()),
                "n": pa.array(np.concatenate([v, u]), type=pa.int64()),
            }
        )

    adj = can.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)

    def init(batch: pa.Table) -> pa.Table:
        vid = np.unique(
            np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        )
        reg, rho = _registers(mix64(vid.astype(np.uint64)), p)
        return pa.table(
            {"vid": pa.array(vid, type=pa.int64()),
             "register": pa.array(reg), "rho": pa.array(rho)},
            schema=REG_SCHEMA,
        )

    # per-batch endpoints may repeat across batches; the max-reduce below
    # absorbs duplicates (identical (vid, register, rho) rows — max is
    # idempotent), so no distinct pass is needed
    regs = grouped_reduce(
        can.map_batches(init, batch_format="pyarrow", zero_copy_batch=True),
        ["vid", "register"], sum_col="rho", agg="max",
        num_partitions=num_parts, empty_schema=REG_SCHEMA,
    )

    out = partitioned_map(
        regs, ["vid"], _fold_balls(p, 0),
        num_partitions=num_parts, empty_schema=BALL_SCHEMA,
    )
    for t in range(1, iters + 1):
        moved = bucket_join(
            adj, regs, on="n", right_on="vid", num_partitions=num_parts
        )

        def recenter(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"vid": batch["c"], "register": batch["register"],
                 "rho": batch["rho"]},
                schema=REG_SCHEMA,
            )

        msgs = moved.map_batches(
            recenter, batch_format="pyarrow", zero_copy_batch=True
        )
        regs = grouped_reduce(
            msgs.union(regs), ["vid", "register"], sum_col="rho", agg="max",
            num_partitions=num_parts, empty_schema=REG_SCHEMA,
        )
        out = out.union(
            partitioned_map(
                regs, ["vid"], _fold_balls(p, t),
                num_partitions=num_parts, empty_schema=BALL_SCHEMA,
            )
        )
    return out


HARMONIC_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("harmonic_2e6", pa.int64())]
)


def hyperball_harmonic(
    edges, *, p: int = 4, iters: int = 2, num_parts: int = 16
) -> Dataset:
    """HyperBall harmonic-centrality estimate (Boldi & Vigna, WWW 2014 —
    the published use of these counters): harmonic(v) = Σ_t (|ball(v,t)|
    − |ball(v,t−1)|)/t, reported in 2·10⁶-units so every weight
    2_000_000/t is an EXACT integer for t ≤ 2 (and any divisor of 2·10⁶)
    — the whole score is integer arithmetic over the ball table, so sums
    are order-free and the SQL oracle replays bit-identically; no float
    division ever happens. Caller divides by 2e6.

    One vid-keyed ``partitioned_map`` over the (vid, t, ball) output of
    ``hyperanf`` — each vertex's iters+1 rows are co-resident."""
    for t in range(1, iters + 1):
        if 2_000_000 % t:
            raise ValueError(
                f"t={t} does not divide 2e6 — weights would not be exact"
            )
    from graphx_ray.stages.derive import partitioned_map

    balls = hyperanf(edges, p=p, iters=iters, num_parts=num_parts)
    w = {t: 2_000_000 // t for t in range(1, iters + 1)}

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return HARMONIC_SCHEMA.empty_table()
        vid = tbl["vid"].to_numpy()
        t = tbl["t"].to_numpy()
        b = tbl["ball"].to_numpy()
        order = np.lexsort((t, vid))
        vid, t, b = vid[order], t[order], b[order]
        new = np.ones(len(vid), bool)
        new[1:] = vid[1:] != vid[:-1]
        starts = np.flatnonzero(new)
        # rows per vid are t = 0..iters in order after the lexsort
        diff = np.zeros(len(b), np.int64)
        diff[1:] = b[1:] - b[:-1]
        diff[starts] = 0  # t = 0 row carries no increment
        wt = np.array([0] + [w[i] for i in range(1, iters + 1)], np.int64)
        h = np.add.reduceat(diff * wt[t], starts)
        return pa.table(
            {"vid": pa.array(vid[starts]), "harmonic_2e6": pa.array(h)},
            schema=HARMONIC_SCHEMA,
        )

    return partitioned_map(
        balls, ["vid"], fold,
        num_partitions=num_parts, empty_schema=HARMONIC_SCHEMA,
    )


EFFDIAM_SCHEMA = pa.schema(
    [("eff_diameter_e6", pa.int64()), ("n_total", pa.int64())]
)


def effective_diameter(
    edges, *, p: int = 4, iters: int = 4, q_num: int = 9, q_den: int = 10,
    num_parts: int = 16,
) -> Dataset:
    """Effective diameter at quantile q = q_num/q_den from the HyperANF
    neighborhood function (Boldi-Rosa-Vigna 2011 / Palmer et al. ANF):
    the interpolated smallest t with N(t) ≥ q·N(iters), where
    N(t) = Σ_v |ball(v, t)|.

    Exact-integer contract: the global N(t) fold is an int64 keyed sum
    of the (already integer) ball sizes — order-free; the crossing test
    is ``q_den·N(t) ≥ q_num·N(iters)`` (no float quantile); the linear
    interpolation is reported in micro-units via non-negative floor
    division, so the single output row replays bit-identically in SQL.
    The driver folds only iters+1 integers — never anything
    corpus-sized. ``iters`` should be ≥ the graph's effective diameter
    for the quantile to mean anything; the saturating N(t) makes an
    undersized ``iters`` visible (n_total stops growing)."""
    import ray.data as rd

    from graphx_ray.stages.derive import grouped_reduce

    if not 0 < q_num <= q_den:
        raise ValueError((q_num, q_den))
    balls = hyperanf(edges, p=p, iters=iters, num_parts=num_parts)
    nf = (
        grouped_reduce(
            balls.select_columns(["t", "ball"]), ["t"], sum_col="ball",
            num_partitions=min(num_parts, iters + 1),
            empty_schema=pa.schema([("t", pa.int64()), ("ball", pa.int64())]),
        )
        .to_pandas()
        .sort_values("t")
    )
    nt = [int(x) for x in nf["ball"]]
    if not nt:
        return rd.from_arrow(EFFDIAM_SCHEMA.empty_table())
    ntot = nt[-1]
    d_e6 = 0
    for t, n in enumerate(nt):
        if q_den * n >= q_num * ntot:
            if t > 0:
                prev = nt[t - 1]
                # crossing ⇒ prev < q·ntot ≤ n: both operands non-negative,
                # python // == SQL // (truncation == floor)
                d_e6 = t * 1_000_000 - 1_000_000 + (
                    (q_num * ntot - q_den * prev) * 1_000_000
                ) // (q_den * (n - prev))
            break
    return rd.from_arrow(
        pa.table(
            {"eff_diameter_e6": pa.array([d_e6], pa.int64()),
             "n_total": pa.array([ntot], pa.int64())},
            schema=EFFDIAM_SCHEMA,
        )
    )
