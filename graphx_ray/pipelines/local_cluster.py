"""Local clustering by seeded-diffusion sweep cut — the
Andersen–Chung–Lang (FOCS 2006) / PageRank-Nibble SHAPE: diffuse mass
from a seed, order vertices by rank/degree, and return the conductance
of every prefix of that order; the minimum-conductance prefix is the
local cluster. The community-detection primitive that needs NO global
pass — at 100 TB the work is proportional to the seed's neighborhood,
not the graph.

Determinism/exactness contract (everything the oracle must replay):

- The diffusion is the PINNED truncated damped push: r₀ = B·[v=seed]
  (B = 15·SCALE//100) and per superstep

      r'(v) = Σ_{u→v} (85·w·r(u)) // (100·odw(u))

  with the floor at the SENDER (the textrank/katz device) — order-free
  int64 sums, bit-identical in SQL. This is the t-step α-damped walk
  mass from the seed WITHOUT per-round re-injection (the re-injected
  ACL fixpoint needs a seed-indicator inside vprog, which the generic
  hook deliberately does not expose); the sweep-cut machinery — the
  named part — is unchanged, and the truncated diffusion is itself the
  classic spectral-sweep input (Spielman–Teng walk distributions).
- The sweep order is (r/deg DESC, vid ASC) where r/deg is ONE
  correctly-rounded IEEE double division of two int64s — numpy and
  DuckDB produce the identical double (the priority_sample precedent),
  so the order is exact on both sides.
- All sweep statistics are integers: vol_k = Σ deg over the prefix,
  within_k = edges with both ends in the prefix, cut_k = vol_k −
  2·within_k, cond_micro = the half-up micro ratio against
  min(vol_k, 2m − vol_k) (−1 when that min is 0).

Scale shape: iters ghost-sized CSR exchanges for the PPR, one
block-local top-T fold + a T-row driver take (T = ``top_t``, the
explicit "local" budget — the landmark-table pattern), one streaming
pass over the canonical edges with the T-row position dict broadcast
(within counts), one degree reduce. The driver holds 3·T ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SWEEP_SCHEMA = pa.schema(
    [("k", pa.int64()), ("vid", pa.int64()), ("cut", pa.int64()),
     ("vol", pa.int64()), ("cond_micro", pa.int64())]
)

PPR_SCALE = 10**12


def ppr_sweep_cut(
    edges,
    seed: int,
    *,
    iters: int = 6,
    top_t: int = 64,
    num_partitions: int = 8,
) -> pa.Table:
    """(k, vid, cut, vol, cond_micro) for every prefix k = 1..T of the
    rank/degree sweep order of the ``iters``-step seeded diffusion over
    the canonical undirected simple graph; row k's vid is the k-th
    vertex added. The caller takes argmin(cond_micro) for the local
    cluster."""
    import ray

    from graphx_ray.pipelines.graph import Graph, _as_dataset
    from graphx_ray.stages.derive import canonical_edges, grouped_reduce
    from graphx_ray.stages.structural import _spill_edges

    can = _spill_edges(canonical_edges(_as_dataset(edges)))

    def sym(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        o = np.ones(batch.num_rows, np.int64)
        return pa.table(
            {"src": pa.array(np.concatenate([u, v])),
             "dst": pa.array(np.concatenate([v, u])),
             "w": pa.array(np.concatenate([o, o]))}
        )

    sedges = can.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
    base = (15 * PPR_SCALE) // 100
    sd = int(seed)

    def init(vids: np.ndarray) -> np.ndarray:
        return np.where(vids == sd, base, 0).astype(np.int64)

    g = Graph(sedges, num_parts=num_partitions)
    try:
        ranks = g.pregel(
            init,
            lambda src_vals, w, od: (85 * w.astype(np.int64) * src_vals)
            // (100 * od.astype(np.int64)),
            lambda old, msgs, got: msgs,
            merge="sum", halt="all", max_iter=int(iters), variant="directed",
        )
        ranks = _spill_edges(ranks)
    finally:
        g.close()

    def to_r(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": batch["vid"],
             "r": pa.array(batch["value"].to_numpy().astype(np.int64))}
        )

    rr = ranks.map_batches(to_r, batch_format="pyarrow", zero_copy_batch=True)

    # degrees of the canonical simple graph
    def degp(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        o = np.ones(batch.num_rows, np.int64)
        return pa.table(
            {"vid": pa.array(np.concatenate([u, v])),
             "d": pa.array(np.concatenate([o, o]))}
        )

    degs = grouped_reduce(
        can.map_batches(degp, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], sum_col="d", num_partitions=num_partitions,
        empty_schema=pa.schema([("vid", pa.int64()), ("d", pa.int64())]),
    )
    m2 = int(degs.sum("d") or 0)

    # top-T support by (r DESC, vid ASC): block partials + tiny driver fold
    T = int(top_t)

    def blocktop(batch: pa.Table) -> pa.Table:
        d = batch.to_pandas()
        d = d[d["r"] > 0].sort_values(["r", "vid"], ascending=[False, True])
        return pa.Table.from_pandas(d.head(T), preserve_index=False)

    top = (
        rr.map_batches(blocktop, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["r", "vid"], ascending=[False, True])
        .head(T)
    )
    if top.empty:
        return SWEEP_SCHEMA.empty_table()
    tset = set(int(x) for x in top["vid"])
    tref = ray.put(tset)

    def degfilter(batch: pa.Table) -> pa.Table:
        ts = ray.get(tref)
        m = np.array([int(x) in ts for x in batch["vid"].to_numpy()], bool)
        return batch.filter(pa.array(m))

    tdeg = degs.map_batches(
        degfilter, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    dmap = dict(zip(tdeg["vid"].astype(int), tdeg["d"].astype(int)))

    # the sweep order: ONE IEEE double division per vertex (exact on
    # both sides), ties by vid
    top = top.reset_index(drop=True)
    key = top["r"].to_numpy(np.int64).astype(np.float64) / np.array(
        [dmap[int(v)] for v in top["vid"]], np.int64
    ).astype(np.float64)
    order = np.lexsort((top["vid"].to_numpy(), -key))
    vids = top["vid"].to_numpy()[order]
    by_vid = np.argsort(vids, kind="stable")
    lut_ref = ray.put((vids[by_vid].astype(np.int64), by_vid.astype(np.int64)))

    # within counts: edges with both ends in the prefix, keyed by the
    # LATER endpoint's sweep position — vectorized searchsorted lookup
    # against the broadcast (sorted_vid, position) LUT
    def within(batch: pa.Table) -> pa.Table:
        sv, pv = ray.get(lut_ref)

        def lookup(x):
            i = np.searchsorted(sv, x)
            i = np.minimum(i, len(sv) - 1)
            hit = sv[i] == x
            return np.where(hit, pv[i], -1)

        pu = lookup(batch["u"].to_numpy())
        pw = lookup(batch["v"].to_numpy())
        out = np.maximum(pu, pw)
        keep = (pu >= 0) & (pw >= 0)
        if not keep.any():
            return pa.table(
                {"m": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        uq, cnt = np.unique(out[keep], return_counts=True)
        return pa.table(
            {"m": pa.array(uq), "n": pa.array(cnt.astype(np.int64))}
        )

    wrows = (
        can.map_batches(within, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("m")["n"].sum()
    )
    win_at = np.zeros(len(vids), np.int64)
    for m, n in wrows.items():
        win_at[int(m)] = int(n)

    dvec = np.array([dmap[int(v)] for v in vids], np.int64)
    vol = np.cumsum(dvec)
    win = np.cumsum(win_at)
    cut = vol - 2 * win
    mn = np.minimum(vol, m2 - vol)
    cond = np.where(
        mn > 0, (2_000_000 * cut + np.maximum(mn, 1)) // (2 * np.maximum(mn, 1)),
        -1,
    )
    return pa.table(
        {"k": pa.array(np.arange(1, len(vids) + 1, dtype=np.int64)),
         "vid": pa.array(vids.astype(np.int64)),
         "cut": pa.array(cut.astype(np.int64)),
         "vol": pa.array(vol.astype(np.int64)),
         "cond_micro": pa.array(cond.astype(np.int64))},
        schema=SWEEP_SCHEMA,
    )
