"""Triangle counting (SURVEY.md G5, contract A.4) — non-iterative path.

Algorithm: degree-ordered DAG orientation + wedge check (the standard
"compact-forward" scheme, equivalent to GraphX's per-edge set-intersection
with halving):

1. canonicalize → simple undirected graph (u<v, no self-loops, deduped);
2. orient every edge a→b by (deg(a), a) < (deg(b), b) — bounds per-vertex
   out-degree by O(√m), so Σ outdeg² (the wedge count) is O(m^1.5) worst
   case and near-linear on power-law graphs;
3. partition oriented edges by hash(a); per block, enumerate wedges
   (b, c) over each a's out-neighborhood (vectorized repeat/arange, no
   Python loop over vertices) and probe the oriented edge set for (b, c)
   with a C hash join (pandas merge over broadcast numpy arrays);
4. every confirmed (a, b, c) adds 1 to all three vertices; block-local
   bincounts then one groupby-sum; vertices without triangles get 0.

Scale note: the degree vector and the oriented edge list are broadcast via
``ray.put`` (16 B/vertex + 16 B/edge, zero-copy numpy reads in every
task) — right-sized for single-node and small-cluster runs; the documented
scale path for graphs whose edge list exceeds worker memory is per-bucket
2D partitioning of the probe join (SURVEY.md G5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from graphx_ray.context import ensure_hash_shuffle
from graphx_ray.stages.derive import canonical_edges


def _degree_vector(canon: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Sorted vids + canonical degree, collected once for the broadcast."""

    def partial(batch: pa.Table) -> pa.Table:
        vid = np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        uniq, cnt = np.unique(vid, return_counts=True)
        return pa.table(
            {"vid": pa.array(uniq, type=pa.int64()), "d": pa.array(cnt, type=pa.int64())}
        )

    agg = (
        canon.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
    )
    df = agg.to_pandas()
    if len(df) == 0 or "vid" not in df.columns:  # empty groupby loses schema
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vids = df["vid"].to_numpy(dtype=np.int64)
    order = np.argsort(vids)
    return vids[order], df["d"].to_numpy(dtype=np.int64)[order]


def triangle_count(
    edges, vertices=None, *, num_parts: int = 16
):
    """Per-vertex triangle counts as a pyarrow Table (vid, count)."""
    from graphx_ray.pipelines.graph import _as_dataset

    edges = _as_dataset(edges)
    ensure_hash_shuffle(edges)
    canon = canonical_edges(edges)

    # One distributed execution (canonicalize + dedup), then the tiny prep
    # (degree vector + DAG orientation) runs driver-side in numpy: the edge
    # list must fit the driver anyway for the probe broadcast, so this adds
    # no scale constraint and removes three shuffle executions.
    cdf = canon.to_pandas()
    if len(cdf) == 0 or "u" not in cdf.columns:
        tri = pa.table(
            {"vid": pa.array([], type=pa.int64()), "count": pa.array([], type=pa.int64())}
        )
        return _with_zeros(tri, vertices)
    u = cdf["u"].to_numpy(dtype=np.int64)
    v = cdf["v"].to_numpy(dtype=np.int64)
    deg_vids, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    deg_vals = np.bincount(inv).astype(np.int64)
    du = deg_vals[inv[: len(u)]]
    dw = deg_vals[inv[len(u) :]]
    u_first = (du < dw) | ((du == dw) & (u < v))
    ea = np.where(u_first, u, v)
    eb = np.where(u_first, v, u)

    # compact ids → packed edge keys for an O(log m) vectorized probe
    # (n_vertices < ~3e9 so idx_a·n + idx_b fits int64; beyond that envelope
    # fall back to a hash join — SURVEY.md G5 scale note)
    nv = len(deg_vids)
    pack = np.searchsorted(deg_vids, ea) * nv + np.searchsorted(deg_vids, eb)
    pack.sort()
    dv_ref = ray.put(deg_vids)
    dd_ref = ray.put(deg_vals)
    pk_ref = ray.put(pack)
    oriented = rd.from_arrow(
        pa.table({"a": pa.array(ea, type=pa.int64()), "b": pa.array(eb, type=pa.int64())})
    )

    def wedges(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        if len(a) == 0:
            return pa.table(
                {"vid": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
            )
        vids = ray.get(dv_ref)
        dvals = ray.get(dd_ref)
        db = dvals[np.searchsorted(vids, b)]
        # group by a; within a, out-neighbors ordered by orientation key
        order = np.lexsort((b, db, a))
        a, b = a[order], b[order]
        new = np.empty(len(a), bool)
        new[0] = True
        np.not_equal(a[1:], a[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(a)))
        # wedge pairs (i < j) within each run — same window-expansion trick
        # as the zone join: element at abs position p pairs with everything
        # up to its run end
        run_end = np.repeat(starts + lens, lens)
        idx = np.arange(len(a))
        per = run_end - idx - 1
        total = int(per.sum())
        if total == 0:
            return pa.table(
                {"vid": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
            )
        # chunked expansion: a hot block can hold 10⁸⁺ wedges — never
        # materialize them all at once (memory-aware, SURVEY.md §7.4.5)
        packs = ray.get(pk_ref)
        nv_l = len(vids)
        cum = np.cumsum(per)
        chunk = 20_000_000
        cuts = np.searchsorted(cum, np.arange(chunk, total + chunk, chunk))
        cuts = np.unique(np.append(cuts, len(per) - 1))
        b_idx = np.searchsorted(vids, b)  # compact ids once per block
        acc_ids: list[np.ndarray] = []
        acc_cnt: list[np.ndarray] = []
        s = 0
        for cut in cuts:
            e = int(cut) + 1
            seg = slice(s, e)
            per_s = per[seg]
            tot_s = int(per_s.sum())
            if tot_s:
                ii = np.repeat(np.arange(s, e), per_s)
                offs = (np.cumsum(per_s) - per_s)
                jj = ii + 1 + (np.arange(tot_s) - offs[ii - s])
                qk = b_idx[ii] * nv_l + b_idx[jj]
                pos = np.searchsorted(packs, qk)
                hit = (pos < len(packs)) & (packs[np.minimum(pos, len(packs) - 1)] == qk)
                ids = np.concatenate([a[ii][hit], b[ii][hit], b[jj][hit]])
                if len(ids):
                    u, c = np.unique(ids, return_counts=True)
                    acc_ids.append(u)
                    acc_cnt.append(c.astype(np.int64))
            s = e
        if not acc_ids:
            return pa.table(
                {"vid": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
            )
        allu = np.concatenate(acc_ids)
        allc = np.concatenate(acc_cnt)
        uniq, inv = np.unique(allu, return_inverse=True)
        c = np.bincount(inv, weights=allc).astype(np.int64)
        return pa.table(
            {"vid": pa.array(uniq, type=pa.int64()), "cnt": pa.array(c)}
        )

    parts = oriented.repartition(num_parts, keys=["a"]).map_batches(
        wedges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    tdf = parts.groupby("vid").aggregate(Sum("cnt", alias_name="count")).to_pandas()
    if len(tdf) == 0 or "vid" not in tdf.columns:
        tdf = pd.DataFrame({"vid": np.empty(0, np.int64), "count": np.empty(0, np.int64)})
    tri = pa.table(
        {
            "vid": pa.array(tdf["vid"].to_numpy(dtype=np.int64)),
            "count": pa.array(tdf["count"].to_numpy(dtype=np.int64)),
        }
    )
    return _with_zeros(tri, vertices, extra_vids=deg_vids)


def _with_zeros(tri: pa.Table, vertices, extra_vids=None) -> pa.Table:
    """GraphFrames returns a count for EVERY vertex (0 included)."""
    from graphx_ray.pipelines.graph import _as_dataset

    have = tri["vid"].to_numpy()
    universe = []
    if vertices is not None:
        universe.append(_as_dataset(vertices).select_columns(["vid"]).to_pandas()["vid"].to_numpy())
    if extra_vids is not None:
        universe.append(extra_vids)
    if universe:
        allv = np.unique(np.concatenate(universe + [have]))
    else:
        allv = np.unique(have)
    cnt = np.zeros(len(allv), np.int64)
    idx = np.searchsorted(allv, have)
    cnt[idx] = tri["count"].to_numpy()
    return pa.table(
        {"vid": pa.array(allv, type=pa.int64()), "count": pa.array(cnt, type=pa.int64())}
    )
