"""Triangle counting (SURVEY.md G5, contract A.4) — non-iterative path.

Algorithm: degree-ordered DAG orientation + wedge check (the standard
"compact-forward" scheme, equivalent to GraphX's per-edge set-intersection
with halving):

1. canonicalize → simple undirected graph (u<v, no self-loops, deduped);
2. orient every edge a→b by (deg(a), a) < (deg(b), b) — bounds per-vertex
   out-degree by O(√m), so Σ outdeg² (the wedge count) is O(m^1.5) worst
   case and near-linear on power-law graphs;
3. per source-partition, enumerate wedges (b, c) over each a's
   out-neighborhood (vectorized repeat/arange, chunked — a hot block can
   hold 10⁸⁺ wedges) and probe the oriented edge set for (b, c);
4. every confirmed (a, b, c) adds 1 to all three vertices; task-local
   bincounts then one groupby-sum; vertices without triangles get 0.

Distribution discipline (nothing graph-sized touches the driver):

- degrees are computed distributed and ONLY the (vid, degree) vector —
  O(V), degrees ≪ edges — is collected and broadcast via ``ray.put``;
- orientation runs inside ``map_batches`` against that broadcast;
- oriented edges spill ONCE, hive-partitioned by ``pbucket = idx(a) % B``
  — a pure function of the source vertex, so the same partitioning serves
  the probe index build (one Ray task per bucket sorts its packed keys
  into the object store; the driver holds only ObjectRefs) AND wedge
  enumeration (a vertex's whole out-neighborhood is co-resident in its
  bucket regardless of Ray block splitting);
- wedge work is sliced by wedge COUNT (cheap pre-pass), so dense graphs
  fan out to hundreds of even tasks instead of one straggler per bucket.

Packed keys: compact index pairs ``idx_b · nv + idx_c`` fit int64 while
nv < 3·10⁹; beyond that envelope switch the probe to a (b, c) two-column
merge join per bucket (SURVEY.md G5 scale note).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from graphx_ray.context import ensure_hash_shuffle, register_spill
from graphx_ray.stages.derive import canonical_edges

_EMPTY_TRI = pa.table(
    {"vid": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
)

WEDGE_CHUNK = 20_000_000
# wedge-index slice per task: dense graphs (10¹⁰⁺ wedges) get hundreds of
# even tasks instead of one straggler per hash partition
TASK_WEDGES = 100_000_000


def _degree_vector(canon: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Sorted vids + canonical degree, collected once for the broadcast."""

    def partial(batch: pa.Table) -> pa.Table:
        vid = np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        uniq, cnt = np.unique(vid, return_counts=True)
        return pa.table(
            {"vid": pa.array(uniq, type=pa.int64()), "d": pa.array(cnt, type=pa.int64())}
        )

    from graphx_ray.stages.derive import grouped_reduce

    # storage-backed reduce, NOT Ray's in-memory hash-aggregate: the
    # aggregator-actor pool costs ~10 s of fixed setup per use regardless
    # of input size (BASELINE.md round-2 note) — two uses in this module
    # used to dominate the whole query's wall time
    agg = grouped_reduce(
        canon.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"],
        sum_col="d",
        num_partitions=8,
    )
    df = agg.to_pandas()
    if len(df) == 0 or "vid" not in df.columns:  # empty groupby loses schema
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vids = df["vid"].to_numpy(dtype=np.int64)
    order = np.argsort(vids)
    return vids[order], df["d"].to_numpy(dtype=np.int64)[order]


@ray.remote
def _build_bucket(bucket_dir: str) -> np.ndarray:
    """Sorted packed (idx_b·nv + idx_c) keys of one probe bucket — returned
    into the object store; the driver keeps only the ObjectRef."""
    if not os.path.isdir(bucket_dir):
        return np.empty(0, np.int64)
    t = pq.read_table(bucket_dir, columns=["pack"])
    pk = t["pack"].to_numpy().copy()
    pk.sort()
    return pk


def triangle_count(edges, vertices=None, *, num_parts: int = 16):
    """Per-vertex triangle counts as a pyarrow Table (vid, count)."""
    from graphx_ray.pipelines.graph import _as_dataset

    edges = _as_dataset(edges)
    ensure_hash_shuffle(edges)
    canon = canonical_edges(edges)

    deg_vids, deg_vals = _degree_vector(canon)
    nv = len(deg_vids)
    if nv == 0:
        tri = pa.table(
            {"vid": pa.array([], type=pa.int64()), "count": pa.array([], type=pa.int64())}
        )
        return _with_zeros(tri, vertices)
    if nv >= 3_000_000_000:
        raise NotImplementedError(
            "packed int64 probe keys require nv < 3e9; use the two-column "
            "merge-join probe variant (SURVEY.md G5)"
        )
    B = max(2, num_parts)
    dv_ref = ray.put(deg_vids)
    dd_ref = ray.put(deg_vals)

    # orientation + ONE spill: pbucket = idx(a) % B is a pure function of
    # the source vertex, so the same hive partitioning serves BOTH the probe
    # index build (pack column of pbucket=i) AND wedge enumeration (all of
    # a's out-edges are co-resident in a's bucket) — one pass over canon,
    # one write, no duplicate execution of the canonical dedup.
    spill = register_spill(tempfile.mkdtemp(prefix="graphx_tri_", dir="/tmp"))

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        vids = ray.get(dv_ref)
        dvals = ray.get(dd_ref)
        du = dvals[np.searchsorted(vids, u)]
        dw = dvals[np.searchsorted(vids, v)]
        u_first = (du < dw) | ((du == dw) & (u < v))
        ea = np.where(u_first, u, v)
        eb = np.where(u_first, v, u)
        ia = np.searchsorted(vids, ea)
        ib = np.searchsorted(vids, eb)
        return pa.table(
            {
                "a": pa.array(ea, type=pa.int64()),
                "b": pa.array(eb, type=pa.int64()),
                "pack": pa.array(ia * nv + ib, type=pa.int64()),
                "pbucket": pa.array((ia % B).astype(np.int32), type=pa.int32()),
            }
        )

    canon.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        spill, partition_cols=["pbucket"]
    )

    bucket_refs = [
        _build_bucket.remote(os.path.join(spill, f"pbucket={i}"))
        for i in range(B)
    ]

    def _load_sorted(d: str):
        """Partition edges grouped by a (orientation-ordered within a) +
        the per-position wedge counts."""
        t = pq.read_table(d, columns=["a", "b"])
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        if len(a) == 0:
            return None
        vids = ray.get(dv_ref)
        dvals = ray.get(dd_ref)
        b_idx = np.searchsorted(vids, b)
        db = dvals[b_idx]
        order = np.lexsort((b, db, a))
        a, b, b_idx = a[order], b[order], b_idx[order]
        new = np.empty(len(a), bool)
        new[0] = True
        np.not_equal(a[1:], a[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(a)))
        run_end = np.repeat(starts + lens, lens)
        per = run_end - np.arange(len(a)) - 1
        return a, b, b_idx, per

    @ray.remote
    def _wedge_total(d: str) -> int:
        """Cheap pre-pass: Σ c·(c−1)/2 over this partition's source runs —
        used to slice the wedge work into even tasks."""
        if not os.path.isdir(d):
            return 0
        c = np.unique(pq.read_table(d, columns=["a"])["a"].to_numpy(), return_counts=True)[1]
        return int((c * (c - 1) // 2).sum())

    def wedge_task(batch: pa.Table) -> pa.Table:
        """One wedge-index slice [lo, hi) of one partition (element
        granularity: a position belongs to the task owning its first wedge).
        Positions are grouped by probe bucket — every wedge of position p
        probes bucket b_idx[p] % B, so grouping once replaces the former
        per-wedge argsort — and each bucket's sorted pack array is fetched
        zero-copy ONCE per task."""
        d = batch["dir"][0].as_py()
        lo = int(batch["lo"][0].as_py())
        hi = int(batch["hi"][0].as_py())
        if not os.path.isdir(d):
            return _EMPTY_TRI
        loaded = _load_sorted(d)
        if loaded is None:
            return _EMPTY_TRI
        a, b, b_idx, per = loaded
        cum = np.cumsum(per)
        wstart = cum - per
        sel_all = np.flatnonzero((wstart >= lo) & (wstart < hi) & (per > 0))
        if len(sel_all) == 0:
            return _EMPTY_TRI
        packs_all = ray.get(bucket_refs)  # zero-copy views, fetched once
        pb = (b_idx[sel_all] % B).astype(np.int64)
        acc_ids: list[np.ndarray] = []
        acc_cnt: list[np.ndarray] = []
        for bid in range(B):
            packs = packs_all[bid]
            sel = sel_all[pb == bid]
            if len(sel) == 0 or len(packs) == 0:
                continue
            per_s = per[sel]
            cums = np.cumsum(per_s)
            cuts = np.searchsorted(cums, np.arange(WEDGE_CHUNK, int(cums[-1]) + WEDGE_CHUNK, WEDGE_CHUNK))
            cuts = np.unique(np.append(cuts, len(sel) - 1))
            s = 0
            for cut in cuts:
                e = int(cut) + 1
                pos = sel[s:e]
                pc = per_s[s:e]
                tot = int(pc.sum())
                if tot:
                    ii = np.repeat(pos, pc)
                    offs = np.cumsum(pc) - pc
                    jj = ii + 1 + (np.arange(tot) - np.repeat(offs, pc))
                    qk = b_idx[ii] * nv + b_idx[jj]
                    p = np.searchsorted(packs, qk)
                    hit = (p < len(packs)) & (packs[np.minimum(p, len(packs) - 1)] == qk)
                    ids = np.concatenate([a[ii][hit], b[ii][hit], b[jj][hit]])
                    if len(ids):
                        u, c = np.unique(ids, return_counts=True)
                        acc_ids.append(u)
                        acc_cnt.append(c.astype(np.int64))
                s = e
        if not acc_ids:
            return _EMPTY_TRI
        allu = np.concatenate(acc_ids)
        allc = np.concatenate(acc_cnt)
        uniq, inv = np.unique(allu, return_inverse=True)
        c = np.bincount(inv, weights=allc).astype(np.int64)
        return pa.table({"vid": pa.array(uniq, type=pa.int64()), "cnt": pa.array(c)})

    dirs = [os.path.join(spill, f"pbucket={p}") for p in range(B)]
    totals = ray.get([_wedge_total.remote(d) for d in dirs])
    items = []
    for d, tot in zip(dirs, totals):
        for lo in range(0, max(tot, 1), TASK_WEDGES):
            items.append({"dir": d, "lo": lo, "hi": lo + TASK_WEDGES})
    parts = rd.from_items(items).map_batches(
        wedge_task, batch_size=1, batch_format="pyarrow"
    )
    from graphx_ray.stages.derive import grouped_reduce

    tdf = (
        grouped_reduce(parts, ["vid"], sum_col="cnt", num_partitions=8)
        .to_pandas()
        .rename(columns={"cnt": "count"})
    )
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
