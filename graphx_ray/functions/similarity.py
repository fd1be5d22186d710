"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k of every row against a broadcast
  query matrix — one numpy matmul per batch (``ray.put`` the queries ONCE,
  zero-copy reads in every task).
- ``ivf_topk``: the scale path — k-means-style coarse quantizer (trained on
  a driver-side sample), vectors bucketed by nearest centroid with one hash
  shuffle, queries probe only ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graphx_ray.context import ensure_hash_shuffle


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, d) float64 from a list<float> / tensor-extension column, no row loop."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float64)
    # float64 throughout: scores must be comparable to a SQL double oracle
    if hasattr(arr, "flatten"):  # ListArray / FixedSizeListArray
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1)
    # Ray's ArrowTensorArray (from_pandas of object-array vectors)
    m = arr.to_numpy(zero_copy_only=False)
    if m.dtype == object:
        m = np.stack(m)
    return np.ascontiguousarray(m, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


class TopKScorer:
    """Actor-pool stage: batch × broadcast-queries cosine, per-query running
    top-k merged across batches by a final groupby-free reduction."""

    def __init__(self, q_ref, qid_ref, k: int, id_col: str, vec_col: str):
        self.q = _normalize(ray.get(q_ref).astype(np.float64))
        self.qids = ray.get(qid_ref)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        m = _normalize(_matrix(batch, self.vec_col))
        if len(ids) == 0 or m.size == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "nbr_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sims = m @ self.q.T  # (n_batch, n_queries)
        k = min(self.k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # per-query candidates
        nq = sims.shape[1]
        # keep ALL ties at the k-th score: batch-local pruning by sim alone
        # could otherwise drop the candidate the global (sim DESC, nbr_id ASC)
        # rule would keep
        kth = sims[top, np.arange(nq)[None, :]].min(axis=0)
        rows, qcols = np.nonzero(sims >= kth[None, :])
        qcol = self.qids[qcols]
        ncol = ids[rows]
        scol = sims[rows, qcols]
        return pa.table(
            {
                "query_id": pa.array(qcol, type=pa.int64()),
                "nbr_id": pa.array(ncol, type=pa.int64()),
                "sim": pa.array(scol.astype(np.float64)),
            }
        )


def brute_force_topk(
    vectors: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """Exact cosine top-k per query. Per-batch partial top-k (combiner),
    final exact top-k on the (tiny) union of partials."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    qid_ref = ray.put(np.asarray(query_ids, dtype=np.int64))
    partials = vectors.map_batches(
        TopKScorer,
        fn_constructor_args=(q_ref, qid_ref, k, id_col, vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=4096,
        num_cpus=0.5,  # fractional: a full-CPU pool can starve the upstream read tasks (deadlock on small nodes)
    )
    df = partials.to_pandas()
    # deterministic final top-k: (-sim, nbr_id) per query
    df = df.sort_values(["query_id", "sim", "nbr_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["simrank"] = out.groupby("query_id").cumcount().astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def train_centroids(
    vectors: Dataset, *, n_centroids: int = 16, sample: int = 4096,
    vec_col: str = "embedding", iters: int = 10, seed: int = 11,
) -> np.ndarray:
    """Driver-side mini k-means on a bounded sample (Lloyd, cosine space)."""
    frac_tbl = vectors.limit(sample).to_pandas()
    m = _normalize(
        np.stack(frac_tbl[vec_col].map(np.asarray).to_list()).astype(np.float64)
    )
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = m[mask].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    vectors: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """IVF approximate top-k: bucket by nearest centroid (one shuffle),
    search only the ``nprobe`` closest buckets per query."""
    ensure_hash_shuffle(vectors)
    cent = train_centroids(vectors, n_centroids=n_centroids, vec_col=vec_col)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_ref = ray.put(probe)
    q_ref = ray.put(q)
    qid_ref = ray.put(np.asarray(query_ids, dtype=np.int64))

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_matrix(batch, vec_col))
        if m.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: batch[vec_col],
                             "bucket": pa.array([], pa.int64())})
        b = (m @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({id_col: batch[id_col], vec_col: batch[vec_col], "bucket": pa.array(b)})

    def search_bucket(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        qids = ray.get(qid_ref)
        pr = ray.get(probe_ref)
        buckets = batch["bucket"].to_numpy()
        ids = batch[id_col].to_numpy()
        m = _normalize(_matrix(batch, vec_col))
        outs = []
        for b in np.unique(buckets):
            qmask = (pr == b).any(axis=1)
            if not qmask.any():
                continue
            vmask = buckets == b
            sims = m[vmask] @ qm[qmask].T
            kk = min(k, int(vmask.sum()))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            nq = sims.shape[1]
            # ties at the k-th score kept (same rationale as TopKScorer)
            kth = sims[top, np.arange(nq)[None, :]].min(axis=0)
            rows, qcols = np.nonzero(sims >= kth[None, :])
            outs.append(
                pa.table(
                    {
                        "query_id": pa.array(qids[qmask][qcols], type=pa.int64()),
                        "nbr_id": pa.array(ids[vmask][rows], type=pa.int64()),
                        "sim": pa.array(sims[rows, qcols].astype(np.float64)),
                    }
                )
            )
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "nbr_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    parts = (
        vectors.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(max(2, concurrency), keys=["bucket"])
        .map_batches(search_bucket, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
    )
    df = parts.to_pandas()
    df = df.sort_values(["query_id", "sim", "nbr_id"], ascending=[True, False, True])
    out = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["simrank"] = out.groupby("query_id").cumcount().astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)
