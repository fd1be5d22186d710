"""Power iteration clustering (Lin & Cohen, ICML 2010) — the last named
algorithm of the public GraphFrames API (``powerIterationClustering``)
without a counterpart here before round 5.

Pinned semantics (exact-integer, SQL-replayable — this engine's Appendix-A
style, deviating from GraphFrames' float implementation the same way
``svdpp_fixed`` / ``katz`` do):

- The graph is the UNDIRECTED weighted view (every directed edge
  contributes both directions with its weight, self-loops kept — the LPA
  influence graph).
- Embedding: x⁰(v) = scale_micro for every vertex; x'(v) =
  Σ_{u→v} (w(u,v)·x(u)) // d(u), where d(u) = Σ w(u,·) — the
  column-stochastic W·D⁻¹ push with a per-EDGE floor division (every term
  exact int64, order-free sums). Mass is conserved up to floor losses, so
  x(v) ≤ Σ_v x⁰(v) = n·scale_micro and int64 never overflows for
  n·scale_micro < 2⁶³. Vertices with no in-edges go to 0. Run ``iters``
  rounds (PIC wants EARLY, not converged, iterates — the cluster signal
  lives in the transient).
- Clustering: deterministic integer 1-D Lloyd over the final x — initial
  centroids are RANGE-UNIFORM, c_j = xmin + ((xmax − xmin)·j) // (k−1)
  (c_0 = xmin for k = 1): min/max are exact order-free aggregates, and
  range seeding cannot collide the way smallest-vid seeding does when a
  symmetric region shares one value. Each of ``kmeans_iters`` rounds
  assigns every vertex to argmin |x − c_j| (ties → lowest j) and
  recomputes c_j = Σx // count (floor on non-negative; empty clusters
  keep their centroid); output is the assignment under the final
  centroids. Every step is exact integer arithmetic, so a DuckDB oracle
  unrolls the whole pipeline bit-identically.

Scale shape: the power iteration is ``Graph.pregel`` (one ghost-sized
exchange per round, salted hubs ride the pregel hub broadcast); the
k-means sees only (k,) centroid vectors on the driver — per-batch partial
(cluster, count, sum) rows, folded like ``lloyd_centroids``. Returns
(vid, pic_micro, cluster) without materializing the vertex table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

OUT_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("pic_micro", pa.int64()), ("cluster", pa.int64())]
)


def _pic_embedding(graph, *, iters: int, scale_micro: int) -> Dataset:
    """(vid, value) after ``iters`` exact W·D⁻¹ pushes (see module doc)."""
    scale = int(scale_micro)

    def init(vids: np.ndarray) -> np.ndarray:
        return np.full(len(vids), scale, np.int64)

    def send(src_vals, w, outdeg_src):
        # per-edge floor division by the SENDER's weighted degree: every
        # term exact int64, so the reduceat pre-combine and the SQL
        # SUM((w*x)//d) agree regardless of order
        return (w.astype(np.int64) * src_vals) // outdeg_src.astype(np.int64)

    def vprog(old, msgs, got):
        return msgs  # x' = merged sums; no-in-edge vertices take 0

    return graph.pregel(
        init, send, vprog, merge="sum", halt="all", max_iter=int(iters),
        variant="undirected_weighted",
    )


def _int_kmeans_1d(vals: Dataset, *, k: int, iters: int) -> Dataset:
    """Deterministic integer Lloyd on a (vid, value) Dataset (module doc
    rules). Driver state: the (k,) centroid vector only."""
    import ray

    vals = vals.materialize()  # reused k-means rounds + final assignment

    xmin = int(vals.min("value"))
    xmax = int(vals.max("value"))
    k = int(k)
    if k <= 1:
        cent = np.array([xmin], np.int64)
    else:
        j = np.arange(k, dtype=np.int64)
        cent = xmin + ((xmax - xmin) * j) // (k - 1)
    kk = len(cent)

    for _ in range(int(iters)):
        cent_ref = ray.put(cent)

        def partials(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            x = b["value"].to_numpy()
            if not len(x):
                return pa.table(
                    {"j": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64()),
                     "s": pa.array([], pa.int64())}
                )
            a = np.abs(x[:, None] - c[None, :]).argmin(axis=1)  # ties → lowest j
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            # int64 accumulation (bincount's float64 weights would round
            # sums past 2^53 — the CLAUDE.md coercion class)
            s = np.zeros(len(c), np.int64)
            np.add.at(s, a, x.astype(np.int64))
            return pa.table(
                {"j": pa.array(np.arange(len(c), dtype=np.int64)),
                 "cnt": pa.array(cnt), "s": pa.array(s)}
            )

        pdf = vals.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # ≤ k rows per block
        cnt = np.zeros(kk, np.int64)
        s = np.zeros(kk, np.int64)
        np.add.at(cnt, pdf["j"].to_numpy(), pdf["cnt"].to_numpy())
        np.add.at(s, pdf["j"].to_numpy(), pdf["s"].to_numpy())
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = s[nz] // cnt[nz]  # non-negative ⇒ floor == truncation

    final_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        x = b["value"].to_numpy()
        a = (
            np.abs(x[:, None] - c[None, :]).argmin(axis=1)
            if len(x)
            else np.empty(0, np.int64)
        ).astype(np.int64)
        return pa.table(
            {"vid": b["vid"], "pic_micro": pa.array(x.astype(np.int64)),
             "cluster": pa.array(a)},
            schema=OUT_SCHEMA,
        )

    return vals.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def power_iteration_clustering(
    edges,
    *,
    k: int = 4,
    iters: int = 3,
    kmeans_iters: int = 2,
    scale_micro: int = 1_000_000,
    num_parts: int | None = None,
) -> Dataset:
    """GraphFrames ``powerIterationClustering`` surface over an edge
    table/Dataset — builds a transient :class:`Graph`; see the module
    docstring for the pinned exact-integer semantics. Returns a Dataset
    of (vid, pic_micro, cluster)."""
    from graphx_ray.pipelines.graph import Graph

    g = Graph(edges, num_parts=num_parts)
    try:
        emb = _pic_embedding(g, iters=iters, scale_micro=scale_micro)
        return _int_kmeans_1d(emb, k=k, iters=kmeans_iters)
    finally:
        g.close()
