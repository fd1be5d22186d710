"""Katz centrality, fixed-point integer iteration.

Katz (1953) / the GraphX-era centrality family: x = β·1 + α·Aᵀx iterated
from x⁰ = β·1 — each vertex's score sums its in-neighbors' scores damped
by α per hop. This engine pins the arithmetic the same way
``svdpp_fixed`` does: scores live as int64 MICRO-units, α = 1/inv_alpha
with an integer inv_alpha, and the damping is a floor division on
non-negative operands (where DuckDB's truncating ``//`` equals floor —
the repo's pinned integer-division recipe), so every iterate is exact
integer state a SQL oracle unrolls bit-identically. Convergence needs
α < 1/λ_max as usual; overflow bound: Σ_in w·x per vertex must stay
below 2⁶³ (weighted in-degree · max score — checked by the caller's
choice of inv_alpha/iters).

Scale shape: one ``bucket_join`` (scores ride the edges) + one keyed
``grouped_reduce`` (message sums) + one left ``bucket_join`` back onto
the vertex universe per iteration — 3 storage shuffles, no driver state
beyond the loop counter. **The scale path is ``Graph.katz``** (round-5):
the same arithmetic through the CSR actor engine's ``pregel`` hook, one
ghost-sized exchange per iteration, bit-identical to this composition
(tested). This derive variant remains the pure-Dataset-API expression
whose lineage Ray can replay without actor state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

X_SCHEMA = pa.schema([("vid", pa.int64()), ("katz_micro", pa.int64())])


def katz_fixed(
    edges,
    *,
    inv_alpha: int = 8,
    iters: int = 4,
    beta_micro: int = 1_000_000,
    num_parts: int = 16,
) -> Dataset:
    """(vid, katz_micro) after ``iters`` exact fixed-point rounds over the
    DIRECTED weighted edge table (src, dst, w int)."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import grouped_reduce
    from graphx_ray.stages.motif import bucket_join

    ds = _as_dataset(edges)

    def endpoints(batch: pa.Table) -> pa.Table:
        vid = np.unique(
            np.concatenate([batch["src"].to_numpy(), batch["dst"].to_numpy()])
        )
        return pa.table({"vid": pa.array(vid, type=pa.int64())})

    verts = grouped_reduce(
        ds.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], num_partitions=num_parts,
        empty_schema=pa.schema([("vid", pa.int64())]),
    )

    def init(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": batch["vid"],
             "katz_micro": pa.array(
                 np.full(batch.num_rows, beta_micro, np.int64))},
            schema=X_SCHEMA,
        )

    x = verts.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
    for _ in range(iters):
        moved = bucket_join(
            ds, x, on="src", right_on="vid", num_partitions=num_parts
        )

        def contrib(batch: pa.Table) -> pa.Table:
            m = batch["w"].to_numpy().astype(np.int64) * batch[
                "katz_micro"
            ].to_numpy()
            return pa.table({"dst": batch["dst"], "m": pa.array(m)})

        sums = grouped_reduce(
            moved.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
            ["dst"], sum_col="m", num_partitions=num_parts,
            empty_schema=pa.schema([("dst", pa.int64()), ("m", pa.int64())]),
        )
        joined = bucket_join(
            verts, sums, on="vid", right_on="dst", how="left",
            num_partitions=num_parts,
        )

        def step(batch: pa.Table) -> pa.Table:
            # fill nulls in Arrow: pandas fillna would coerce the nullable
            # int64 through float64, silently rounding sums > 2^53 and
            # breaking the docstring's 2^63 exact-integer bound
            import pyarrow.compute as pc

            m = pc.fill_null(batch["m"], 0).combine_chunks().to_numpy()
            # non-negative operands: numpy // here equals DuckDB's
            # truncating // (the pinned recipe)
            nx = beta_micro + m // inv_alpha
            return pa.table(
                {"vid": batch["vid"], "katz_micro": pa.array(nx)},
                schema=X_SCHEMA,
            )

        x = joined.map_batches(step, batch_format="pyarrow", zero_copy_batch=True)
    return x
