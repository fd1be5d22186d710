"""Deterministic DBSCAN over an embedding column (cosine ε-graph).

DBSCAN (Ester et al., KDD'96) re-expressed as a composition of the
engine's scale primitives, with the classically order-dependent parts
pinned to deterministic rules so the result is parallelism-invariant
and SQL-replayable:

1. ε-neighbor pairs: ``cosine_near_dup_pairs`` (exact 2D-bucketed
   all-pairs; sim ≥ ``threshold`` ⇔ cosine distance ≤ 1−threshold).
   At 100 TB swap in ``cosine_near_dup_lsh`` for the candidate pass —
   the composition below is agnostic to where the pairs came from.
2. degrees by one keyed reduce; core ⇔ |N(v)| + 1 ≥ min_pts (the
   ε-ball includes the point itself).
3. core-core edges (two semi-joins) → distributed hash-min connected
   components; cluster id = MIN core vid of the component (isolated
   cores keep their own id via the left join).
4. border points (non-core with ≥1 core neighbor) attach to the MIN
   cluster label among their core neighbors — the pinned version of
   DBSCAN's "first claimer wins" order dependence.
5. everything else is noise: cluster = −1 (with ``min_pts ≤ 1`` every
   point is trivially a core singleton instead).

Nothing corpus-sized touches the driver: pairs/degree/label tables move
through ``grouped_reduce``/``semi_join``/``bucket_join`` storage
shuffles, and the ε-graph CC reuses the CSR engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from graphx_ray.context import ensure_hash_shuffle
from graphx_ray.functions.similarity import cosine_near_dup_pairs


def dbscan_cosine(
    vectors: Dataset,
    *,
    threshold: float = 0.3,
    min_pts: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 8,
    num_partitions: int = 8,
) -> Dataset:
    """(id_col, cluster, is_core) for every input row; cluster = −1 for
    noise, else the MIN core id of the density-connected component."""
    from graphx_ray.pipelines.graph import Graph
    from graphx_ray.stages.derive import grouped_reduce, semi_join
    from graphx_ray.stages.motif import bucket_join

    ensure_hash_shuffle(vectors)
    ids = vectors.select_columns([id_col])
    default = 0 if min_pts <= 1 else -1  # min_pts<=1 ⇒ own id (marker)

    pairs = (
        cosine_near_dup_pairs(
            vectors,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            num_buckets=num_buckets,
        )
        .select_columns(["a", "b"])
        .materialize()
    )

    def finalize(core_lab: Dataset | None, bord_lab: Dataset | None) -> Dataset:
        out = ids
        if core_lab is not None:
            out = bucket_join(
                out, core_lab, on=id_col, right_on="cid",
                how="left", num_partitions=num_partitions,
            )
        if bord_lab is not None:
            out = bucket_join(
                out, bord_lab, on=id_col, right_on="bid",
                how="left", num_partitions=num_partitions,
            )

        def emit(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            vid = batch[id_col].combine_chunks()
            null64 = pa.nulls(n, pa.int64())
            ccl = batch["ccl"].combine_chunks() if "ccl" in batch.column_names else null64
            bcl = batch["bcl"].combine_chunks() if "bcl" in batch.column_names else null64
            own = vid if min_pts <= 1 else pa.array(np.full(n, -1, np.int64))
            cluster = pc.coalesce(ccl.cast(pa.int64()), bcl.cast(pa.int64()), own)
            is_core = pc.if_else(
                pc.is_valid(ccl) if min_pts > 1 else pa.array(np.ones(n, bool)),
                pa.scalar(1, pa.int64()),
                pa.scalar(0, pa.int64()),
            )
            return pa.table({id_col: vid, "cluster": cluster, "is_core": is_core})

        return out.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    if pairs.count() == 0:
        return finalize(None, None)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks().cast(pa.int64())
        b = batch["b"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "v": pa.concat_arrays([a, b]),
                "u": pa.concat_arrays([b, a]),
                "c": pa.array(np.ones(2 * batch.num_rows, np.int64)),
            }
        )

    nbrs = pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
    deg = grouped_reduce(
        nbrs, ["v"], sum_col="c", num_partitions=num_partitions,
        empty_schema=pa.schema([("v", pa.int64()), ("c", pa.int64())]),
    )

    def core_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["c"], pa.scalar(min_pts - 1))
        return pa.table({"cid": batch["v"].filter(keep).cast(pa.int64())})

    core = deg.map_batches(
        core_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if core.count() == 0:
        return finalize(None, None)

    # core-core ε-edges → hash-min CC; isolated cores fall out of the left
    # join below with a null component and keep their own id
    cc_pairs = semi_join(
        semi_join(pairs, core, on="a", right_on="cid", num_partitions=num_partitions),
        core, on="b", right_on="cid", num_partitions=num_partitions,
    ).materialize()

    def own_label(batch: pa.Table) -> pa.Table:
        cid = batch["cid"].combine_chunks().cast(pa.int64())
        return pa.table({"cid": cid, "ccl": cid})

    if cc_pairs.count() == 0:  # only isolated cores — every core its own id
        core_lab = core.map_batches(
            own_label, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        def as_edges(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch["a"].cast(pa.int64()),
                    "dst": batch["b"].cast(pa.int64()),
                    "w": pa.array(np.ones(batch.num_rows, np.int64)),
                }
            )

        edges = cc_pairs.map_batches(
            as_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        g = Graph(edges, num_parts=max(2, min(num_partitions, 8)))
        try:
            cc = g.connected_components()
        finally:
            g.close()

        def cc_ren(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"ccv": batch["vid"].cast(pa.int64()),
                 "comp": batch["component"].cast(pa.int64())}
            )

        cc = cc.map_batches(cc_ren, batch_format="pyarrow", zero_copy_batch=True)
        joined = bucket_join(
            core, cc, on="cid", right_on="ccv", how="left",
            num_partitions=num_partitions,
        )

        def core_lab_emit(batch: pa.Table) -> pa.Table:
            cid = batch["cid"].combine_chunks().cast(pa.int64())
            comp = batch["comp"].combine_chunks().cast(pa.int64())
            return pa.table({"cid": cid, "ccl": pc.coalesce(comp, cid)})

        core_lab = joined.map_batches(
            core_lab_emit, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    # border: non-core v with a core neighbor u → min cluster label over u
    bhalf = semi_join(
        semi_join(nbrs, core, on="u", right_on="cid", num_partitions=num_partitions),
        core, on="v", right_on="cid", anti=True, num_partitions=num_partitions,
    )
    blab = bucket_join(
        bhalf, core_lab, on="u", right_on="cid", how="inner",
        num_partitions=num_partitions,
    )

    def bord_pre(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"bid": batch["v"].cast(pa.int64()), "bcl": batch["ccl"].cast(pa.int64())}
        )

    bord_lab = grouped_reduce(
        blab.map_batches(bord_pre, batch_format="pyarrow", zero_copy_batch=True),
        ["bid"], sum_col="bcl", agg="min", num_partitions=num_partitions,
        empty_schema=pa.schema([("bid", pa.int64()), ("bcl", pa.int64())]),
    )
    return finalize(core_lab, bord_lab)
