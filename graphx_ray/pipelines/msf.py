"""Minimum spanning forest — distributed Borůvka with pointer-jump
contraction.

Borůvka (1926) is THE parallel MST algorithm (GraphX/Spark-era systems
all use it: every component picks its lightest incident edge, selected
edges merge components, rounds halve the component count ⇒ ≤ log₂V
rounds). Determinism/uniqueness: edges are totally ordered by the pinned
key (w, u, v), which makes the minimum spanning forest UNIQUE and every
round's picks parallelism-invariant — the property the tests pin against
networkx (unique weights) and against the validity laws (ties).

Round shape (all storage-backed, nothing graph-sized on the driver):

- label both endpoints with their component via two ``bucket_join``s of
  the vertex→component table onto the edge table; drop intra-component
  edges (they can never enter the forest again — the edge set shrinks
  monotonically and is re-spilled per round);
- per-component lightest edge: each inter edge expands to two (component,
  edge) rows; one ``partitioned_map`` keyed by component lexsort-picks
  the (w, u, v)-minimum — the classic wedge-combiner shape;
- contraction: selected edges oriented component → partner form a
  functional graph whose only cycles are MUTUAL pairs (a, b both picking
  the same edge — a consequence of the unique total order), so roots are
  exactly the smaller endpoint of each mutual pair plus unpicked
  components; pointer jumping (p ← p∘p, one ``bucket_join`` per step)
  reaches every root in ≤ log steps, and the vertex→component table
  relabels through one more join. Contraction is COMPLETE each round —
  partial contraction would let a merged group select an internal edge
  next round and corrupt the forest.

Driver state per round: two scalar counts (inter-edge count, pointer
changes). The forest accumulates as per-round edge Datasets unioned and
min-deduped at the end (mutual picks select the same edge twice).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

FOREST_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())]
)
_PICK_SCHEMA = pa.schema(
    [("key", pa.int64()), ("u", pa.int64()), ("v", pa.int64()),
     ("w", pa.int64()), ("partner", pa.int64())]
)


def minimum_spanning_forest(
    edges,
    *,
    num_partitions: int = 16,
    max_rounds: int = 64,
) -> Dataset:
    """(u, v, w) rows of the unique (w, u, v)-minimum spanning forest of
    the undirected graph given as (src, dst, w int) rows (parallel edges
    collapse to their minimum weight, self-loops drop)."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import grouped_reduce
    from graphx_ray.stages.motif import bucket_join

    ds = _as_dataset(edges)

    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        w = batch["w"].to_numpy().astype(np.int64)
        u = np.minimum(src, dst)
        v = np.maximum(src, dst)
        keep = u != v
        return pa.table(
            {"u": pa.array(u[keep], type=pa.int64()),
             "v": pa.array(v[keep], type=pa.int64()),
             "w": pa.array(w[keep])},
            schema=FOREST_SCHEMA,
        )

    cur = grouped_reduce(
        ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["u", "v"], sum_col="w", agg="min",
        num_partitions=num_partitions, empty_schema=FOREST_SCHEMA,
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        vid = np.unique(
            np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        )
        return pa.table(
            {"vid": pa.array(vid, type=pa.int64()),
             "c": pa.array(vid, type=pa.int64())}
        )

    comp = grouped_reduce(
        cur.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], sum_col="c", agg="min",
        num_partitions=num_partitions,
        empty_schema=pa.schema([("vid", pa.int64()), ("c", pa.int64())]),
    )
    forest: list[Dataset] = []

    for _ in range(max_rounds):
        lab = bucket_join(cur, comp, on="u", right_on="vid",
                          num_partitions=num_partitions)
        lab = bucket_join(lab, comp, on="v", right_on="vid",
                          num_partitions=num_partitions)
        # columns now: u, v, w, c (comp of u), c_r (comp of v)

        def inter(batch: pa.Table) -> pa.Table:
            cu = batch["c"].to_numpy()
            cv = batch["c_r"].to_numpy()
            return batch.filter(pa.array(cu != cv))

        live = lab.map_batches(inter, batch_format="pyarrow", zero_copy_batch=True)
        from graphx_ray.stages.derive import partitioned_map

        # spill the shrinking inter-edge set once; reused by the pick
        # expansion below and as the next round's edge table
        from graphx_ray.stages.structural import _spill_edges

        live = _spill_edges(live)
        if live.count() == 0:
            break

        def expand(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy()
            v = batch["v"].to_numpy()
            w = batch["w"].to_numpy()
            cu = batch["c"].to_numpy()
            cv = batch["c_r"].to_numpy()
            return pa.table(
                {"key": pa.array(np.concatenate([cu, cv])),
                 "u": pa.array(np.concatenate([u, u])),
                 "v": pa.array(np.concatenate([v, v])),
                 "w": pa.array(np.concatenate([w, w])),
                 "partner": pa.array(np.concatenate([cv, cu]))},
                schema=_PICK_SCHEMA,
            )

        def pick_min(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return _PICK_SCHEMA.empty_table()
            key = tbl["key"].to_numpy()
            w = tbl["w"].to_numpy()
            u = tbl["u"].to_numpy()
            v = tbl["v"].to_numpy()
            order = np.lexsort((v, u, w, key))
            key_s = key[order]
            new = np.ones(len(key_s), bool)
            new[1:] = key_s[1:] != key_s[:-1]
            first = order[np.flatnonzero(new)]
            return tbl.take(pa.array(np.sort(first)))

        picks = partitioned_map(
            live.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
            ["key"], pick_min,
            num_partitions=num_partitions, empty_schema=_PICK_SCHEMA,
        )
        forest.append(picks.select_columns(["u", "v", "w"]))

        # ---- contraction: functional graph key → partner, mutual pairs
        # are the only cycles; root = smaller end of a mutual pair.
        p2 = bucket_join(
            picks.select_columns(["key", "partner"]),
            picks.select_columns(["key", "partner"]),
            on="partner", right_on="key", num_partitions=num_partitions,
        )
        # columns: key, partner, partner_r = p(p(key))

        def fix_roots(batch: pa.Table) -> pa.Table:
            k = batch["key"].to_numpy()
            p = batch["partner"].to_numpy()
            pp = batch["partner_r"].to_numpy()
            root = (pp == k) & (k < p)
            return pa.table(
                {"node": pa.array(k), "p": pa.array(np.where(root, k, p))}
            )

        ptr = p2.map_batches(fix_roots, batch_format="pyarrow", zero_copy_batch=True)
        # unpicked components point to themselves
        allc = comp.map_batches(
            lambda b: pa.table({"node": b["c"], "p": b["c"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        allc = grouped_reduce(
            allc, ["node"], sum_col="p", agg="min",
            num_partitions=num_partitions,
        )
        missing = bucket_join(
            allc.select_columns(["node", "p"]), ptr.select_columns(["node"]),
            on="node", how="anti", num_partitions=num_partitions,
        )
        ptr = ptr.union(missing)
        # pointer jumping to fixpoint
        for _ in range(max_rounds):
            nxt = bucket_join(
                ptr, ptr, on="p", right_on="node", num_partitions=num_partitions
            )
            # columns: node, p, p_r = p(p)

            def jump(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {"node": batch["node"], "p": batch["p_r"],
                     "chg": pa.array(
                         (batch["p_r"].to_numpy()
                          != batch["p"].to_numpy()).astype(np.int64))}
                )

            nxt = nxt.map_batches(jump, batch_format="pyarrow", zero_copy_batch=True)
            nxt = _spill_edges(nxt)
            changed = int(nxt.sum("chg"))
            ptr = nxt.select_columns(["node", "p"])
            if changed == 0:
                break
        # relabel vertices through the contracted roots
        comp = bucket_join(
            comp, ptr, on="c", right_on="node", num_partitions=num_partitions
        )
        comp = comp.map_batches(
            lambda b: pa.table({"vid": b["vid"], "c": b["p"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        comp = _spill_edges(comp)
        # next round re-derives labels from comp — carry only the edge triple
        cur = live.select_columns(["u", "v", "w"])

    if not forest:
        import ray.data as rd

        return rd.from_arrow(FOREST_SCHEMA.empty_table())
    out = forest[0]
    for f in forest[1:]:
        out = out.union(f)
    from graphx_ray.stages.derive import grouped_reduce as _gr

    return _gr(out, ["u", "v"], sum_col="w", agg="min",
               num_partitions=num_partitions, empty_schema=FOREST_SCHEMA)
