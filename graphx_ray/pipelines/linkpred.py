"""Neighborhood-overlap link prediction: common neighbors + Jaccard.

The classic unsupervised link-prediction scores of Liben-Nowell &
Kleinberg (CIKM 2003) over the simple undirected graph: for every
candidate pair (a, b), a < b, that is NOT an existing edge and shares at
least ``min_cn`` neighbors,

    cn(a, b)    = |N(a) ∩ N(b)|                 (exact int64)
    jacc_micro  = round(1e6 · cn / (deg a + deg b − cn))
                  (int64 micro-units, floor(x·1e6 + 0.5) on BOTH the
                  engine and the DuckDB oracle — the repo's pinned
                  half-up recipe, no float leaves the engine)

Scale shape (the 100-TB reasoning, same as the triangle pipeline's):

- Candidate generation is wedge enumeration at each center w — every
  common neighbor of (a, b) is the center of exactly one wedge a–w–b, so
  summing 1 per wedge grouped by (a, b) IS the intersection size. The
  pair stream is Σ_w d(w)·(d(w)−1)/2, quadratic in hub degree, so
  ``max_degree`` skips centers above the cap entirely (the standard LP
  practice: a celebrity hub connects everyone to everyone and carries no
  signal). The cap bounds per-task work at cap²/2 per center.
- Each center's full neighborhood must be co-resident for the local pair
  expansion, so adjacency rows go through ``derive.partitioned_map``
  (storage-backed spill keyed by center, one task per partition) — an
  in-memory repartition can split a block mid-group and silently drop
  cross-block pairs (see CLAUDE.md).
- The (a, b) count reduction, the existing-edge anti-join and the two
  degree joins are storage-backed bucket shuffles (``grouped_reduce`` /
  ``motif.bucket_join``); nothing graph-sized touches the driver.
- Pair expansion inside the task is fully vectorized (prefix-sum segment
  expansion — the same shape as ``derive._zone_expand``), with a local
  lexsort+reduceat combine so the shuffle moves one row per distinct
  (a, b) per task, not one per wedge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("cn", pa.int64())]
)
PAIR_RA_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("cn", pa.int64()),
        ("ra", pa.int64()),
        ("aa", pa.int64()),
    ]
)
RESULT_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("cn", pa.int64()),
        ("jacc_micro", pa.int64()),
    ]
)
RESULT_ALL_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("cn", pa.int64()),
        ("jacc_micro", pa.int64()),
        ("ra_micro", pa.int64()),
        ("aa_micro", pa.int64()),
        ("pa", pa.int64()),
    ]
)

# Resource-allocation micro-unit scale: each common neighbor z contributes
# floor(RA_SCALE / deg(z)) — EXACT integer floor division on both the
# engine and the DuckDB oracle (operands positive, so DuckDB's truncating
# `//` equals floor), so RA sums are order-free and hash-comparable with
# no float ever leaving the engine.
RA_SCALE = 1_000_000


def aa_weight_micro(d: int) -> int:
    """Adamic–Adar wedge weight floor(1e6 / ln(d)) for an integer center
    degree d ≥ 2 (a degree-1 center spans no wedge, so d=2 is the true
    minimum). Computed with python ``math.log`` and cached per integer —
    the SQL oracle embeds the SAME python-computed constants literally
    (one VALUES row per degree up to the cap), so engine and oracle share
    identical integers by construction and no libm/SIMD last-ulp
    difference can ever flake a hash (numpy's vectorized log is NOT
    guaranteed bit-equal to libm; an integer LUT sidesteps the question
    entirely)."""
    import math

    return int(1_000_000 / math.log(d))

# Default wedge-center degree cap: the pair stream is quadratic in center
# degree (cap²/2 pairs per center), so an UNCAPPED call on a power-law
# graph hub-bombs one task. 10⁴ bounds a center at ~5·10⁷ pairs — large
# but finite; callers wanting the exact uncapped semantics opt in with
# max_degree=None and get a RuntimeWarning.
DEFAULT_MAX_DEGREE = 10_000


def _resolve_cap(max_degree, who: str) -> int | None:
    if max_degree == "default":
        return DEFAULT_MAX_DEGREE
    if max_degree is None:
        import warnings

        warnings.warn(
            f"{who}: max_degree=None disables the wedge-center degree cap — "
            "pair count is quadratic in the hottest hub's degree "
            f"(default cap: {DEFAULT_MAX_DEGREE})",
            RuntimeWarning,
            stacklevel=3,
        )
        return None
    return int(max_degree)


def _combine_pairs(
    a: np.ndarray,
    b: np.ndarray,
    c: np.ndarray,
    r: np.ndarray | None = None,
    aw: np.ndarray | None = None,
) -> pa.Table:
    """lexsort+reduceat local combine of (a, b, count[, ra, aa]) rows."""
    if len(a) == 0:
        return (PAIR_RA_SCHEMA if r is not None else PAIR_SCHEMA).empty_table()
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    new = np.ones(len(a), bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(c, starts)
    data = {
        "a": pa.array(a[starts], type=pa.int64()),
        "b": pa.array(b[starts], type=pa.int64()),
        "cn": pa.array(sums.astype(np.int64)),
    }
    if r is not None:
        data["ra"] = pa.array(np.add.reduceat(r[order], starts).astype(np.int64))
        data["aa"] = pa.array(np.add.reduceat(aw[order], starts).astype(np.int64))
        return pa.table(data, schema=PAIR_RA_SCHEMA)
    return pa.table(data, schema=PAIR_SCHEMA)


def common_neighbor_pairs(
    edges, *, max_degree="default", num_parts: int = 16,
    canonical: bool = False, with_ra: bool = False,
) -> Dataset:
    """(a, b, cn) for every unordered pair (adjacent or not) with ≥1
    common neighbor whose shared centers all have degree ≤ cap. Existing
    edges are NOT removed here — ``link_prediction`` does that; this raw
    form is what a triangle/affinity consumer wants. ``canonical=True``
    marks ``edges`` as an already-deduped (u, v) u<v table and skips the
    canonicalization shuffle. ``with_ra=True`` adds the resource-
    allocation index (Zhou, Lü & Zhang 2009) as an extra exact-integer
    column ``ra`` = Σ_z floor(RA_SCALE / deg(z)) — each wedge a–z–b is
    weighted by its center's inverse degree instead of 1, and the center's
    TRUE degree is its co-resident segment length (``partitioned_map``
    guarantees the whole adjacency of z sits in one task), so the weight
    costs nothing extra: same pair stream, same single shuffle."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import (
        canonical_edges,
        grouped_reduce,
        partitioned_map,
    )

    can = _as_dataset(edges) if canonical else canonical_edges(_as_dataset(edges))

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
    cap = _resolve_cap(max_degree, "common_neighbor_pairs")
    pair_schema = PAIR_RA_SCHEMA if with_ra else PAIR_SCHEMA
    expand = _make_wedge_expand(cap, with_ra)

    pairs = partitioned_map(
        adj, ["c"], expand, num_partitions=num_parts, empty_schema=pair_schema
    )
    if with_ra:
        return grouped_reduce(
            pairs, ["a", "b"], agg_cols={"cn": "sum", "ra": "sum", "aa": "sum"},
            num_partitions=num_parts, empty_schema=pair_schema,
        )
    return grouped_reduce(
        pairs, ["a", "b"], sum_col="cn",
        num_partitions=num_parts, empty_schema=pair_schema,
    )


def _make_wedge_expand(cap, with_ra: bool):
    """The per-center wedge expansion kernel shared by
    ``common_neighbor_pairs`` (symmetrized adjacency) and
    ``bipartite_project`` (one-side centers): input (c, n) unique rows,
    whole center co-resident; output locally-combined (a, b, cn[, ra, aa])."""
    pair_schema = PAIR_RA_SCHEMA if with_ra else PAIR_SCHEMA

    def expand(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pair_schema.empty_table()
        c = tbl["c"].to_numpy()
        n = tbl["n"].to_numpy()
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        new = np.ones(len(c), bool)
        new[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(c)))
        if cap is not None:
            keep = lens <= cap
            starts, lens = starts[keep], lens[keep]
        if len(starts) == 0:
            return pair_schema.empty_table()
        # vectorized all-pairs within each center segment: element at
        # within-group position p pairs with the lens−1−p neighbors after
        # it (n sorted ⇒ a < b by construction; (c, n) unique ⇒ strict)
        m = int(lens.sum())
        goff = np.concatenate(([0], np.cumsum(lens)[:-1]))
        p = np.arange(m) - np.repeat(goff, lens)
        idx = np.repeat(starts, lens) + p
        reps = np.repeat(lens, lens) - 1 - p
        total = int(reps.sum())
        if total == 0:
            return pair_schema.empty_table()
        a_vals = np.repeat(n[idx], reps)
        seg_start = np.repeat(idx + 1, reps)
        off = np.concatenate(([0], np.cumsum(reps)[:-1]))
        within = np.arange(total) - np.repeat(off, reps)
        b_vals = n[seg_start + within]
        ra = aw = None
        if with_ra:
            # per-pair weights from the center's degree (= its segment
            # length, already in hand): RA = floor(RA_SCALE/deg); AA via
            # the python-log integer LUT over the distinct degrees in this
            # task (only degrees ≥ 2 span wedges, so log is never 0) —
            # repeat down to first-elements (idx) and then to pairs (reps)
            uls = np.unique(lens)  # distinct degrees: LUT-sized, never hub-sized
            ws = np.array(
                [aa_weight_micro(int(d)) if d >= 2 else 0 for d in uls],
                np.int64,
            )
            seg_deg = np.repeat(lens, lens)
            ra = np.repeat(RA_SCALE // seg_deg, reps)
            aw = np.repeat(ws[np.searchsorted(uls, seg_deg)], reps)
        return _combine_pairs(a_vals, b_vals, np.ones(total, np.int64), ra, aw)

    return expand


def bipartite_project(
    edges,
    *,
    onto: str = "dst",
    max_degree="default",
    num_parts: int = 16,
) -> Dataset:
    """One-mode projection of a bipartite graph: (a, b, w) for every
    unordered pair (a < b) of ``onto``-side vertices sharing ≥ 1
    neighbor on the other side, w = the number of shared (distinct)
    neighbors — the co-purchase / co-occurrence graph builder. The two
    sides must use disjoint id spaces (the engine's PART_OFF pattern).

    Scale shape: the link-prediction wedge machinery with centers
    restricted to the OTHER side — one (c, n) dedup reduce, one
    storage-backed spill keyed by center (whole adjacency co-resident
    per task), vectorized within-center pair expansion with the same
    quadratic-hub ``max_degree`` cap, one keyed count reduce. Nothing
    graph-sized touches the driver."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import grouped_reduce, partitioned_map

    if onto not in ("src", "dst"):
        raise ValueError("bipartite_project: onto must be 'src' or 'dst'")
    ccol, ncol = (("src", "dst") if onto == "dst" else ("dst", "src"))
    ds = _as_dataset(edges)

    def adj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"c": batch[ccol].cast(pa.int64()), "n": batch[ncol].cast(pa.int64())}
        )

    adj_schema = pa.schema([("c", pa.int64()), ("n", pa.int64())])
    # dedup (c, n): parallel bipartite edges must count once per neighbor
    adj_d = grouped_reduce(
        ds.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True),
        ["c", "n"], num_partitions=num_parts, empty_schema=adj_schema,
    )
    cap = _resolve_cap(max_degree, "bipartite_project")
    pairs = partitioned_map(
        adj_d, ["c"], _make_wedge_expand(cap, False),
        num_partitions=num_parts, empty_schema=PAIR_SCHEMA,
    )
    out = grouped_reduce(
        pairs, ["a", "b"], sum_col="cn",
        num_partitions=num_parts, empty_schema=PAIR_SCHEMA,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["a", "b", "w"])

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


TWOHOP_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("fof", pa.int64())]
)


def two_hop_counts(
    edges,
    *,
    max_degree="default",
    num_parts: int = 16,
) -> Dataset:
    """Per-vertex EXACT two-hop neighborhood size — fof(v) = #vertices at
    distance exactly 2 (the friends-of-friends metric; the growth signal
    HyperANF estimates, exact here). A vertex u is at distance 2 from v
    iff (v, u) is a NON-adjacent pair with ≥1 common neighbor, so the
    count folds from the wedge kernel: ``common_neighbor_pairs`` → one
    anti bucket_join against the canonical edge table → each surviving
    pair credits both endpoints → one vertex-keyed reduce. Vertices with
    no 2-hop neighbor are omitted (the degrees zero-row contract);
    ``max_degree`` is the usual quadratic-hub wedge cap."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import canonical_edges, grouped_reduce
    from graphx_ray.stages.motif import bucket_join
    from graphx_ray.stages.structural import _spill_edges

    can = _spill_edges(canonical_edges(_as_dataset(edges)))
    pairs = common_neighbor_pairs(
        can, max_degree=max_degree, num_parts=num_parts, canonical=True
    )
    non_adj = bucket_join(
        pairs, can, on=["a", "b"], right_on=["u", "v"],
        how="anti", num_partitions=num_parts,
    )

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return TWOHOP_SCHEMA.empty_table()
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table(
            {"vid": pa.array(np.concatenate([a, b]), type=pa.int64()),
             "fof": pa.array(np.ones(2 * batch.num_rows, np.int64))},
            schema=TWOHOP_SCHEMA,
        )

    return grouped_reduce(
        non_adj.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], sum_col="fof",
        num_partitions=num_parts, empty_schema=TWOHOP_SCHEMA,
    )


BUTTERFLY_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("butterflies", pa.int64())]
)


def butterfly_counts(
    edges,
    *,
    onto: str = "dst",
    max_degree="default",
    num_parts: int = 16,
) -> Dataset:
    """Per-vertex butterfly counts on the ``onto`` side of a bipartite
    graph — the bipartite analogue of per-vertex triangle counts
    (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018). A butterfly is a
    (2,2)-biclique {a, b} × {x, y}; vertex a participates in

        b(a) = Σ_{b ≠ a} C(w_ab, 2)

    where w_ab = |N(a) ∩ N(b)| is the one-mode projection weight, so the
    whole count folds EXACTLY from the ``bipartite_project`` pair table:
    one vectorized C(w,2) pass (w(w−1) is always even ⇒ the integer
    halving is exact on both the engine and DuckDB's truncating ``//``;
    operands non-negative), each pair's count credited to both endpoints,
    one keyed sum. Total butterflies = Σ_a b(a) / 2. Vertices in no
    butterfly are omitted (the degrees/triangles zero-row contract).

    Scale shape: inherits bipartite_project's wedge machinery — the
    other-side ``max_degree`` cap bounds the quadratic hub expansion, the
    pair table never touches the driver, and the fold adds one
    zero-shuffle map_batches plus one vertex-keyed ``grouped_reduce``."""
    from graphx_ray.stages.derive import grouped_reduce

    pairs = bipartite_project(
        edges, onto=onto, max_degree=max_degree, num_parts=num_parts
    )

    def fold(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy()
        keep = w >= 2
        if not keep.any():
            return BUTTERFLY_SCHEMA.empty_table()
        bf = (w[keep] * (w[keep] - 1)) // 2
        a = batch["a"].to_numpy()[keep]
        b = batch["b"].to_numpy()[keep]
        return pa.table(
            {
                "vid": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "butterflies": pa.array(
                    np.concatenate([bf, bf]), type=pa.int64()
                ),
            }
        )

    contrib = pairs.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_reduce(
        contrib, ["vid"], sum_col="butterflies",
        num_partitions=num_parts, empty_schema=BUTTERFLY_SCHEMA,
    )


def link_prediction(
    edges,
    *,
    max_degree="default",
    min_cn: int = 1,
    top_k: int | None = None,
    num_parts: int = 16,
    candidates: str = "non_edges",
    scores: str = "jaccard",
) -> Dataset:
    """(a, b, cn, jacc_micro) for candidate pairs; optionally per-``a``
    top-k by Jaccard DESC (ties b ASC — pinned total order). Degrees in
    the Jaccard denominator are the TRUE simple-graph degrees (the cap
    only limits which centers generate candidates). ``max_degree``
    defaults to ``DEFAULT_MAX_DEGREE`` (finite — an uncapped call cannot
    hub-bomb by accident); pass ``None`` for the explicit uncapped
    semantics (RuntimeWarning).

    ``scores="all"`` adds the other three classic Liben-Nowell–Kleinberg
    unsupervised scores as exact-integer columns: ``ra_micro`` — the
    resource-allocation index Σ_z floor(1e6/deg(z)) over shared (capped)
    centers z (Zhou, Lü & Zhang, EPJ B 2009; the best simple predictor in
    their benchmark) — ``aa_micro`` — Adamic–Adar Σ_z floor(1e6/ln deg(z))
    via a python-log integer LUT on the center's degree (see
    ``aa_weight_micro`` for why a LUT and not vectorized float log) —
    and ``pa`` — preferential attachment deg(a)·deg(b). All ride the
    existing single wedge shuffle and degree joins; no extra pass.

    ``candidates="non_edges"`` (default) scores NON-adjacent pairs — the
    link-prediction use; ``candidates="edges"`` scores EXISTING edges by
    their endpoints' neighborhood overlap — the local-sparsification /
    Jarvis–Patrick similarity-graph use (keep each vertex's top-k most
    embedded edges); see ``edge_jaccard``."""
    from graphx_ray.pipelines.graph import _as_dataset
    from graphx_ray.stages.derive import (
        canonical_edges,
        grouped_reduce,
        grouped_top_k,
    )
    from graphx_ray.stages.motif import bucket_join

    # canonical_edges' grouped_reduce spills eagerly to storage, so the
    # three consumers below (wedge expansion, anti-join, degrees) re-read
    # the spill rather than re-shuffling — no materialize() needed
    if scores not in ("jaccard", "all"):
        raise ValueError(scores)
    with_ra = scores == "all"
    can = canonical_edges(_as_dataset(edges))
    cn = common_neighbor_pairs(
        can, max_degree=max_degree, num_parts=num_parts, canonical=True,
        with_ra=with_ra,
    )
    if min_cn > 1:
        thr = int(min_cn)
        cn = cn.map_batches(
            lambda b: b.filter(pa.compute.greater_equal(b["cn"], thr)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    if candidates not in ("non_edges", "edges"):
        raise ValueError(candidates)
    cand = bucket_join(
        cn, can, on=["a", "b"], right_on=["u", "v"],
        how="anti" if candidates == "non_edges" else "semi",
        num_partitions=num_parts,
    )

    def both(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        vid = np.concatenate([u, v])
        uq, cnt = np.unique(vid, return_counts=True)
        return pa.table(
            {"vid": pa.array(uq, type=pa.int64()),
             "d": pa.array(cnt.astype(np.int64))}
        )

    deg = grouped_reduce(
        can.map_batches(both, batch_format="pyarrow", zero_copy_batch=True),
        ["vid"], sum_col="d", num_partitions=num_parts,
    )
    j1 = bucket_join(cand, deg, on="a", right_on="vid", num_partitions=num_parts)
    j2 = bucket_join(j1, deg, on="b", right_on="vid", num_partitions=num_parts)

    result_schema = RESULT_ALL_SCHEMA if with_ra else RESULT_SCHEMA

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return result_schema.empty_table()
        cnv = batch["cn"].to_numpy().astype(np.float64)
        da = batch["d"].to_numpy().astype(np.float64)
        db = batch["d_r"].to_numpy().astype(np.float64)
        jm = np.floor(1e6 * cnv / (da + db - cnv) + 0.5).astype(np.int64)
        data = {
            "a": batch["a"],
            "b": batch["b"],
            "cn": batch["cn"],
            "jacc_micro": pa.array(jm),
        }
        if with_ra:
            data["ra_micro"] = batch["ra"]
            data["aa_micro"] = batch["aa"]
            data["pa"] = pa.array(
                batch["d"].to_numpy() * batch["d_r"].to_numpy()
            )
        return pa.table(data, schema=result_schema)

    out = j2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    if top_k is not None:
        # cn (and ra_micro/pa) ride as trailing tie columns so
        # grouped_top_k's projection keeps them (each is functionally
        # determined by (a, b) — harmless as sort keys, required in the
        # output)
        cols = list(result_schema.names)
        out = grouped_top_k(
            out, ["a"], "jacc_micro", int(top_k),
            tie_cols=[c for c in cols if c not in ("a", "jacc_micro")],
            num_partitions=num_parts,
        ).select_columns(cols)
    return out


def edge_jaccard(
    edges,
    *,
    max_degree="default",
    top_k: int | None = None,
    num_parts: int = 16,
) -> Dataset:
    """(a, b, cn, jacc_micro) for EXISTING edges — endpoint-neighborhood
    overlap, the embeddedness signal local graph sparsifiers keep edges
    by (Satuluri et al. SIGMOD 2011's local-similarity sparsification /
    Jarvis–Patrick shared-neighbor graphs). Edges whose endpoints share
    no (uncapped) center are absent (cn would be 0)."""
    return link_prediction(
        edges, max_degree=max_degree, min_cn=1, top_k=top_k,
        num_parts=num_parts, candidates="edges",
    )
