"""Graph facade + superstep drivers for the four algorithms (SURVEY.md §2.8).

Semantics are pinned to the published GraphFrames/GraphX contracts recorded
in SURVEY.md Appendix A (the reference wrapped GraphFrames thinly; its mount
was empty, so Appendix A is the contract the north_rule binds to):

- ``pagerank``: r0=1, r' = α + (1−α)·Σ w·r(u)/outdeg(u); parallel edges
  (weights) count; NO dangling redistribution, NO normalization (A.1).
- ``connected_components``: min-vid label over the canonical undirected
  graph; isolated vertices are singletons (A.2).
- ``label_propagation``: synchronous, undirected influence with parallel-
  edge weight; tie → smallest label (pinned rule, A.3).
- ``triangle_count``: canonical simple graph, per-vertex counts (A.4) —
  non-iterative path in pipelines/triangles.py.

Each iterative algorithm is a driver-side superstep loop over a ``CsrShard``
actor pool: scatter (per-destination-partition pre-aggregated partials) →
ref-routed shuffle through the object store → gather → optional per-
superstep checkpoint (resume replays from the last complete manifest).
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from graphx_ray.state import checkpoint as ckpt
from graphx_ray.state.csr import CsrShard


def _as_dataset(x) -> Dataset:
    if isinstance(x, Dataset):
        return x
    if isinstance(x, pa.Table):
        return rd.from_arrow(x)
    if isinstance(x, pd.DataFrame):
        return rd.from_pandas(x)
    raise TypeError(f"expected Dataset/Table/DataFrame, got {type(x)}")


def _default_parts() -> int:
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(ncpu, 64))


class Graph:
    """A property graph: directed weighted edges (src, dst[, w]) + optional
    vertex table (vid, ...). The GraphFrames-equivalent query surface."""

    def __init__(
        self,
        edges,
        vertices=None,
        *,
        num_parts: int | None = None,
        workdir: str | None = None,
        salt_threshold: int | None = None,
        actor_num_cpus: float = 0.0,
        scatter_route: str | None = None,
    ):
        # actor_num_cpus=0 by default: shard actors compute only while no
        # Ray Data tasks are running (supersteps are the sole active stage),
        # and a pool that RESERVED P CPUs would starve the staging pipeline
        # of the next algorithm variant on a busy node (observed deadlock).
        # Ray's logical CPUs are admission control, not an OS limit.
        self.edges = _as_dataset(edges)
        self.vertices = _as_dataset(vertices) if vertices is not None else None
        self.P = num_parts or _default_parts()
        self.workdir = workdir or tempfile.mkdtemp(prefix="graphx_ray_", dir="/tmp")
        self.salt_threshold = salt_threshold
        self.actor_num_cpus = actor_num_cpus
        # Superstep message routing (csr.py module docstring):
        # "packed" — one scatter object per sender per superstep, receivers
        # slice their partition (optimal single-node: avoids P² tiny store
        # entries serializing on the plasma lock).
        # "per_dest" — scatters run with num_returns=P so each destination's
        # partial is its own object and a receiver pulls ONLY its partition;
        # the multi-node default (no P× pull amplification over the network).
        # Env override GRAPHX_SCATTER_ROUTE applies when the arg is None.
        self.route = scatter_route or os.environ.get("GRAPHX_SCATTER_ROUTE", "packed")
        if self.route not in ("packed", "per_dest"):
            raise ValueError(self.route)
        self._staged: dict = {}  # variant -> manifest
        self._actors: dict = {}  # variant -> (actors, manifest)
        self._rseq = 0  # result-directory counter (Dataset-default returns)

    # ------------------------------------------------------------------ infra

    def _edge_variant(self, variant: str) -> Dataset:
        from graphx_ray.stages.derive import canonical_edges

        if variant == "directed":
            return self._with_weight(self.edges)
        if variant == "reversed":
            # SCC backward pass: every edge flipped, weights kept
            def flip(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {"src": batch["dst"], "dst": batch["src"], "w": batch["w"]}
                )

            return self._with_weight(self.edges).map_batches(
                flip, batch_format="pyarrow", zero_copy_batch=True
            )
        if variant == "undirected_weighted":
            # LPA influence graph (A.3): every directed edge contributes BOTH
            # directions with its weight; self-loops kept (GraphX behavior).
            return self._with_weight(self.edges)
        if variant == "undirected":
            canon = canonical_edges(self.edges)

            def to_sym(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "src": batch["u"],
                        "dst": batch["v"],
                        "w": pa.array(np.ones(batch.num_rows, np.int64)),
                    }
                )

            return canon.map_batches(to_sym, batch_format="pyarrow", zero_copy_batch=True)
        raise ValueError(variant)

    def _stage(self, variant: str) -> dict:
        if variant in self._staged:
            return self._staged[variant]
        from graphx_ray.state.csr import stage_graph

        man = stage_graph(
            self._edge_variant(variant),
            self.vertices,
            os.path.join(self.workdir, variant),
            self.P,
            # undirected variants symmetrize (u,v)+(v,u) at stage time
            symmetric=variant in ("undirected", "undirected_weighted"),
            salt_threshold=self.salt_threshold,
        )
        man["variant"] = variant
        self._staged[variant] = man
        return man

    def _pool(self, variant: str):
        if variant in self._actors:
            return self._actors[variant]
        man = self._stage(variant)
        Actor = ray.remote(num_cpus=self.actor_num_cpus)(CsrShard)
        actors = [Actor.remote(p, self.P, man, self.route) for p in range(self.P)]
        # one-time ghost index exchange: receiver j caches local indices of
        # every sender's unique destinations
        uniq = ray.get([a.uniq_dsts.remote() for a in actors])  # P lists of P refs
        ray.get(
            [
                actors[j].cache_ghost_locals.remote([uniq[i][j] for i in range(self.P)])
                for j in range(self.P)
            ]
        )
        if man.get("hubs"):
            partials = ray.get([a.hub_outdeg_part.remote() for a in actors])
            hub_outdeg = np.sum(partials, axis=0)
            ray.get([a.set_hub_outdeg.remote(hub_outdeg) for a in actors])
        self._actors[variant] = (actors, man)
        return actors, man

    def _scatter(self, actors, method: str, *args) -> list:
        """Dispatch one scatter wave and return per-receiver ref lists:
        out[j] is what receiver j's gather takes as ``sender_refs``.

        "packed": each sender returns ONE object of P partials — every
        receiver gets the same ref list and slices its partition.
        "per_dest": ``num_returns=P`` makes Ray store each partial as its
        own object; receiver j gets refs to exactly its P partials."""
        # with P == 1 Ray returns a bare ObjectRef from num_returns=1 and
        # the [i][j] indexing would break — the two routes are identical
        # there, so fall back to packed (ADVICE r3)
        if self.route == "per_dest" and self.P > 1:
            futs = [
                getattr(a, method).options(num_returns=self.P).remote(*args)
                for a in actors
            ]
            return [[futs[i][j] for i in range(self.P)] for j in range(self.P)]
        futs = [getattr(a, method).remote(*args) for a in actors]
        return [futs] * self.P

    def _broadcast_hubs(self, actors, man) -> None:
        if not man.get("hubs"):
            return
        hubs = np.asarray(man["hubs"], dtype=np.int64)  # sorted by stage_graph
        pairs = ray.get([a.hub_ranks.remote() for a in actors])
        vids_all = np.concatenate([p[0] for p in pairs])
        vals_all = np.concatenate([p[1] for p in pairs])  # dtype-preserving (float rank / int label)
        order = np.argsort(vids_all)
        if not np.array_equal(vids_all[order], hubs):
            raise RuntimeError("hub vertices missing from vertex universe")
        ray.get([a.set_hub_vals.remote(vals_all[order]) for a in actors])

    def _collect(self, actors, colname: str, output_path: str | None,
                 as_table: bool = False):
        if as_table:
            # opt-in small-graph path — the ONLY place an O(V) driver
            # concat happens (VERDICT r3 #2: Dataset is the default)
            tables = ray.get([a.result_table.remote(colname) for a in actors])
            return pa.concat_tables(tables)
        return self._result_ds(
            actors, "result_table", (colname,),
            output_path=output_path, label=colname,
        )

    def _result_ds(
        self, actors, method: str, args=(), *,
        output_path: str | None = None, label: str = "result",
        rename: list | None = None, parts: list[int] | None = None,
    ) -> Dataset:
        """Per-part parquet → lazy ``read_parquet``: the Dataset-default
        collection for every algorithm. The part files land under the
        graph's workdir (or ``output_path``) and the result never
        assembles on the driver; ``parts`` restricts which actors write
        (aggregate_messages skips message-less parts whose empty table
        has a placeholder dtype)."""
        out = output_path or os.path.join(
            self.workdir, "results", f"{label}-{self._rseq}"
        )
        self._rseq += 1
        idx = parts if parts is not None else range(len(actors))
        # read back ONLY the part files just written — a reused
        # output_path with stale part-*.parquet must not leak in
        paths = [os.path.join(out, f"part-{p}.parquet") for p in idx]
        ray.get(
            [
                actors[p].write_result.remote(path, method, list(args), rename)
                for path, p in zip(paths, idx)
            ]
        )
        return rd.read_parquet(paths)

    def _fingerprint(self, algo: str, params: dict, man: dict) -> dict:
        return {"algo": algo, "params": params, "P": self.P, "variant": man["variant"]}

    def _checkpoint(self, actors, ckpt_dir, it, fp, colname, metrics) -> None:
        rows = ray.get(
            [
                a.write_vector.remote(ckpt.part_path(ckpt_dir, it, p), colname)
                for p, a in enumerate(actors)
            ]
        )
        ckpt.write_manifest(
            ckpt_dir, it, fp, {str(p): r for p, r in enumerate(rows)}, metrics
        )

    def _resume(self, actors, ckpt_dir, fp, colname) -> int:
        """Load the newest complete checkpoint; return the next iteration."""
        if not ckpt_dir:
            return 0
        it = ckpt.latest_complete(ckpt_dir, fp)
        if it is None:
            return 0
        ray.get(
            [
                a.load_vector.remote(ckpt.part_path(ckpt_dir, it, p), colname)
                for p, a in enumerate(actors)
            ]
        )
        return it + 1

    # ------------------------------------------------------------- algorithms

    def pagerank(
        self,
        *,
        alpha: float = 0.15,
        max_iter: int = 20,
        tol: float | None = None,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
        dtype: str = "float64",
    ):
        """Static GraphX PageRank (SURVEY.md A.1); ``tol`` adds an early stop
        when the L1 delta falls below it (convergence variant).

        ``dtype="float32"`` halves rank-vector and message bytes (the
        bandwidth-bound hot path) at the cost of ~1e-7 relative precision —
        opt-in for throughput runs; the 1e-6 correctness gate uses the
        float64 default."""
        if dtype not in ("float64", "float32"):
            raise ValueError(dtype)
        actors, man = self._pool("directed")
        # dtype enters the fingerprint only when non-default so float64
        # checkpoints written before the option existed still resume
        params = {"alpha": alpha} if dtype == "float64" else {"alpha": alpha, "dtype": dtype}
        fp = self._fingerprint("pagerank", params, man)
        start = self._resume(actors, checkpoint_dir, fp, "rank") if resume else 0
        if start == 0:
            ray.get(
                [a.init_value.remote("pr" if dtype == "float64" else "pr32") for a in actors]
            )
        self._broadcast_hubs(actors, man)
        m_total = sum(s["n_edges"] for s in ray.get([a.stats.remote() for a in actors]))

        # Pipelined dispatch: actor method calls from one submitter run in
        # submission order, so scatter(k+1) on an actor queues behind its
        # gather(k) — a whole window of supersteps can be dispatched with NO
        # driver barrier in between (removes per-iteration RPC latency from
        # the critical path). Checkpointing, tol stops and hub broadcasts
        # need per-iteration sync → window of 1 there.
        window = 1 if (checkpoint_dir or tol is not None or man.get("hubs")) else 4
        it = start
        while it < max_iter:
            w = min(window, max_iter - it)
            t0 = time.time()
            waves = []
            for _ in range(w):
                routed = self._scatter(actors, "scatter_sum")
                waves.append(
                    [actors[j].gather_sum.remote(routed[j], j, alpha) for j in range(self.P)]
                )
            all_res = [ray.get(wave) for wave in waves]
            self._broadcast_hubs(actors, man)
            wall = time.time() - t0
            for k, res in enumerate(all_res):
                delta = float(sum(r[0] for r in res))
                metrics = {
                    "algo": "pagerank",
                    "iteration": it + k,
                    "wall_s": wall / w,
                    "edges": m_total,
                    "l1_delta": delta,
                    "mass": float(sum(r[1] for r in res)),
                }
                ckpt.append_metrics(self.workdir, metrics)
                if checkpoint_dir:
                    self._checkpoint(actors, checkpoint_dir, it + k, fp, "rank", metrics)
            it += w
            if tol is not None and delta < tol:
                break
        return self._collect(actors, "rank", output_path, as_table)

    def connected_components(
        self,
        *,
        max_iter: int | None = None,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Hash-min label propagation to fixpoint over the canonical
        undirected graph (SURVEY.md A.2: component = min vid)."""
        actors, man = self._pool("undirected")
        fp = self._fingerprint("cc", {}, man)
        start = self._resume(actors, checkpoint_dir, fp, "component") if resume else 0
        if start == 0:
            ray.get([a.init_value.remote("vid") for a in actors])
        self._broadcast_hubs(actors, man)

        it = start
        limit = max_iter if max_iter is not None else 1 << 30
        while it < limit:
            t0 = time.time()
            routed = self._scatter(actors, "scatter_min")
            changed = sum(
                ray.get([actors[j].gather_min.remote(routed[j], j) for j in range(self.P)])
            )
            self._broadcast_hubs(actors, man)
            metrics = {
                "algo": "cc",
                "iteration": it,
                "wall_s": time.time() - t0,
                "changed": int(changed),
            }
            ckpt.append_metrics(self.workdir, metrics)
            if checkpoint_dir:
                self._checkpoint(actors, checkpoint_dir, it, fp, "component", metrics)
            it += 1
            if changed == 0:
                break
        return self._collect(actors, "component", output_path, as_table)

    def label_propagation(
        self,
        *,
        max_iter: int = 5,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Synchronous LPA (SURVEY.md A.3), ties pinned to smallest label."""
        actors, man = self._pool("undirected_weighted")
        fp = self._fingerprint("lpa", {}, man)
        start = self._resume(actors, checkpoint_dir, fp, "label") if resume else 0
        if start == 0:
            ray.get([a.init_value.remote("vid") for a in actors])
        self._broadcast_hubs(actors, man)

        for it in range(start, max_iter):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_label_hist")
            changed = sum(
                ray.get(
                    [actors[j].gather_label_hist.remote(routed[j], j) for j in range(self.P)]
                )
            )
            self._broadcast_hubs(actors, man)
            metrics = {
                "algo": "lpa",
                "iteration": it,
                "wall_s": time.time() - t0,
                "changed": int(changed),
            }
            ckpt.append_metrics(self.workdir, metrics)
            if checkpoint_dir:
                self._checkpoint(actors, checkpoint_dir, it, fp, "label", metrics)
        return self._collect(actors, "label", output_path, as_table)

    def label_propagation_seeded(
        self,
        seed_vids,
        seed_labels,
        *,
        max_iter: int = 5,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Semi-supervised LPA (the hard-clamp variant of Zhu & Ghahramani
        2002): ``seed_vids`` carry FROZEN ``seed_labels`` (≥ 0); every
        other vertex starts unlabeled (−1) and adopts the Σw-majority
        label among its LABELED neighbors each synchronous round (ties →
        smallest label — the A.3 pinned rule; voteless vertices keep
        their label). Runs exactly ``max_iter`` rounds unless a round
        changes nothing (a fixpoint is stable, so the fixed-round SQL
        unroll matches either way). Seeds are a BROADCAST small side
        (driver-held arrays — the J3 contract); seed vids absent from
        the graph are ignored."""
        sv = np.asarray(seed_vids, dtype=np.int64)
        sl = np.asarray(seed_labels, dtype=np.int64)
        if len(sv) != len(sl):
            raise ValueError("seed_vids and seed_labels length mismatch")
        if (sl < 0).any():
            raise ValueError("seed labels must be non-negative")
        order = np.argsort(sv)
        sv, sl = sv[order], sl[order]
        if len(sv) > 1 and (sv[1:] == sv[:-1]).any():
            raise ValueError("duplicate seed vids")
        actors, man = self._pool("undirected_weighted")
        ray.get([a.lpa_seed_init.remote(sv, sl) for a in actors])
        self._broadcast_hubs(actors, man)
        for it in range(max_iter):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_label_seeded")
            changed = sum(
                ray.get(
                    [actors[j].gather_label_seeded.remote(routed[j], j)
                     for j in range(self.P)]
                )
            )
            self._broadcast_hubs(actors, man)
            ckpt.append_metrics(self.workdir, {
                "algo": "lpa_seeded", "iteration": it,
                "wall_s": time.time() - t0, "changed": int(changed),
            })
            if changed == 0:
                break
        return self._collect(actors, "label", output_path, as_table)

    def pagerank_tol(
        self,
        tol: float,
        *,
        alpha: float = 0.15,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """G2 — dynamic per-vertex PageRank, GraphX ``pageRank(tol)`` Pregel
        semantics: rank⁰ = α, Δ⁰ = α; only vertices with Δ > tol that
        received a message last superstep send Δ(v)·w/outdeg(v); receivers
        apply r += (1−α)·Σ and recompute Δ; terminate when no vertex is
        active. Numerically distinct from the static variant on
        slowly-converging components (SURVEY.md G2)."""
        if tol <= 0:
            raise ValueError("tol must be > 0 (Pregel guard relies on it)")
        actors, man = self._pool("directed")
        ray.get([a.init_pr_dynamic.remote(alpha, tol) for a in actors])
        self._broadcast_hub_deltas(actors, man)
        limit = max_iter if max_iter is not None else 1 << 30
        it = 0
        while it < limit:
            t0 = time.time()
            routed = self._scatter(actors, "scatter_pr_delta")
            active = sum(
                ray.get(
                    [actors[j].gather_pr_delta.remote(routed[j], j, alpha, tol) for j in range(self.P)]
                )
            )
            self._broadcast_hub_deltas(actors, man)
            ckpt.append_metrics(
                self.workdir,
                {"algo": "pagerank_tol", "iteration": it, "wall_s": time.time() - t0,
                 "active": int(active)},
            )
            it += 1
            if active == 0:
                break
        return self._collect(actors, "rank", output_path, as_table)

    def _broadcast_hub_deltas(self, actors, man) -> None:
        if not man.get("hubs"):
            return
        hubs = np.asarray(man["hubs"], dtype=np.int64)
        pairs = ray.get([a.hub_deltas.remote() for a in actors])
        vids_all = np.concatenate([p[0] for p in pairs])
        vals_all = np.concatenate([p[1] for p in pairs])
        order = np.argsort(vids_all)
        if not np.array_equal(vids_all[order], hubs):
            raise RuntimeError("hub vertices missing from vertex universe")
        ray.get([a.set_hub_deltas.remote(vals_all[order]) for a in actors])

    def personalized_pagerank(
        self,
        source: int,
        *,
        alpha: float = 0.15,
        max_iter: int = 20,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Personalized PageRank: reset mass lands only on ``source``
        (r⁰ = 1[v=s]; r' = α·1[v=s] + (1−α)·Σ w·r(u)/outdeg(u)) — the
        GraphFrames ``pageRank(sourceId=...)`` surface; pinned init
        documented here (SURVEY.md G1p)."""
        actors, man = self._pool("directed")
        ray.get([a.init_ppr.remote(int(source)) for a in actors])
        self._broadcast_hubs(actors, man)
        for it in range(max_iter):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_sum")
            res = ray.get(
                [
                    actors[j].gather_sum_reset.remote(routed[j], j, alpha, int(source))
                    for j in range(self.P)
                ]
            )
            self._broadcast_hubs(actors, man)
            ckpt.append_metrics(
                self.workdir,
                {"algo": "ppr", "iteration": it, "wall_s": time.time() - t0,
                 "l1_delta": float(sum(r[0] for r in res))},
            )
        return self._collect(actors, "rank", output_path, as_table)

    def parallel_personalized_pagerank(
        self,
        sources: list[int],
        *,
        alpha: float = 0.15,
        max_iter: int = 20,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """GraphX ``staticParallelPersonalizedPageRank`` surface: K sources
        in ONE superstep loop — rank state is an (n, K) matrix inside each
        shard, messages are (uniq_dst, K) blocks, per-edge work is one
        matrix row broadcast (K× message bytes, same shuffle count as one
        source). Semantics pinned to equal ``personalized_pagerank`` run
        per source (tested). Returns (vid, rank_0..rank_{K-1}), columns in
        ``sources`` order."""
        actors, man = self._pool("directed")
        srcs = [int(s) for s in sources]
        ray.get([a.init_ppr_multi.remote(srcs) for a in actors])
        self._broadcast_hubs(actors, man)
        for it in range(max_iter):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_sum_multi")
            deltas = ray.get(
                [
                    actors[j].gather_sum_reset_multi.remote(routed[j], j, alpha, srcs)
                    for j in range(self.P)
                ]
            )
            self._broadcast_hubs(actors, man)
            ckpt.append_metrics(
                self.workdir,
                {"algo": "ppr_multi", "iteration": it, "wall_s": time.time() - t0,
                 "l1_delta": float(sum(deltas)), "n_sources": len(srcs)},
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.ppr_multi_table.remote(srcs) for a in actors])
            )
        return self._result_ds(
            actors, "ppr_multi_table", (srcs,),
            output_path=output_path, label="ppr_multi",
        )

    def hits(
        self,
        *,
        max_iter: int = 20,
        normalize: bool = True,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """HITS hubs-and-authorities (Kleinberg, JACM 1999) — link-analysis
        breadth beyond the GraphX/GraphFrames surface (SURVEY.md §2 has no
        reference row; semantics pinned in SURVEY.md Appendix A.9).

        Per iteration: a(v) = Σ_{u→v} w·h(u) then h(u) = Σ_{u→v} w·a(v),
        each half-step 1-norm normalized when ``normalize=True`` (the
        scale-safe default: raw scores grow ~(Σdeg)^k). ``normalize=False``
        keeps raw scores, which are INTEGER-valued for integer weights and
        bit-exact in float64 while < 2^53 — the SQL-replay mode the driver
        oracle uses. The auth half-step is the standard forward
        scatter-gather; the hub half-step pulls a(v) for each src part's
        ghost destinations through the transposed ghost index — per-node
        traffic is ghost-sized in BOTH directions, so the multi-node story
        matches PageRank's. Returns a Dataset of (vid, hub, auth)."""
        actors, man = self._pool("directed")
        # max_iter stays OUT of the fingerprint: a run interrupted at
        # iteration k resumes into a longer run (same rule as pagerank)
        fp = self._fingerprint("hits", {"normalize": normalize}, man)
        start = 0
        if resume and checkpoint_dir:
            it0 = ckpt.latest_complete(checkpoint_dir, fp)
            if it0 is not None:
                ray.get(
                    [
                        a.load_hits_vectors.remote(ckpt.part_path(checkpoint_dir, it0, p))
                        for p, a in enumerate(actors)
                    ]
                )
                start = it0 + 1
        if start == 0:
            ray.get([a.init_hits.remote() for a in actors])
        self._broadcast_hubs(actors, man)  # h of salted hubs for the scatter
        m_total = sum(s["n_edges"] for s in ray.get([a.stats.remote() for a in actors]))
        for it in range(start, max_iter):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_hits_auth")
            a_sums = ray.get(
                [actors[j].gather_hits_auth.remote(routed[j], j) for j in range(self.P)]
            )
            norm_a = float(sum(a_sums)) if normalize else 0.0
            ray.get([a.scale_hits_auth.remote(norm_a) for a in actors])
            routed = self._scatter(actors, "scatter_hits_pull")
            res = ray.get(
                [actors[j].gather_hits_hub.remote(routed[j], j) for j in range(self.P)]
            )
            partials = [r[0] for r in res if r[0] is not None]
            merged = np.sum(partials, axis=0) if partials else None
            total_h = float(sum(r[1] for r in res)) + (
                float(merged.sum()) if merged is not None else 0.0
            )
            deltas = ray.get(
                [
                    a.finalize_hits_hub.remote(merged, total_h if normalize else 0.0)
                    for a in actors
                ]
            )
            self._broadcast_hubs(actors, man)
            metrics = {"algo": "hits", "iteration": it, "wall_s": time.time() - t0,
                       "edges": m_total, "l1_delta_h": float(sum(deltas))}
            ckpt.append_metrics(self.workdir, metrics)
            if checkpoint_dir:
                rows = ray.get(
                    [
                        a.write_hits_vectors.remote(ckpt.part_path(checkpoint_dir, it, p))
                        for p, a in enumerate(actors)
                    ]
                )
                ckpt.write_manifest(
                    checkpoint_dir, it, fp,
                    {str(p): r for p, r in enumerate(rows)}, metrics,
                )
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_hits.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_hits", output_path=output_path, label="hits",
        )

    def katz(
        self,
        *,
        inv_alpha: int = 8,
        iters: int = 4,
        beta_micro: int = 1_000_000,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Katz centrality through the CSR actor engine — the scale path
        for ``pipelines.katz.katz_fixed`` (round-4 verdict #1: the derive
        composition re-shuffles the full edge table 3× per iteration; this
        runs one ghost-sized exchange per iteration, the PageRank-superstep
        class). Same pinned fixed-point arithmetic: int64 micro-unit
        scores, x' = β + (Σ_in w·x) // inv_alpha on non-negative operands,
        bit-identical to ``katz_fixed`` (tested) and to the SQL-unroll
        oracle. Expressed through the generic ``pregel`` hook with
        ``halt="all"`` (synchronous full update — no-in-edge vertices
        take β each round, matching the left-join COALESCE 0).
        Returns (vid, katz_micro)."""
        inv = int(inv_alpha)
        beta = int(beta_micro)
        if inv <= 0:
            raise ValueError("inv_alpha must be a positive integer")

        def init(vids: np.ndarray) -> np.ndarray:
            return np.full(len(vids), beta, np.int64)

        def send(src_vals, w, outdeg_src):
            # CSR stores w as float64 (exact for count weights < 2^53);
            # the product must stay int64 for the exact-integer contract
            return w.astype(np.int64) * src_vals

        def vprog(old, msgs, got):
            # non-negative operands: numpy // == DuckDB truncating // ==
            # floor (the repo's pinned integer-division recipe)
            return beta + msgs // inv

        out = self.pregel(
            init, send, vprog, merge="sum", halt="all", max_iter=int(iters),
            variant="directed", checkpoint_dir=checkpoint_dir, resume=resume,
            output_path=output_path, as_table=as_table,
        )
        if as_table:
            return out.rename_columns(["vid", "katz_micro"])
        return out.rename_columns({"value": "katz_micro"})

    # odd golden-ratio constant — the classic Fibonacci-hashing multiplier;
    # any odd constant keeps x -> x*C a bijection mod 2^64
    _WL_C = np.uint64(0x9E3779B97F4A7C15)

    def wl_refine(
        self,
        *,
        rounds: int = 3,
        variant: str = "undirected",
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """1-WL color refinement (Weisfeiler–Leman vertex refinement) —
        the canonical graph-structure fingerprint used for isomorphism
        screening and GNN expressivity analysis (public semantics: Shervashidze
        et al., JMLR 2011, "Weisfeiler-Lehman graph kernels").

        Colors are 64-bit hashes updated synchronously for ``rounds``
        supersteps:

            c⁰(v)   = 1
            c^{i+1}(v) = mix64( c^i(v)·C  +  Σ_{u ∈ N_in(v)} mix64(c^i(u)) )

        with every operation in wrap-around uint64 arithmetic. The
        neighbor fold is an UNORDERED SUM of avalanche-mixed colors — an
        order-free multiset hash, so the result is independent of edge
        storage order, partitioning, and parallelism (and exactly
        replayable in SQL as HUGEINT sums mod 2^64). Two vertices whose
        rooted ``rounds``-hop in-neighborhood trees differ get different
        colors (up to the negligible 64-bit collision probability);
        classical WL stable partitions are reached once colors stop
        splitting. Edge weights are deliberately IGNORED (one message per
        stored edge — simple-graph refinement; parallel edges were already
        collapsed by the canonical edge builders).

        Runs through the generic ``pregel`` hook: one ghost-sized exchange
        per round, ``halt="all"`` (isolated vertices keep hashing their
        own color chain — Σ = 0). Returns (vid, color) with the color
        reinterpreted as int64 two's-complement for Parquet/SQL parity."""
        from graphx_ray.ids import mix64

        r = int(rounds)
        if r < 1:
            raise ValueError("rounds must be >= 1")
        C = self._WL_C

        def init(vids: np.ndarray) -> np.ndarray:
            return np.ones(len(vids), np.uint64)

        def send(src_vals, w, outdeg_src):
            return mix64(src_vals)

        def vprog(old, msgs, got):
            with np.errstate(over="ignore"):
                return mix64(old * C + msgs.astype(np.uint64))

        out = self.pregel(
            init, send, vprog, merge="sum", halt="all", max_iter=r,
            variant=variant, output_path=output_path, as_table=as_table,
        )
        if as_table:
            vid = out["vid"]
            color = out["value"].to_numpy().astype(np.uint64).view(np.int64)
            return pa.table({"vid": vid, "color": pa.array(color)})

        def to_signed(b: pa.Table) -> pa.Table:
            c = b["value"].to_numpy().astype(np.uint64).view(np.int64)
            return pa.table({"vid": b["vid"], "color": pa.array(c)})

        return out.map_batches(to_signed, batch_format="pyarrow", zero_copy_batch=True)

    def eigenvector_centrality(
        self,
        *,
        iters: int = 12,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Eigenvector centrality of the UNDIRECTED weighted view (the
        LPA/PIC influence graph) as a fixed-point shifted power iteration,
        exact-integer and SQL-replayable like ``katz``/``pic``:

        - shift = 1 + ceil(max over edges of √(d(u)·d(v))) — the classic
          spectral bound λ₁(A) ≤ max √(d(u)d(v)) (TIGHT on hub graphs,
          where the naive max-degree divisor √n-overshoots λ₁ and decays
          the values to nothing). d = weighted degree of the symmetrized
          list (one keyed reduce + two bucketed degree joins; the driver
          holds two ints).
        - Iterating on (A + I)/shift: the +I shift makes the dominant
          eigenvalue strictly dominant on bipartite graphs too (A
          symmetric ⇒ λ_min ≥ −λ₁ ⇒ λ₁+1 > |λ_min+1|), so the direction
          converges instead of oscillating; λ(A+I) ≤ λ₁+1 ≤ shift keeps
          the iteration non-expanding in ℓ2.
        - x⁰ = scale = 2⁶² // ((D+1)·(⌊√n⌋+2)) with D = max weighted
          degree: ℓ2 non-expansion bounds every entry by scale·√n, so the
          per-vertex gather Σ w·x + x ≤ (D+1)·scale·√n < 2⁶² stays exact
          int64; x' = (Σ_in w·x + x) // shift on non-negative operands
          (floor == truncation, both sides). √ is IEEE double sqrt +
          floor/ceil on both sides — exact below 2⁵² (documented bound).

        Returns (vid, eig_fix) — callers normalize; ranks and ratios are
        what eigenvector centrality means."""
        from graphx_ray.stages.derive import grouped_reduce
        from graphx_ray.stages.motif import bucket_join

        ew = self._with_weight(self.edges)

        def both(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy()
            d = batch["dst"].to_numpy()
            w = batch["w"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "v": pa.array(np.concatenate([s, d]), type=pa.int64()),
                    "wt": pa.array(np.concatenate([w, w])),
                }
            )

        deg = grouped_reduce(
            ew.map_batches(both, batch_format="pyarrow", zero_copy_batch=True),
            ["v"], sum_col="wt", num_partitions=self.P,
        ).materialize()  # consumed 3×: max, count, degree joins
        big_d = int(deg.max("wt") or 0)
        n_verts = int(deg.count())

        def dren(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"dv": batch["v"].cast(pa.int64()),
                 "dw": batch["wt"].cast(pa.int64())}
            )

        degs = deg.map_batches(dren, batch_format="pyarrow", zero_copy_batch=True)
        j1 = bucket_join(
            ew.select_columns(["src", "dst"]), degs, on="src", right_on="dv",
            how="inner", num_partitions=self.P,
        )

        def r1(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"src": batch["src"], "dst": batch["dst"],
                 "du": batch["dw"].cast(pa.int64())}
            )

        j2 = bucket_join(
            j1.map_batches(r1, batch_format="pyarrow", zero_copy_batch=True),
            degs, on="dst", right_on="dv", how="inner", num_partitions=self.P,
        )

        def edge_bound(batch: pa.Table) -> pa.Table:
            du = batch["du"].to_numpy().astype(np.float64)
            dv = batch["dw"].to_numpy().astype(np.float64)
            if not len(du):
                return pa.table({"b": pa.array([], pa.int64())})
            b = int(np.ceil(np.sqrt(du * dv)).max())
            return pa.table({"b": pa.array([b], pa.int64())})

        bound = int(
            j2.map_batches(
                edge_bound, batch_format="pyarrow", zero_copy_batch=True
            ).max("b")
            or 0
        )
        shift = bound + 1
        scale = (1 << 62) // max(
            (big_d + 1) * (int(np.floor(np.sqrt(float(max(n_verts, 1))))) + 2), 1
        )

        def init(vids: np.ndarray) -> np.ndarray:
            return np.full(len(vids), scale, np.int64)

        def send(src_vals, w, outdeg_src):
            return w.astype(np.int64) * src_vals

        def vprog(old, msgs, got):
            return (msgs + old) // shift

        out = self.pregel(
            init, send, vprog, merge="sum", halt="all", max_iter=int(iters),
            variant="undirected_weighted", output_path=output_path,
            as_table=as_table,
        )
        if as_table:
            return out.rename_columns(["vid", "eig_fix"])
        return out.rename_columns({"value": "eig_fix"})

    def random_walks(
        self,
        *,
        walks_per_vertex: int = 1,
        length: int = 10,
        seed: int = 42,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Deterministic seeded random walks (SURVEY.md A.10) — the
        embedding-pipeline sampling primitive (DeepWalk/node2vec input).
        ``walks_per_vertex`` walks start at EVERY vertex; step t draws the
        next hop with h = mix64(base + t), idx = h mod Σw(u) over the
        (src,dst)-aggregated adjacency sorted by dst (weight-proportional,
        parallel-edge multiplicity counts); walks terminate at out-degree-0
        vertices. Every draw is a pure function of (seed, start, walk, t),
        so results are parallelism-invariant and SQL-replayable.

        Walk state lives with a shard holding its current vertex's
        adjacency (the owner; for salted hubs, a draw-hash-spread shard —
        every shard holds the one-time merged hub-adjacency broadcast, see
        ``_broadcast_walk_hub_adj``); each step exchanges constant-size
        (start, walk, next) packs — O(active walks) traffic, never
        graph-sized. Returns a Dataset of (start_vid, walk, step, vid)
        rows, one per visited position."""
        actors, man = self._pool("directed")
        self._broadcast_walk_hub_adj(actors, man)
        # Dataset mode streams visit rows to per-(part, step) parquet as the
        # walks advance — actor memory stays O(active walks), never
        # O(walks × length); as_table buffers in-actor (small graphs only).
        rows_dir = None
        if not as_table:
            rows_dir = output_path or os.path.join(
                self.workdir, "results", f"walks-{self._rseq}"
            )
            self._rseq += 1
            import shutil

            shutil.rmtree(rows_dir, ignore_errors=True)  # no stale part leak-in
        alive = sum(
            ray.get(
                [a.init_walks.remote(walks_per_vertex, seed, rows_dir) for a in actors]
            )
        )
        for t in range(1, length + 1):
            if alive == 0:
                break
            t0 = time.time()
            routed = self._scatter(actors, "walk_scatter", t)
            alive = sum(
                ray.get(
                    [actors[j].walk_gather.remote(routed[j], j, t) for j in range(self.P)]
                )
            )
            ckpt.append_metrics(
                self.workdir,
                {"algo": "random_walks", "iteration": t,
                 "wall_s": time.time() - t0, "active_walks": int(alive)},
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.walk_rows_table.remote() for a in actors])
            )
        return rd.read_parquet(rows_dir)

    def node2vec_walks(
        self,
        *,
        p: float = 1.0,
        q: float = 1.0,
        walks_per_vertex: int = 1,
        length: int = 10,
        seed: int = 42,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Second-order node2vec biased walks (SURVEY.md A.13; Grover &
        Leskovec 2016). Step 1 is a raw-weight draw (no prev vertex);
        step t ≥ 2 from v with previous vertex u weights candidate x by
        w(v,x) · α where α = 1/p if x = u (return), 1 if the edge u→x
        exists (common neighbor), else 1/q (exploration). p and q are
        taken as EXACT decimal fractions and folded into integer
        multipliers reduced by their gcd, so every hop is a pure
        integer function of (seed, start, walk, t) — deterministic,
        parallelism-invariant and SQL-replayable. With p = q = 1 the
        multipliers are (1, 1, 1) and the output is bit-identical to
        ``random_walks``.

        Walk state lives with a shard holding its current vertex's
        adjacency (salted hubs: draw-hash-spread over the one-time hub
        broadcast, see ``_broadcast_walk_hub_adj``); each step exchanges
        (start, walk, next, prev, N(prev)) packs — O(deg(prev)) payload
        per walk, the standard distributed-node2vec tradeoff (no second
        membership-probe exchange). A hub prev ships an EMPTY sentinel
        list instead: the receiver resolves N(prev) from its broadcast
        copy, so hub degree never rides the wire per walk. Returns a
        Dataset of (start_vid, walk, step, vid) rows."""
        import math
        from fractions import Fraction

        fp = Fraction(str(p))
        fq = Fraction(str(q))
        if fp <= 0 or fq <= 0:
            raise ValueError("node2vec_walks: p and q must be positive")
        m_ret = fp.denominator * fq.numerator
        m_com = fp.numerator * fq.numerator
        m_far = fp.numerator * fq.denominator
        g = math.gcd(math.gcd(m_ret, m_com), m_far)
        bias = (m_ret // g, m_com // g, m_far // g)
        actors, man = self._pool("directed")
        self._broadcast_walk_hub_adj(actors, man)
        rows_dir = None
        if not as_table:
            rows_dir = output_path or os.path.join(
                self.workdir, "results", f"n2v-{self._rseq}"
            )
            self._rseq += 1
            import shutil

            shutil.rmtree(rows_dir, ignore_errors=True)  # no stale part leak-in
        alive = sum(
            ray.get(
                [
                    a.init_n2v_walks.remote(walks_per_vertex, seed, bias, rows_dir)
                    for a in actors
                ]
            )
        )
        for t in range(1, length + 1):
            if alive == 0:
                break
            t0 = time.time()
            routed = self._scatter(actors, "n2v_scatter", t)
            alive = sum(
                ray.get(
                    [actors[j].n2v_gather.remote(routed[j], j, t) for j in range(self.P)]
                )
            )
            ckpt.append_metrics(
                self.workdir,
                {"algo": "node2vec_walks", "iteration": t,
                 "wall_s": time.time() - t0, "active_walks": int(alive)},
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.walk_rows_table.remote() for a in actors])
            )
        return rd.read_parquet(rows_dir)

    def power_iteration_clustering(
        self,
        *,
        k: int = 4,
        iters: int = 3,
        kmeans_iters: int = 2,
        scale_micro: int = 1_000_000,
    ):
        """GraphFrames ``powerIterationClustering`` — exact-integer PIC
        (Lin & Cohen 2010) over the undirected weighted view: ``iters``
        W·D⁻¹ pushes through the pregel hook, then deterministic integer
        1-D Lloyd on the embedding. Pinned semantics + SQL replayability
        in ``pipelines/pic.py``. Returns (vid, pic_micro, cluster)."""
        from graphx_ray.pipelines.pic import _int_kmeans_1d, _pic_embedding

        emb = _pic_embedding(self, iters=iters, scale_micro=scale_micro)
        return _int_kmeans_1d(emb, k=k, iters=kmeans_iters)

    def _broadcast_walk_hub_adj(self, actors, man) -> None:
        """One-time hub-adjacency broadcast for the walk family (round-5,
        lifting the round-4 unsalted-hub restriction): merge each shard's
        aggregated slice of the salted hub adjacency (a (hub, dst) pair
        lives in exactly one shard — dst-hash routing), sort by
        (hub, dst) — exactly the unsalted per-vertex dst-sorted order —
        and ship ONE ``ray.put`` object every shard adopts. Hub-resident
        draws then resolve on whichever shard holds the walk; results are
        bit-identical to an unsalted build (tested). The adjacency is
        static, so this runs once per walk call, not per superstep."""
        if not man.get("hubs"):
            return
        slices = ray.get([a.walk_hub_adj_slice.remote() for a in actors])
        hidx = np.concatenate([s[0] for s in slices])
        hdst = np.concatenate([s[1] for s in slices])
        hw = np.concatenate([s[2] for s in slices]).astype(np.uint64)
        order = np.lexsort((hdst, hidx))
        ref = ray.put((hidx[order], hdst[order], hw[order]))
        ray.get([a.set_walk_hub_adj.remote(ref) for a in actors])

    def maximal_independent_set(
        self,
        *,
        seed: int = 42,
        max_rounds: int = 100,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Deterministic Luby MIS over the canonical undirected simple
        graph (SURVEY.md A.12; self-loops dropped by canonicalization).
        Per round: active vertices draw p_r(v) = mix64(mix64(seed ^ r) ^ v)
        and join the MIS iff strictly above every active neighbor (ties ⇒
        neither joins; next round's fresh priorities break them); MIS
        neighbors deactivate. Two max-merge exchanges per round over the
        existing label scatter — ghost-sized traffic, salted hubs ride the
        ordinary hub broadcast. O(log n) rounds w.h.p. Returns a Dataset
        of (vid, in_mis ∈ {0,1}) covering the whole vertex universe."""
        from graphx_ray.ids import mix64 as _mix

        actors, man = self._pool("undirected")
        ray.get([a.init_mis.remote() for a in actors])
        for r in range(max_rounds):
            t0 = time.time()
            c = int(_mix(np.uint64(seed) ^ np.uint64(r)))
            ray.get([a.mis_stage_priority.remote(c) for a in actors])
            self._broadcast_hubs(actors, man)
            routed = self._scatter(actors, "scatter_max")
            joined = sum(
                ray.get(
                    [actors[j].gather_mis_join.remote(routed[j], j) for j in range(self.P)]
                )
            )
            ray.get([a.mis_stage_flag.remote() for a in actors])
            self._broadcast_hubs(actors, man)
            routed = self._scatter(actors, "scatter_max")
            active = sum(
                ray.get(
                    [actors[j].gather_mis_out.remote(routed[j], j) for j in range(self.P)]
                )
            )
            ckpt.append_metrics(
                self.workdir,
                {"algo": "mis", "iteration": r, "wall_s": time.time() - t0,
                 "joined": int(joined), "active": int(active)},
            )
            if active == 0:
                break
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_mis.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_mis", output_path=output_path, label="mis",
        )

    def salsa(
        self,
        *,
        iters: int = 3,
        scale: int = 1_000_000,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """SALSA link analysis (Lempel & Moran, WWW 2000; SURVEY.md A.18)
        — HITS with random-walk normalization, truncated to ``iters``
        iterations from h₀ = scale, in exact int64 micro-units with
        per-edge floor division (SQL-replayable; mass non-increasing, so
        values stay < n·scale·w_max — valid while that is < 2^63).
        Per iteration: auth a(v) = Σ floor(w·h(u)/outdeg(u)) (the
        PR-shaped forward scatter), hub h(u) = Σ floor(w·a(v)/indeg(v))
        (the HITS reverse pull; indeg(dst) cached per edge once at init).
        Returns (vid, hub, auth)."""
        actors, man = self._pool("directed")
        if man.get("hubs"):
            # merged hub outdeg must be installed before init casts it
            partials = ray.get([a.hub_outdeg_part.remote() for a in actors])
            ray.get([a.set_hub_outdeg.remote(np.sum(partials, axis=0)) for a in actors])
        ray.get([a.init_salsa.remote(scale) for a in actors])
        # one-time indeg exchange + static per-edge indeg cache
        routed = self._scatter(actors, "scatter_salsa_indeg")
        ray.get([actors[j].gather_salsa_indeg.remote(routed[j], j) for j in range(self.P)])
        routed = self._scatter(actors, "pull_salsa_indeg")
        ray.get([actors[j].cache_salsa_indeg.remote(routed[j], j) for j in range(self.P)])
        self._broadcast_hubs(actors, man)  # h of salted hubs
        for it in range(iters):
            t0 = time.time()
            routed = self._scatter(actors, "scatter_salsa_auth")
            ray.get(
                [actors[j].gather_salsa_auth.remote(routed[j], j) for j in range(self.P)]
            )
            routed = self._scatter(actors, "scatter_salsa_pull")
            parts = ray.get(
                [actors[j].gather_salsa_hub.remote(routed[j], j) for j in range(self.P)]
            )
            partials = [p for p in parts if p is not None]
            merged = np.sum(partials, axis=0) if partials else None
            ray.get([a.finalize_salsa_hub.remote(merged) for a in actors])
            self._broadcast_hubs(actors, man)
            ckpt.append_metrics(
                self.workdir,
                {"algo": "salsa", "iteration": it, "wall_s": time.time() - t0},
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_salsa.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_salsa", output_path=output_path, label="salsa",
        )

    def maximal_matching(
        self,
        *,
        seed: int = 42,
        max_rounds: int = 100,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Deterministic local-max maximal matching (SURVEY.md A.17; the
        Israeli–Itai / Preis family, synchronous) over the canonical
        undirected simple graph. Per round, every active edge draws the
        globally-unique tuple (p, cu, cv) with
        p = (mix64(mix64(C_r ^ cu) ^ cv) >> 1) + 1, C_r = mix64(seed ^ r),
        and joins iff its tuple is the lexicographic max at BOTH
        endpoints; matched vertices deactivate their edges. Two
        ghost-sized reverse pulls per round; the round's globally-max
        active edge always wins, so the loop terminates (expected
        O(log m) rounds). Returns (vid, partner) with partner = −1 for
        unmatched vertices."""
        from graphx_ray.ids import mix64 as _mix

        actors, man = self._pool("undirected")
        ray.get([a.init_matching.remote() for a in actors])
        hubs = np.asarray(man.get("hubs", []), dtype=np.int64)
        fp = self._fingerprint("matching", {"seed": seed}, man)
        start = self._resume(actors, checkpoint_dir, fp, "partner") if resume else 0
        self._broadcast_hubs(actors, man)  # partner state of salted hubs
        for r in range(start, max_rounds):
            t0 = time.time()
            c = int(_mix(np.uint64(seed) ^ np.uint64(r)))
            routed = self._scatter(actors, "match_pull_flags")
            actives = ray.get(
                [
                    actors[j].match_stage_priorities.remote(c, routed[j], j)
                    for j in range(self.P)
                ]
            )
            n_active = int(sum(actives))
            if n_active == 0:
                break
            if len(hubs):
                # tuple-max merge of the per-shard hub best partials
                parts = [
                    p for p in ray.get([a.match_hub_best_partial.remote() for a in actors])
                    if p is not None
                ]
                hp = np.zeros(len(hubs), np.uint64)
                hu = np.full(len(hubs), -1, np.int64)
                hv = np.full(len(hubs), -1, np.int64)
                for bp, bu, bv in parts:
                    better = (bp > hp) | (
                        (bp == hp) & ((bu > hu) | ((bu == hu) & (bv > hv)))
                    )
                    hp[better], hu[better], hv[better] = bp[better], bu[better], bv[better]
                ray.get([a.match_install_hub_best.remote(hp, hu, hv) for a in actors])
            routed = self._scatter(actors, "match_pull_best")
            hub_parts = ray.get(
                [actors[j].match_resolve.remote(routed[j], j) for j in range(self.P)]
            )
            if len(hubs):
                pairs = [p for p in hub_parts if p is not None]
                if pairs:
                    idx = np.concatenate([p[0] for p in pairs])
                    ptn = np.concatenate([p[1] for p in pairs])
                    order = np.argsort(idx)  # winners are disjoint per hub
                    ray.get(
                        [
                            a.match_install_hub_partners.remote(idx[order], ptn[order])
                            for a in actors
                        ]
                    )
            self._broadcast_hubs(actors, man)
            ckpt.append_metrics(
                self.workdir,
                {"algo": "matching", "iteration": r,
                 "wall_s": time.time() - t0, "active_edges": n_active},
            )
            if checkpoint_dir:
                self._checkpoint(
                    actors, checkpoint_dir, r, fp, "partner",
                    {"active_edges": n_active},
                )
        return self._result_ds(
            actors, "result_table_matching", output_path=output_path, label="matching",
        ) if not as_table else pa.concat_tables(
            ray.get([a.result_table_matching.remote() for a in actors])
        )

    def louvain(
        self,
        *,
        max_rounds: int = 10,
        weighted: bool = False,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Synchronous deterministic Louvain local-move rounds (SURVEY.md
        A.16; Blondel et al. 2008 modularity, the minimum-label
        synchronous variant of Lu–Halappanavar–Kalyanaraman 2015).

        Unweighted (default): the canonical undirected simple graph —
        parallel edges collapse, self-loops drop, w ≡ 1. ``weighted=True``:
        every directed edge contributes its weight in both directions and
        self-loops stay (they count 2w in k(v), nothing in w(v→·)) — the
        view multilevel contraction feeds back in.

        Per round (all exact int64, valid while 2m·k_max < 2^63):
        vol-up/vol-down community-volume exchange keyed by owner(C) =
        part_of(C), then one LPA-shaped move scatter carrying
        (label, vol(label), singleton-flag). Each vertex argmaxes
        Δ̂(B) = 2m·w(v→B) − k·vol′(B) over neighbor communities, ties →
        smallest B, moves iff Δ̂(B) > Δ̂(stay), with the singleton
        swap-guard: a singleton joins a singleton only when the target id
        is smaller (kills the classic synchronous two-cycle). Stops early
        when a round moves nothing. Returns (vid, community)."""
        from graphx_ray.ids import part_of as _part_of

        variant = "undirected_weighted" if weighted else "undirected"
        actors, man = self._pool(variant)
        hub_k = None
        if man.get("hubs"):
            partials = ray.get([a.hub_outdeg_part.remote() for a in actors])
            hub_k = np.rint(np.sum(partials, axis=0)).astype(np.int64)
        ray.get([a.init_louvain.remote() for a in actors])
        two_m = sum(ray.get([a.louvain_two_m_part.remote() for a in actors]))
        hubs = np.asarray(man.get("hubs", []), dtype=np.int64)
        # static louvain state (lv_k, w_eff) is rebuilt by init; resume
        # only restores the label vector (the LPA rule: max_rounds stays
        # OUT of the fingerprint — a run interrupted at round k resumes
        # into a longer run; converged rounds are no-ops, so resuming
        # past convergence is bit-identical)
        fp = self._fingerprint("louvain", {"weighted": weighted}, man)
        start = self._resume(actors, checkpoint_dir, fp, "community") if resume else 0

        for r in range(start, max_rounds):
            t0 = time.time()
            # community-volume exchange (vol-up, vol-down)
            routed = self._scatter(actors, "louvain_vol_scatter")
            if self.route == "per_dest" and self.P > 1:
                gf = [
                    actors[j].louvain_vol_gather.options(num_returns=self.P)
                    .remote(routed[j], j)
                    for j in range(self.P)
                ]
                reply = [[gf[j][i] for j in range(self.P)] for i in range(self.P)]
            else:
                gf = [
                    actors[j].louvain_vol_gather.remote(routed[j], j)
                    for j in range(self.P)
                ]
                reply = [gf] * self.P
            ray.get(
                [actors[i].louvain_vol_absorb.remote(reply[i], i) for i in range(self.P)]
            )
            if len(hubs):
                # hub labels to every shard, then each hub's community
                # volume + singleton flag fetched from the volume's owner
                pairs = ray.get([a.hub_ranks.remote() for a in actors])
                vids = np.concatenate([p[0] for p in pairs])
                labs = np.concatenate([p[1] for p in pairs])
                order = np.argsort(vids)
                if not np.array_equal(vids[order], hubs):
                    raise RuntimeError("hub vertices missing from vertex universe")
                hub_lab = labs[order].astype(np.int64)
                ray.get([a.set_hub_vals.remote(hub_lab) for a in actors])
                owner = _part_of(hub_lab, self.P)
                vols = np.zeros(len(hub_lab), np.int64)
                futs = []
                for p in np.unique(owner):
                    idx = np.flatnonzero(owner == p)
                    futs.append(
                        (idx, actors[p].louvain_lookup_vols.remote(hub_lab[idx]))
                    )
                for idx, fut in futs:
                    vols[idx] = ray.get(fut)
                flags = vols == hub_k
                ray.get([a.set_louvain_hub_state.remote(vols, flags) for a in actors])
            # local-move exchange
            routed = self._scatter(actors, "louvain_move_scatter")
            moved = sum(
                ray.get(
                    [
                        actors[j].louvain_move_gather.remote(routed[j], j, two_m)
                        for j in range(self.P)
                    ]
                )
            )
            ckpt.append_metrics(
                self.workdir,
                {"algo": "louvain", "iteration": r,
                 "wall_s": time.time() - t0, "moved": int(moved)},
            )
            if checkpoint_dir:
                self._checkpoint(
                    actors, checkpoint_dir, r, fp, "community",
                    {"moved": int(moved)},
                )
            if moved == 0:
                break
        return self._collect(actors, "community", output_path, as_table)

    def greedy_coloring(
        self,
        *,
        seed: int = 42,
        max_colors: int = 1024,
        max_rounds: int = 100,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Iterated-MIS greedy graph coloring (SURVEY.md A.14; the
        Luby/Jones–Plassmann family) over the canonical undirected simple
        graph. Color c runs one full deterministic Luby MIS (A.12) over
        the still-uncolored vertices — round r of color c draws priority
        p(v) = mix64(mix64(mix64(seed ^ c) ^ r) ^ v), so every color
        class is a pure function of (seed); colored vertices stage the
        max-merge identity 0 and neither join nor block. Each MIS is
        independent within the uncolored subgraph, hence no edge is
        monochromatic (property-tested); expected O(Δ · log n) rounds
        total. Returns a Dataset of (vid, color) with color ∈ [0,
        #colors used); vertices left uncolored past ``max_colors`` keep
        color −1 under a RuntimeWarning (pathological only: max_colors
        below the graph's iterated-MIS color count)."""
        import warnings

        from graphx_ray.ids import mix64 as _mix

        actors, man = self._pool("undirected")
        ray.get([a.init_coloring.remote() for a in actors])
        remaining = -1
        for c in range(max_colors):
            cands = sum(ray.get([a.color_begin.remote() for a in actors]))
            if cands == 0:
                remaining = 0
                break
            t0 = time.time()
            cc = _mix(np.uint64(seed) ^ np.uint64(c))
            for r in range(max_rounds):
                rc = int(_mix(cc ^ np.uint64(r)))
                ray.get([a.mis_stage_priority.remote(rc) for a in actors])
                self._broadcast_hubs(actors, man)
                routed = self._scatter(actors, "scatter_max")
                ray.get(
                    [actors[j].gather_mis_join.remote(routed[j], j) for j in range(self.P)]
                )
                ray.get([a.mis_stage_flag.remote() for a in actors])
                self._broadcast_hubs(actors, man)
                routed = self._scatter(actors, "scatter_max")
                active = sum(
                    ray.get(
                        [actors[j].gather_mis_out.remote(routed[j], j) for j in range(self.P)]
                    )
                )
                if active == 0:
                    break
            remaining = sum(ray.get([a.color_assign.remote(c) for a in actors]))
            ckpt.append_metrics(
                self.workdir,
                {"algo": "greedy_coloring", "iteration": c,
                 "wall_s": time.time() - t0, "uncolored": int(remaining)},
            )
            if remaining == 0:
                break
        if remaining != 0:
            warnings.warn(
                f"greedy_coloring: {remaining} vertices uncolored after "
                f"max_colors={max_colors}; they carry color -1",
                RuntimeWarning,
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_coloring.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_coloring",
            output_path=output_path, label="coloring",
        )

    def pregel(
        self,
        init,
        send_msg,
        vprog,
        *,
        merge: str = "sum",
        initial_msg=None,
        max_iter: int = 20,
        variant: str = "directed",
        halt: str = "changed",
        checkpoint_dir: str | None = None,
        resume: bool = False,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """The GraphX ``Pregel.apply`` user surface, vectorized:

        - ``init(vids: np.ndarray) -> np.ndarray`` — initial vertex values
          (1-D; dtype picked by the user).
        - ``send_msg(src_vals, w, outdeg_src) -> msgs`` — per-edge messages,
          vectorized over a shard's edge slice (all three args are aligned
          per-edge arrays; outdeg enables PageRank-style normalization).
        - ``vprog(old_vals, msgs, got) -> new_vals`` — vectorized vertex
          program; committed ONLY where ``got`` (GraphX: vprog runs on
          message receivers). ``msgs`` holds the merge identity where no
          message arrived.
        - ``merge`` ∈ {sum, min, max}; partials pre-aggregate per
          destination inside the sender (reduceat combiner) — the merge
          must be a commutative, associative ufunc reduction.
        - ``initial_msg``: GraphX semantics — applied through ``vprog`` to
          every vertex before superstep 1.
        - ``halt="changed"`` (default): a vertex sends iff its value
          changed last superstep; terminate when no value changed. GraphX
          expresses the same pruning via triplet-filtered ``sendMsg``;
          src-changed is the vectorized equivalent (documented deviation).
          ``halt="all"``: every edge sends every superstep, vprog commits
          for EVERY vertex (synchronous full update), terminate at
          ``max_iter`` — the static-algorithm mode (static PageRank is
          exactly expressible: no-in-edge vertices take α each round).

        The built-in algorithms ride the same scatter/gather machinery;
        this hook exposes it for user extensions (tested by re-deriving CC
        and static PageRank through it).

        ``checkpoint_dir``/``resume`` follow the S3 discipline of the
        built-ins: per-superstep (value, changed) part files + manifest,
        bit-identical replay from the newest complete iteration. The
        fingerprint includes a digest of the pickled user callables, so a
        resume against edited callables safely starts fresh instead of
        mixing semantics."""
        if merge not in ("sum", "min", "max"):
            raise ValueError(merge)
        if halt not in ("changed", "all"):
            raise ValueError(halt)
        actors, man = self._pool(variant)
        fp = None
        start = 0
        if checkpoint_dir:
            import hashlib

            from ray import cloudpickle

            digest = hashlib.sha256(
                cloudpickle.dumps((init, send_msg, vprog))
            ).hexdigest()[:16]
            fp = self._fingerprint(
                "pregel",
                {"merge": merge, "halt": halt, "initial_msg": repr(initial_msg),
                 "fns": digest},
                man,
            )
            if resume:
                it0 = ckpt.latest_complete(checkpoint_dir, fp)
                if it0 is not None:
                    ray.get(
                        [
                            a.load_pregel_state.remote(ckpt.part_path(checkpoint_dir, it0, p))
                            for p, a in enumerate(actors)
                        ]
                    )
                    start = it0 + 1
        if start == 0:
            ray.get([a.pregel_init.remote(init, initial_msg, vprog) for a in actors])
        it = start
        while it < max_iter:
            t0 = time.time()
            self._broadcast_pregel_hubs(actors, man)
            routed = self._scatter(actors, "scatter_pregel", send_msg, merge, halt)
            changed = sum(
                ray.get(
                    [actors[j].gather_pregel.remote(routed[j], j, vprog, merge, halt) for j in range(self.P)]
                )
            )
            metrics = {"algo": "pregel", "iteration": it, "wall_s": time.time() - t0,
                       "changed": int(changed)}
            ckpt.append_metrics(self.workdir, metrics)
            if checkpoint_dir:
                rows = ray.get(
                    [
                        a.write_pregel_state.remote(ckpt.part_path(checkpoint_dir, it, p))
                        for p, a in enumerate(actors)
                    ]
                )
                ckpt.write_manifest(
                    checkpoint_dir, it, fp, {str(p): r for p, r in enumerate(rows)}, metrics
                )
            it += 1
            if halt == "changed" and changed == 0:
                break
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table.remote("value") for a in actors])
            )
        return self._result_ds(
            actors, "result_table", ("value",),
            output_path=output_path, label="pregel",
        )

    def _broadcast_pregel_hubs(self, actors, man) -> None:
        if not man.get("hubs"):
            return
        hubs = np.asarray(man["hubs"], dtype=np.int64)
        triples = ray.get([a.pregel_hub_state.remote() for a in actors])
        vids_all = np.concatenate([t[0] for t in triples])
        vals_all = np.concatenate([t[1] for t in triples])
        chg_all = np.concatenate([t[2] for t in triples])
        order = np.argsort(vids_all)
        if not np.array_equal(vids_all[order], hubs):
            raise RuntimeError("hub vertices missing from vertex universe")
        ray.get(
            [a.set_pregel_hub_state.remote(vals_all[order], chg_all[order]) for a in actors]
        )

    def collect_neighbor_ids(self, *, direction: str = "out", num_partitions: int = 16):
        # GraphX leftZipJoin behavior when the graph has a vertex table:
        # edge-less vertices appear with an empty neighbor list
        from graphx_ray.stages.structural import collect_neighbor_ids as _cni

        return _cni(self.edges, direction=direction, vertices=self.vertices,
                    num_partitions=num_partitions)

    def bfs_paths(
        self,
        from_expr: str,
        to_expr: str,
        *,
        max_path_length: int = 10,
        num_partitions: int = 16,
    ) -> Dataset:
        """GraphFrames ``bfs(fromExpr, toExpr)``: all shortest directed
        paths between the expression-selected vertex sets — (from, to,
        hops, path) rows; see pipelines/bfs_paths.py for pinned semantics."""
        if self.vertices is None:
            raise ValueError("bfs_paths needs a vertex table to evaluate the expressions")
        from graphx_ray.pipelines.bfs_paths import bfs_paths as _bp

        return _bp(
            self.edges, self.vertices, from_expr, to_expr,
            max_path_length=max_path_length, num_partitions=num_partitions,
        )

    def bfs(self, source: int, *, max_iter: int | None = None,
            output_path: str | None = None, as_table: bool = False):
        """G8 — BFS from ``source`` over the canonical undirected graph:
        (vid, dist, parent). dist = hop count (−1 unreachable); parent =
        the smallest-vid neighbor at dist−1 (−1 for the source and
        unreachable vertices) — computed as one extra lexicographic-min
        superstep after the min-plus fixpoint."""
        actors, man = self._pool("undirected")
        ray.get([a.init_dist.remote(int(source)) for a in actors])
        self._broadcast_hubs(actors, man)
        it = 0
        limit = max_iter if max_iter is not None else 1 << 30
        while it < limit:
            routed = self._scatter(actors, "scatter_minplus")
            changed = sum(
                ray.get([actors[j].gather_min.remote(routed[j], j) for j in range(self.P)])
            )
            self._broadcast_hubs(actors, man)
            it += 1
            if changed == 0:
                break
        routed = self._scatter(actors, "scatter_parent")
        ray.get([actors[j].gather_parent.remote(routed[j], j) for j in range(self.P)])
        if as_table:
            return pa.concat_tables(
                ray.get([a.parent_table.remote() for a in actors])
            )
        return self._result_ds(
            actors, "parent_table", output_path=output_path, label="bfs",
        )

    def diameter_lower_bound(self, *, start: int | None = None) -> pa.Table:
        """Double-sweep BFS diameter lower bound (Magnien, Latapy & Habib
        2009 — the standard cheap bound, exact on trees): BFS from
        ``start`` (default: the smallest vid), re-BFS from the farthest
        reached vertex; the second eccentricity lower-bounds the
        diameter. Tie pinning: the farthest vertex is the SMALLEST vid at
        maximum distance, so the result is unique and SQL-replayable.

        Returns ONE row (start, far1, ecc1, far2, diameter_lb) — a
        model-sized scalar table; each sweep's argmax folds from
        per-batch partials (≤ one row per block on the driver)."""
        import numpy as np

        def _minvid() -> int:
            def part(batch: pa.Table) -> pa.Table:
                m = min(int(batch["src"].to_numpy().min()),
                        int(batch["dst"].to_numpy().min()))
                return pa.table({"m": pa.array([m], pa.int64())})

            return int(
                self.edges.map_batches(
                    part, batch_format="pyarrow", zero_copy_batch=True
                ).min("m")
            )

        def _farthest(dist_ds) -> tuple[int, int]:
            """(ecc, smallest vid at max finite dist) via block partials."""
            def part(batch: pa.Table) -> pa.Table:
                d = batch["dist"].to_numpy()
                v = batch["vid"].to_numpy()
                ok = d >= 0
                if not ok.any():
                    return pa.table({"d": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.int64())})
                d, v = d[ok], v[ok]
                mx = d.max()
                at = v[d == mx]
                return pa.table({"d": pa.array([int(mx)], pa.int64()),
                                 "v": pa.array([int(at.min())], pa.int64())})

            df = dist_ds.map_batches(
                part, batch_format="pyarrow", zero_copy_batch=True
            ).to_pandas()  # ≤ one row per block
            mx = int(df["d"].max())
            far = int(df.loc[df["d"] == mx, "v"].min())
            return mx, far

        s = int(start) if start is not None else _minvid()
        ecc1, far1 = _farthest(self.bfs(s))
        lb, far2 = _farthest(self.bfs(far1))
        return pa.table(
            {"start": pa.array([s], pa.int64()),
             "far1": pa.array([far1], pa.int64()),
             "ecc1": pa.array([ecc1], pa.int64()),
             "far2": pa.array([far2], pa.int64()),
             "diameter_lb": pa.array([lb], pa.int64())}
        )

    def strongly_connected_components(
        self, *, max_rounds: int | None = None, trim: bool = True,
        output_path: str | None = None, as_table: bool = False,
    ):
        """G8 — SCC by Trim + forward-min coloring + backward same-color
        reach (FW-BW-Trim shape; Orzan-style coloring), labels = min vid
        of each SCC.

        Each outer round: (0) TRIM — repeatedly assign every unassigned
        vertex with no unassigned in-neighbor OR no unassigned
        out-neighbor as its own singleton SCC (one superstep per peel
        round; collapses DAG-like regions that would otherwise each cost
        a full coloring fixpoint — the round-2 documented worst case,
        O(#SCC) coloring fixpoints on a path, is now O(diameter) single
        supersteps); (1) hash-min colors over DIRECTED edges among
        unassigned vertices to fixpoint — color(v) = min unassigned vid
        that reaches v; (2) over REVERSED edges, propagate reach flags from
        each color root r (color==vid) restricted to equal colors —
        reached(v) ⇔ v→*r; (3) assign those SCCs, repeat. The two actor
        pools share hash partitioning, so color/label vectors hand off
        per-part through the object store — nothing graph-sized touches
        the driver."""
        fwd, man_f = self._pool("directed")
        rev, man_r = self._pool("reversed")
        ray.get([a.scc_init.remote() for a in fwd + rev])
        rounds = 0
        limit = max_rounds if max_rounds is not None else 1 << 30
        while rounds < limit:
            remaining = sum(ray.get([a.scc_reset_colors.remote() for a in fwd]))
            if remaining == 0:
                break
            # (0) trim singleton SCCs until stable
            while trim and remaining:
                self._broadcast_hubs(fwd, man_f)
                routed = self._scatter(fwd, "scatter_min")
                ray.get(
                    [fwd[j].scc_trim_gather.remote(routed[j], j) for j in range(self.P)]
                )  # has unassigned IN-neighbor
                label_refs = [a.get_scc_labels.remote() for a in fwd]
                ray.get(
                    [rev[p].scc_set_labels.remote(label_refs[p]) for p in range(self.P)]
                )
                ray.get([a.scc_reset_colors.remote() for a in rev])
                self._broadcast_hubs(rev, man_r)
                routed = self._scatter(rev, "scatter_min")
                ray.get(
                    [rev[j].scc_trim_gather.remote(routed[j], j) for j in range(self.P)]
                )  # has unassigned OUT-neighbor (reversed edges)
                oh = [rev[p].get_trim_has.remote() for p in range(self.P)]
                assigned = sum(
                    ray.get(
                        [fwd[p].scc_trim_assign.remote(oh[p]) for p in range(self.P)]
                    )
                )
                if assigned == 0:
                    break
                remaining = sum(ray.get([a.scc_reset_colors.remote() for a in fwd]))
            if remaining == 0:
                # keep the reverse pool's labels current before exiting
                label_refs = [a.get_scc_labels.remote() for a in fwd]
                ray.get(
                    [rev[p].scc_set_labels.remote(label_refs[p]) for p in range(self.P)]
                )
                break
            # (1) forward color fixpoint
            while True:
                self._broadcast_hubs(fwd, man_f)
                routed = self._scatter(fwd, "scatter_min")
                changed = sum(
                    ray.get(
                        [fwd[j].gather_min_unassigned.remote(routed[j], j) for j in range(self.P)]
                    )
                )
                if changed == 0:
                    break
            # hand colors to the reverse pool, part by part (same owned sets)
            color_refs = [a.get_colors.remote() for a in fwd]
            ray.get(
                [rev[p].scc_adopt_colors.remote(color_refs[p]) for p in range(self.P)]
            )
            # (2) backward same-color reach fixpoint
            while True:
                self._broadcast_hubs(rev, man_r)
                routed = self._scatter(rev, "scatter_label_hist")
                adopted = sum(
                    ray.get(
                        [rev[j].gather_scc_reach.remote(routed[j], j) for j in range(self.P)]
                    )
                )
                if adopted == 0:
                    break
            # (3) assign + sync labels back to the forward pool
            ray.get([a.scc_assign.remote() for a in rev])
            label_refs = [a.get_scc_labels.remote() for a in rev]
            ray.get(
                [fwd[p].scc_set_labels.remote(label_refs[p]) for p in range(self.P)]
            )
            rounds += 1
        if as_table:
            return pa.concat_tables(ray.get([a.scc_result.remote() for a in rev]))
        return self._result_ds(
            rev, "scc_result", output_path=output_path, label="scc",
        )

    def aggregate_messages(
        self,
        edge_msg,
        *,
        agg: str = "sum",
        vertex_values=None,
        variant: str = "directed",
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """G7 — the GraphFrames ``aggregateMessages`` user hook: run ONE
        superstep where every edge sends ``edge_msg(src_value, weight)`` to
        its destination and messages combine with ``agg`` ∈ {sum, min, max}.
        Returns (vid, agg_value) for vertices that received ≥1 message.

        ``vertex_values``: optional (vid, value) table/DataFrame; defaults
        to value = vid. The built-in algorithms run on this same scatter/
        gather machinery — this surface exposes it for user extensions
        (e.g. shortest-path steps = min-aggregate of dist + w)."""
        actors, man = self._pool(variant)
        if vertex_values is None:
            ray.get([a.init_value.remote("vid") for a in actors])
        else:
            # hash-partitioned staging (the stage_graph pattern): each shard
            # loads only its slice — the vertex table never touches the driver
            import shutil

            from graphx_ray.ids import part_of

            vds = _as_dataset(vertex_values)
            sch = vds.schema()
            value_col = next(c for c in sch.names if c != "vid")
            udir = os.path.join(self.workdir, f"uservals_{variant}")
            shutil.rmtree(udir, ignore_errors=True)
            P = self.P

            def tagp(batch: pa.Table) -> pa.Table:
                vid = batch["vid"].to_numpy()
                return pa.table(
                    {
                        "vid": batch["vid"],
                        value_col: batch[value_col],
                        "part": pa.array(part_of(vid, P), type=pa.int32()),
                    }
                )

            vds.map_batches(tagp, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
                udir, partition_cols=["part"]
            )
            ray.get(
                [
                    a.load_values_partition.remote(os.path.join(udir, f"part={p}"), value_col)
                    for p, a in enumerate(actors)
                ]
            )
        self._broadcast_hubs(actors, man)
        routed = self._scatter(actors, "scatter_user", edge_msg, agg)
        if as_table:
            tables = ray.get(
                [actors[j].gather_user.remote(routed[j], j, agg) for j in range(self.P)]
            )
            return pa.concat_tables([t for t in tables if t.num_rows] or tables[:1])
        # results park in the actors; only non-empty parts write (an empty
        # gather_user table carries a placeholder dtype that would clash
        # in the read-back schema) — unless ALL are empty
        counts = ray.get(
            [actors[j].gather_user_store.remote(routed[j], j, agg) for j in range(self.P)]
        )
        parts = [p for p, c in enumerate(counts) if c] or [0]
        return self._result_ds(
            actors, "user_agg_table",
            output_path=output_path, label="aggmsg", parts=parts,
        )

    def shortest_paths(
        self,
        landmarks: list[int],
        *,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """G8 — hop distances to each landmark over the canonical undirected
        graph (min-plus supersteps to fixpoint; unreachable = -1). Semantics
        documented here rather than inherited: GraphX's lib.ShortestPaths
        follows reversed edges; we pin the undirected-hop contract and test
        it against networkx.

        Landmark distance columns accumulate INSIDE the shard actors (one
        banked vector per landmark); the driver never merges per-landmark
        vertex tables. With ``output_path`` the result is written as
        per-part parquet and read back lazily."""
        actors, man = self._pool("undirected")
        lms = [int(lm) for lm in landmarks]
        limit = max_iter if max_iter is not None else 1 << 30
        for lm in lms:
            ray.get([a.init_dist.remote(lm) for a in actors])
            self._broadcast_hubs(actors, man)
            it = 0
            while it < limit:
                routed = self._scatter(actors, "scatter_minplus")
                changed = sum(
                    ray.get([actors[j].gather_min.remote(routed[j], j) for j in range(self.P)])
                )
                self._broadcast_hubs(actors, man)
                it += 1
                if changed == 0:
                    break
            ray.get([a.store_dist.remote(lm) for a in actors])
        if as_table:
            return pa.concat_tables(
                ray.get([a.dist_table.remote(lms) for a in actors])
            )
        return self._result_ds(
            actors, "dist_table", (lms,),
            output_path=output_path, label="shortest_paths",
        )

    def betweenness_centrality(
        self,
        *,
        k: int | None = None,
        sources: list[int] | None = None,
        seed: int = 42,
        batch: int = 4,
        normalized: bool = False,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Brandes betweenness centrality (SURVEY.md A.15) over the
        canonical undirected simple graph — exact when every vertex is a
        pivot (the default; O(V·E), small graphs only), pivot-sampled
        when ``k`` is given (Brandes–Pich; pivots are the k vertices with
        the smallest mix64(seed ^ vid), so the sample is deterministic
        and parallelism-invariant), or user-pinned via ``sources``.
        Scaling matches networkx.betweenness_centrality: ×1/2 undirected
        (×1/((n−1)(n−2)) when ``normalized``), ×n/k for sampled pivots.

        Pivots run in batches of ``batch`` columns; each superstep's
        working set is (shard edges × batch) float64 — size ``batch`` to
        the node. Forward: level-synchronous σ counting (message-sum over
        the frontier). Backward: dependency accumulation deepest level
        first. No split hubs (matrix state has no hub-broadcast path) —
        rebuild with a higher salt_threshold."""
        actors, man = self._pool("undirected")
        if man.get("hubs"):
            raise NotImplementedError(
                "betweenness_centrality: rebuild the Graph with "
                "salt_threshold above the max degree (no split hubs)"
            )
        n_total = sum(ray.get([a.owned_count.remote() for a in actors]))
        if sources is not None:
            piv = [int(s) for s in sources]
            sampled = False
        elif k is not None and k < n_total:
            pairs = ray.get([a.pivot_candidates.remote(k, seed) for a in actors])
            h = np.concatenate([p[0] for p in pairs])
            v = np.concatenate([p[1] for p in pairs])
            piv = [int(x) for x in v[np.argsort(h, kind="stable")[:k]]]
            sampled = True
        else:
            # exact mode: every vertex is a pivot (driver holds the id
            # list — exact betweenness is O(V·E), small graphs only)
            owned = ray.get([a.owned_vids.remote() for a in actors])
            piv = sorted(int(x) for arr in owned for x in arr)
            sampled = False
        limit = max_iter if max_iter is not None else 1 << 30
        for i in range(0, len(piv), batch):
            bp = piv[i : i + batch]
            t0 = time.time()
            ray.get([a.init_bc.remote(bp, i == 0) for a in actors])
            d = 0
            while d < limit:
                routed = self._scatter(actors, "scatter_bc_fwd", d)
                new = sum(
                    ray.get(
                        [actors[j].gather_bc_fwd.remote(routed[j], j, d) for j in range(self.P)]
                    )
                )
                if new == 0:
                    break
                d += 1
            ray.get([a.init_bc_delta.remote() for a in actors])
            for dd in range(d, 0, -1):
                routed = self._scatter(actors, "scatter_bc_bwd", dd)
                ray.get(
                    [actors[j].gather_bc_bwd.remote(routed[j], j, dd) for j in range(self.P)]
                )
            ray.get([a.finish_bc_batch.remote() for a in actors])
            ckpt.append_metrics(
                self.workdir,
                {"algo": "betweenness", "iteration": i // batch,
                 "wall_s": time.time() - t0, "pivots_done": min(i + batch, len(piv)),
                 "depth": int(d)},
            )
        if normalized:
            scale = 1.0 / ((n_total - 1) * (n_total - 2)) if n_total > 2 else 0.0
        else:
            scale = 0.5
        if sampled:
            scale *= n_total / len(piv)
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_bc.remote(scale) for a in actors])
            )
        return self._result_ds(
            actors, "result_table_bc", (scale,),
            output_path=output_path, label="betweenness",
        )

    def betweenness_fixed(
        self,
        sources: list[int],
        *,
        max_depth: int = 8,
        scale: int = 10**12,
        batch: int = 4,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Fixed-point INTEGER Brandes dependency accumulation (the
        svdpp_fixed pattern applied to A.15): per pivot, the forward σ
        phase is the exact-integer BFS of ``shortest_path_counts`` capped
        at ``max_depth`` levels, and the backward phase accumulates

            δ(v) = σ(v) · Σ_{w succ} floor((scale + δ(w)) / σ(w))

        with the floor division at the SENDER (katz/salsa's per-edge
        device) so every message is an order-free int64 sum and the whole
        run replays bit-exactly in SQL. Returns (vid, bc_fixed) where
        bc_fixed = Σ over pivots of δ (a pivot's own row excluded, per
        Brandes); bc_fixed / (2·scale) ≈ the unnormalized undirected
        betweenness restricted to the given pivots. ``max_depth`` pins
        the contract exactly like sssp's max_iter. No split hubs."""
        actors, man = self._pool("undirected")
        if man.get("hubs"):
            raise NotImplementedError(
                "betweenness_fixed: rebuild the Graph with "
                "salt_threshold above the max degree (no split hubs)"
            )
        piv = [int(s) for s in sources]
        for i in range(0, len(piv), batch):
            bp = piv[i : i + batch]
            t0 = time.time()
            ray.get([a.init_bc.remote(bp, False) for a in actors])
            d = 0
            while d < max_depth:
                routed = self._scatter(actors, "scatter_bc_fwd", d)
                new = sum(
                    ray.get(
                        [actors[j].gather_bc_fwd.remote(routed[j], j, d) for j in range(self.P)]
                    )
                )
                if new == 0:
                    break
                d += 1
            ray.get([a.init_bc_delta_fixed.remote(i == 0) for a in actors])
            for dd in range(d, 0, -1):
                routed = self._scatter(actors, "scatter_bc_bwd_fixed", dd, int(scale))
                ray.get(
                    [actors[j].gather_bc_bwd_fixed.remote(routed[j], j, dd) for j in range(self.P)]
                )
            ray.get([a.finish_bc_batch_fixed.remote() for a in actors])
            ckpt.append_metrics(
                self.workdir,
                {"algo": "betweenness_fixed", "iteration": i // batch,
                 "wall_s": time.time() - t0,
                 "pivots_done": min(i + batch, len(piv)), "depth": int(d)},
            )
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_bc_fixed.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_bc_fixed", (),
            output_path=output_path, label="betweenness_fixed",
        )

    def shortest_path_counts(
        self,
        source: int,
        *,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Single-source shortest-path COUNTS over the canonical
        undirected simple graph — the exact-integer forward phase of
        Brandes (SURVEY.md A.15): level-synchronous BFS where a newly
        reached vertex's σ is the sum of its frontier in-neighbors' σ.
        Returns (vid, dist, sigma); unreached vertices carry (−1, 0).
        σ is exact while < 2^53 (guarded)."""
        actors, man = self._pool("undirected")
        if man.get("hubs"):
            raise NotImplementedError(
                "shortest_path_counts: rebuild the Graph with "
                "salt_threshold above the max degree (no split hubs)"
            )
        ray.get([a.init_bc.remote([int(source)], True) for a in actors])
        limit = max_iter if max_iter is not None else 1 << 30
        d = 0
        while d < limit:
            routed = self._scatter(actors, "scatter_bc_fwd", d)
            new = sum(
                ray.get(
                    [actors[j].gather_bc_fwd.remote(routed[j], j, d) for j in range(self.P)]
                )
            )
            if new == 0:
                break
            d += 1
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table_path_counts.remote() for a in actors])
            )
        return self._result_ds(
            actors, "result_table_path_counts",
            output_path=output_path, label="path_counts",
        )

    def sssp_weighted(
        self,
        source: int,
        *,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Weighted single-source shortest paths over the UNDIRECTED
        weighted graph (each directed edge contributes both directions
        with its integer weight; parallel edges take the min naturally):
        min-plus Bellman-Ford supersteps to fixpoint (or exactly
        ``max_iter`` rounds when given — the pinned contract the SQL
        oracle unrolls). Returns (vid, dist), −1 unreachable. Weights
        must be non-negative integers (rounded from ``w``)."""
        actors, man = self._pool("undirected_weighted")
        ray.get([a.init_dist.remote(int(source)) for a in actors])
        self._broadcast_hubs(actors, man)
        it = 0
        limit = max_iter if max_iter is not None else 1 << 30
        while it < limit:
            routed = self._scatter(actors, "scatter_minplus_w")
            changed = sum(
                ray.get([actors[j].gather_min.remote(routed[j], j) for j in range(self.P)])
            )
            self._broadcast_hubs(actors, man)
            it += 1
            if changed == 0:
                break
        ray.get([a.store_dist.remote(int(source)) for a in actors])
        if as_table:
            t = pa.concat_tables(
                ray.get([a.dist_table.remote([int(source)]) for a in actors])
            )
            return t.rename_columns(["vid", "dist"])
        return self._result_ds(
            actors, "dist_table", ([int(source)],),
            output_path=output_path, label="sssp", rename=["vid", "dist"],
        )

    def widest_path(
        self,
        source: int,
        *,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Widest (bottleneck) path over the UNDIRECTED weighted graph:
        max-min supersteps — msg = min(width(src), w), gather = max —
        to fixpoint (or exactly ``max_iter`` rounds when given, the
        pinned contract the SQL oracle unrolls; a reached fixpoint is
        stable). Returns (vid, width): the maximum over paths of the
        minimum edge weight along the path; 0 at the source (mirroring
        dist-to-self = 0), −1 unreachable. Weights must be positive
        integers (rounded from ``w``)."""
        actors, man = self._pool("undirected_weighted")
        ray.get([a.init_width.remote(int(source)) for a in actors])
        self._broadcast_hubs(actors, man)
        it = 0
        limit = max_iter if max_iter is not None else 1 << 30
        while it < limit:
            routed = self._scatter(actors, "scatter_maxmin_w")
            changed = sum(
                ray.get([actors[j].gather_max.remote(routed[j], j) for j in range(self.P)])
            )
            self._broadcast_hubs(actors, man)
            it += 1
            if changed == 0:
                break
        if as_table:
            return pa.concat_tables(
                ray.get([a.width_table.remote() for a in actors])
            )
        return self._result_ds(
            actors, "width_table", output_path=output_path, label="widest",
        )

    def topo_layers(
        self,
        *,
        max_iter: int | None = None,
        output_path: str | None = None,
        as_table: bool = False,
    ):
        """Topological layering of the DIRECTED graph: layer(v) = length
        of the longest directed path ending at v (the Kahn peel round in
        which v's in-degree reaches zero), computed by max-plus
        supersteps from all-zeros — msg = layer(src) + 1, gather = max.
        Runs to fixpoint, guarded by |V| rounds: a vertex on (or
        reachable from) a directed cycle never stabilizes, so exceeding
        the guard raises ``ValueError`` — topo_layers doubles as a
        distributed cycle detector. ``max_iter`` pins an exact round
        count instead (the SQL-unroll contract; iterates are
        deterministic even pre-fixpoint). Returns (vid, layer)."""
        actors, man = self._pool("directed")
        ray.get([a.init_value.remote("zero") for a in actors])
        self._broadcast_hubs(actors, man)
        if max_iter is not None:
            limit = max_iter
        else:
            # cycle guard: longest simple path < |V|, so a DAG's fixpoint
            # lands within n rounds; one shard-stats wave, no vertex data
            limit = sum(
                s["n_vertices"] for s in ray.get([a.stats.remote() for a in actors])
            ) + 1
        it = 0
        while it < limit:
            routed = self._scatter(actors, "scatter_maxplus")
            changed = sum(
                ray.get([actors[j].gather_max.remote(routed[j], j) for j in range(self.P)])
            )
            self._broadcast_hubs(actors, man)
            it += 1
            if changed == 0:
                break
        else:
            if max_iter is None:
                raise ValueError(
                    "topo_layers: no fixpoint within |V| rounds — the graph "
                    "has a directed cycle (pass max_iter to pin rounds instead)"
                )
        if as_table:
            return pa.concat_tables(
                ray.get([a.result_table.remote("layer") for a in actors])
            )
        return self._collect(actors, "layer", output_path)

    def approx_distances(
        self,
        landmarks: list[int],
        query_vids: list[int],
        *,
        output_path: str | None = None,
    ) -> Dataset:
        """Landmark distance oracle (Thorup–Zwick / Potamias et al.
        shape): d̂(u, v) = min over landmarks ℓ of d(u, ℓ) + d(ℓ, v) —
        an upper bound on the true hop distance (exact whenever some
        shortest path passes a landmark; d̂(u, u) = 2·d(u, nearest ℓ),
        the standard oracle artifact). Returns (u, v, est) for EVERY
        vertex u × each of the (small) ``query_vids``; −1 when u and v
        share no reachable landmark.

        Scale shape: |L| BFS supersteps through the CSR pool (the
        shortest_paths machinery, landmark columns accumulated
        shard-side), then the |Q|×|L| query rows — model-sized —
        broadcast into one streaming map_batches; pairwise estimates
        never shuffle."""
        lms = [int(x) for x in landmarks]
        qv = sorted(int(x) for x in query_vids)
        sp = self.shortest_paths(lms)
        cols = [f"dist_{l}" for l in lms]

        import pyarrow.compute as pc

        qset = pa.array(np.asarray(qv, dtype=np.int64))

        def pick(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["vid"], value_set=qset))

        qrows = (
            sp.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .sort_values("vid")
        )  # |Q| rows — the broadcast side
        qd = qrows[cols].to_numpy().astype(np.int64)  # (|Q|, |L|)
        qids = qrows["vid"].to_numpy().astype(np.int64)
        qd_ref = ray.put(qd)
        qid_ref = ray.put(qids)

        def estimate(batch: pa.Table) -> pa.Table:
            qdm = ray.get(qd_ref)  # (|Q|, |L|)
            qi = ray.get(qid_ref)
            u = batch["vid"].to_numpy()
            du = np.stack([batch[c].to_numpy() for c in cols], axis=1).astype(np.int64)
            # -1 (unreachable) must not win the min: lift to +inf-ish
            BIG = np.int64(1) << 60
            du_ = np.where(du < 0, BIG, du)  # (n, L)
            qd_ = np.where(qdm < 0, BIG, qdm)  # (Q, L)
            est = (du_[:, None, :] + qd_[None, :, :]).min(axis=2)  # (n, Q)
            est = np.where(est >= BIG, np.int64(-1), est)
            n, q = est.shape
            return pa.table({
                "u": pa.array(np.repeat(u, q), type=pa.int64()),
                "v": pa.array(np.tile(qi, n), type=pa.int64()),
                "est": pa.array(est.reshape(-1)),
            })

        return sp.map_batches(
            estimate, batch_format="pyarrow", zero_copy_batch=True
        )

    def condensation(
        self,
        *,
        max_rounds: int | None = None,
        num_partitions: int = 16,
    ) -> Dataset:
        """Condensation DAG of the directed graph: every SCC contracted
        to its min-vid label (the ``strongly_connected_components``
        contract); returns edges (src, dst, w) between DISTINCT
        components, w = Σ of the original edge weights between the two
        (1 per edge when unweighted), intra-component edges dropped.
        The condensation of any directed graph is acyclic, so composing
        with ``topo_layers`` on the result gives the DAG-layer
        decomposition of a cyclic graph without tripping the cycle
        guard. Scale shape: the SCC supersteps + two bucket joins of
        the edge table against the label table + one keyed reduce —
        the louvain-contraction pattern."""
        from graphx_ray.stages.derive import grouped_reduce
        from graphx_ray.stages.motif import bucket_join

        labels = self.strongly_connected_components(max_rounds=max_rounds)
        ju = bucket_join(
            self._with_weight(self.edges), labels,
            on="src", right_on="vid", num_partitions=num_partitions,
        )

        def project(batch: pa.Table) -> pa.Table:
            # explicit projection: Dataset.select_columns can report the
            # UN-projected schema on tiny upstream plans (observed on a
            # 1-row join at sf0.001), and bucket_join reads its left
            # spill with schema()-derived columns
            return batch.select(["component", "dst", "w"])

        jv = bucket_join(
            ju.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
            labels,
            on="dst", right_on="vid", num_partitions=num_partitions,
        )

        def contract(batch: pa.Table) -> pa.Table:
            cu = batch["component"].to_numpy()
            cv = batch["component_r"].to_numpy()
            w = batch["w"].to_numpy().astype(np.int64)
            keep = cu != cv
            return pa.table(
                {
                    "src": pa.array(cu[keep], type=pa.int64()),
                    "dst": pa.array(cv[keep], type=pa.int64()),
                    "w": pa.array(w[keep]),
                }
            )

        c = jv.map_batches(contract, batch_format="pyarrow", zero_copy_batch=True)
        return grouped_reduce(
            c, ["src", "dst"], sum_col="w",
            num_partitions=num_partitions,
            empty_schema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
            ),
        )

    def degrees(self) -> Dataset:
        from graphx_ray.stages.derive import degrees as _deg

        return _deg(self._with_weight(self.edges))

    def triangle_count(self):
        from graphx_ray.pipelines.triangles import triangle_count as _tc

        return _tc(self.edges, vertices=self.vertices, num_parts=self.P)

    @staticmethod
    def _with_weight(ds: Dataset) -> Dataset:
        def ensure_w(batch: pa.Table) -> pa.Table:
            if "w" in batch.column_names:
                return batch
            return batch.append_column("w", pa.array(np.ones(batch.num_rows, np.int64)))

        return ds.map_batches(ensure_w, batch_format="pyarrow", zero_copy_batch=True)

    def close(self) -> None:
        for actors, _ in self._actors.values():
            for a in actors:
                ray.kill(a)
        self._actors.clear()


def partition_by(edges, strategy: str, num_parts: int, *, col: str = "part"):
    """Module-level GraphX ``partitionBy`` passthrough (state/partition.py)."""
    from graphx_ray.state.partition import partition_by as _pb

    return _pb(_as_dataset(edges), strategy, num_parts, col=col)
