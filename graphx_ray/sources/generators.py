"""GraphX ``GraphGenerators`` parity: star, grid, R-MAT, and log-normal
degree graphs as DISTRIBUTED Ray Datasets.

Every generator is deterministic from its seed and sharded — vertex/edge
ranges stream through ``ray.data.range(...).map_batches`` so nothing
graph-sized touches the driver at any n. All randomness is splitmix64
(``ids.mix64``) turned into integer threshold compares or ``(h * n) >> 64``
index draws, so the DuckDB oracles replay every edge bit-identically
(GraphX seeds ``scala.util.Random`` per task — the pinned deviation here is
a hash-based stream, same distribution, reproducible at any parallelism).

Edges are (src, dst, w=1) int64, duplicates kept where the construction
produces them (R-MAT quadrant collisions, log-normal repeated picks) —
matching GraphX, which also emits multi-edges from these generators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graphx_ray.ids import mix64

_TWO64 = float(1 << 64)


def _edges_table(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "src": pa.array(src.astype(np.int64)),
            "dst": pa.array(dst.astype(np.int64)),
            "w": pa.array(np.ones(len(src), np.int64)),
        }
    )


def _range_ids(batch) -> np.ndarray:
    return batch["id"].to_numpy()


def star_graph(n: int) -> Dataset:
    """GraphX ``starGraph(n)``: edges (i → 0) for i in 1..n-1."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        i = _range_ids(batch) + 1  # range(n-1) → spokes 1..n-1
        return _edges_table(i, np.zeros(len(i), np.int64))

    return rd.range(n - 1).map_batches(gen, batch_format="pyarrow")


def grid_graph(rows: int, cols: int) -> Dataset:
    """GraphX ``gridGraph(rows, cols)``: vertex id r*cols+c, edges right
    (r,c)→(r,c+1) and down (r,c)→(r+1,c)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        v = _range_ids(batch)
        r, c = v // cols, v % cols
        right = c < cols - 1
        down = r < rows - 1
        src = np.concatenate([v[right], v[down]])
        dst = np.concatenate([v[right] + 1, v[down] + cols])
        return _edges_table(src, dst)

    return rd.range(rows * cols).map_batches(gen, batch_format="pyarrow")


def rmat_graph(
    scale: int,
    n_edges: int,
    *,
    a: float = 0.45,
    b: float = 0.15,
    c: float = 0.15,
    seed: int = 9,
) -> Dataset:
    """R-MAT (Chakrabarti et al. 2004): each edge descends ``scale`` levels
    of the 2×2 quadrant recursion. The level draw is one splitmix64 value
    compared against INTEGER thresholds ⌊a·2⁶⁴⌋ / ⌊(a+b)·2⁶⁴⌋ /
    ⌊(a+b+c)·2⁶⁴⌋ — no float anywhere, so the SQL oracle is exact."""
    import ray.data as rd

    t1 = min(int(a * _TWO64), (1 << 64) - 1)
    t2 = min(int((a + b) * _TWO64), (1 << 64) - 1)
    t3 = min(int((a + b + c) * _TWO64), (1 << 64) - 1)
    base = np.uint64(seed) << np.uint64(32)

    def gen(batch: pa.Table) -> pa.Table:
        e = _range_ids(batch).astype(np.uint64)
        src = np.zeros(len(e), np.int64)
        dst = np.zeros(len(e), np.int64)
        for level in range(scale):
            h = mix64(base + e * np.uint64(scale) + np.uint64(level))
            sbit = (h >= np.uint64(t2)).astype(np.int64)  # lower half of the matrix
            dbit = (
                ((h >= np.uint64(t1)) & (h < np.uint64(t2)))
                | (h >= np.uint64(t3))
            ).astype(np.int64)
            src = src * 2 + sbit
            dst = dst * 2 + dbit
        return _edges_table(src, dst)

    return rd.range(n_edges).map_batches(gen, batch_format="pyarrow")


def log_normal_graph(
    n: int,
    *,
    mu: float = 1.0,
    sigma: float = 0.8,
    seed: int = 17,
    max_degree: int | None = None,
) -> Dataset:
    """GraphX ``logNormalGraph``: out-degree of vertex v ~ min(⌊exp(μ+σZ)⌋,
    n-1) with Z from Box-Muller over two splitmix uniforms; each out-edge's
    destination is an independent ``(h · n) >> 64`` integer draw."""
    import ray.data as rd

    cap = (n - 1) if max_degree is None else max_degree
    base_z = np.uint64(seed) << np.uint64(32)
    base_d = np.uint64(seed ^ 0x5A5A5A5A) << np.uint64(32)

    def gen(batch: pa.Table) -> pa.Table:
        v = _range_ids(batch).astype(np.uint64)
        u1 = (mix64(base_z + v * np.uint64(2)).astype(np.float64) + 1.0) / _TWO64
        u2 = mix64(base_z + v * np.uint64(2) + np.uint64(1)).astype(np.float64) / _TWO64
        z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        deg = np.minimum(np.exp(mu + sigma * z).astype(np.int64), cap)
        deg = np.maximum(deg, 0)
        total = int(deg.sum())
        if total == 0:
            return _edges_table(np.empty(0, np.int64), np.empty(0, np.int64))
        src = np.repeat(v.astype(np.int64), deg)
        slot = np.arange(total, dtype=np.uint64) - np.repeat(
            np.cumsum(deg).astype(np.uint64) - deg.astype(np.uint64), deg
        )
        h = mix64(base_d + src.astype(np.uint64) * np.uint64(1 << 32) + slot)
        # exact floor(h·n / 2^64) via 64-bit limb high-multiply (n < 2^31):
        # h·n >> 64 == (h_hi·n + (h_lo·n >> 32)) >> 32, every term < 2^64
        nn = np.uint64(n)
        h_hi, h_lo = h >> np.uint64(32), h & np.uint64(0xFFFFFFFF)
        dst = ((h_hi * nn + ((h_lo * nn) >> np.uint64(32))) >> np.uint64(32)).astype(
            np.int64
        )
        return _edges_table(src, dst)

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def load_edge_list(path: str, *, canonical: bool = False) -> Dataset:
    """GraphX ``GraphLoader.edgeListFile`` parity: parse whitespace-separated
    ``src dst`` text lines (``#``-prefixed comment lines and blank lines
    skipped) into an (src, dst, w=1) edge Dataset. ``canonical=True``
    additionally orients each edge src<dst (GraphLoader's
    ``canonicalOrientation``). Parsing is one vectorized pandas split per
    batch of lines — files shard across read tasks like any text source."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().str.strip()
        keep = (s.str.len() > 0) & ~s.str.startswith("#")
        parts = s[keep].str.split(n=2, expand=True)
        if parts.empty:
            return _edges_table(np.empty(0, np.int64), np.empty(0, np.int64))
        src = parts[0].astype(np.int64).to_numpy()
        dst = parts[1].astype(np.int64).to_numpy()
        if canonical:
            lo = np.minimum(src, dst)
            dst = np.maximum(src, dst)
            src = lo
        return _edges_table(src, dst)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")
