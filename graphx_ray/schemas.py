"""Fixed Arrow schemas for every logical table (SURVEY.md §1.2).

No schema inference anywhere past the Parquet footer: each stage declares
its output schema so shuffles and unions are always schema-aligned.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input contract (BASELINE.json:15 / FIXTURES.md §1).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),  # nullable; non-null ⇒ tool edge
        ("ts", pa.timestamp("us")),
    ]
)

# vid = deterministic 64-bit hash of "{kind}:{key}" (ids.vid_for).
VERTICES = pa.schema(
    [
        ("vid", pa.int64()),
        ("kind", pa.string()),  # ∈ {conv, tool, actor}
        ("key", pa.string()),
    ]
)

# Directed multigraph collapsed to weighted edges: w = multiplicity after
# exact dedup (PageRank counts parallel edges — SURVEY.md A.1 — so the
# weight is semantic, not cosmetic).
EDGES = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("etype", pa.string()),  # ∈ {reply, tool, zone}
        ("w", pa.int64()),
    ]
)

# Canonical undirected simple graph: u < v, deduped, no self-loops
# (input to CC / LPA / triangle count, SURVEY.md A.2/A.4).
EDGES_CANONICAL = pa.schema([("u", pa.int64()), ("v", pa.int64())])

RANKS = pa.schema([("vid", pa.int64()), ("rank", pa.float64())])
COMPONENTS = pa.schema([("vid", pa.int64()), ("component", pa.int64())])
LABELS = pa.schema([("vid", pa.int64()), ("label", pa.int64())])
TRICOUNT = pa.schema([("vid", pa.int64()), ("count", pa.int64())])

DEGREES = pa.schema(
    [
        ("vid", pa.int64()),
        ("in_deg", pa.int64()),
        ("out_deg", pa.int64()),
        ("deg", pa.int64()),
    ]
)
