"""graphx_ray — a from-scratch Ray-Data-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of the reference
(ChrisArnault/GraphX: a Spark/GraphFrames object-zone linking pipeline;
see SURVEY.md — the reference mount was empty, so the functional contract
is pinned by BASELINE.json's north_star/north_rule and the published
GraphFrames/GraphX semantics recorded in SURVEY.md Appendix A) on Ray Data:

- derivation pipelines are ``ray.data.Dataset`` → ``map_batches`` over
  zero-copy Arrow batches,
- iterative graph algorithms (PageRank, connected components, label
  propagation, triangle count) run as supersteps over per-partition CSR
  adjacency held in a stateful actor pool, with messages pre-aggregated
  per destination partition (combiner) before the shuffle,
- everything checkpoints per-partition Parquet + a manifest so a killed
  run resumes from the last completed iteration.

Library code never calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the driver / CLI / test fixture (BASELINE.json input_hint).
"""

from graphx_ray import schemas  # noqa: F401
from graphx_ray.ids import hash_text64, part_of, vid_for  # noqa: F401

__version__ = "0.1.0"
