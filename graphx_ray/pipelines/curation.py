"""End-to-end training-data curation pipeline — the composition a 100 TB
corpus run would use, built entirely from the library's streaming
operators (nothing materializes the corpus):

    read → quality gate → exact dedup → n-gram near-dup removal → stats

Every rule is pinned so the whole pipeline is SQL-oracle comparable:

- quality gate: n_words ≥ min_words AND n_punct·10 ≤ max_punct_decile·n_chars
  (integer arithmetic — no float threshold edge);
- exact dedup: keep the smallest doc_id per normalized-text fingerprint;
- near-dup removal: exact k-word-shingle Jaccard ≥ threshold among the
  surviving docs; greedy-by-id — drop every doc that appears as the LARGER
  member of any qualifying pair (regardless of whether the smaller member
  itself survives a different pair);
- output: (doc_id, n_ws_tokens) of kept docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graphx_ray.functions.dedup import exact_dedup, ngram_jaccard_pairs
from graphx_ray.functions.text import quality_scores, token_counts
from graphx_ray.stages.derive import anti_join, semi_join


def curate(
    docs: Dataset,
    *,
    min_words: int = 5,
    max_punct_decile: int = 3,
    jaccard_k: int = 3,
    jaccard_threshold: float = 0.5,
    num_partitions: int = 8,
    concurrency: int = 4,
) -> Dataset:
    """(doc_id, n_ws_tokens) of documents that survive the gate + dedups."""
    scored = quality_scores(docs, concurrency=concurrency)

    def gate(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"].to_numpy()
        npc = batch["n_punct"].to_numpy()
        nc = batch["n_chars"].to_numpy()
        keep = (nw >= min_words) & (npc * 10 <= max_punct_decile * nc)
        return batch.filter(pa.array(keep))

    kept = scored.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    kept = kept.select_columns(["doc_id", "text"])

    uniq_ids = exact_dedup(kept)
    uniq = semi_join(kept, uniq_ids, on="doc_id", num_partitions=num_partitions)

    pairs = ngram_jaccard_pairs(
        uniq, k=jaccard_k, threshold=jaccard_threshold, num_partitions=num_partitions
    )
    final = anti_join(uniq, pairs, on="doc_id", right_on="b", num_partitions=num_partitions)
    return token_counts(final).select_columns(["doc_id", "n_ws_tokens"])
