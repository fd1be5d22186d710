"""curation pipeline: gate + exact dedup + near-dup removal composition."""

import pandas as pd
import ray.data as rd

from graphx_ray.pipelines.curation import curate


def test_curation_rules():
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "the quick brown fox jumps over the lazy dog",      # kept
                "the quick brown fox jumps over the lazy dog",      # exact dup of 1
                "the quick brown fox jumps over the lazy cat today",# near-dup of 1
                "short one",                                         # < 5 words
                "!!! ??? ... ;;; ***** ..... !!!!! %%% @@@ &&&",     # punct ratio
                "a completely different document about graph engines and ray data",
            ],
        }
    )
    got = (
        curate(rd.from_pandas(docs), num_partitions=3, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 6]
    assert got.loc[0, "n_ws_tokens"] == 9


def test_exact_dedup_rows_matches_join_path(ray_session):
    """exact_dedup_rows (semi-join-free) keeps exactly the rows that
    exact_dedup + semi_join kept — same keep rule, no broadcast key set."""
    import numpy as np

    from graphx_ray.functions.dedup import exact_dedup, exact_dedup_rows
    from graphx_ray.stages.derive import semi_join

    rng = np.random.default_rng(7)
    texts = [f"document body number {i % 40} with shared tail" for i in range(200)]
    ids = rng.permutation(10_000)[:200]
    docs = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = rd.from_pandas(docs)

    rows = (
        exact_dedup_rows(ds, num_partitions=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    old = (
        semi_join(ds, exact_dedup(ds), on="doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert rows["doc_id"].tolist() == old["doc_id"].tolist()
    assert rows["text"].tolist() == old["text"].tolist()
    assert len(rows) == 40  # one survivor per distinct text


def test_curate_bucketed_anti_fallback(ray_session):
    """broadcast_limit=0 forces the two-large-sides bucket_join(anti) path;
    the result must be identical to the broadcast path."""
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 9)),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat today",
                "a completely different document about graph engines and ray data",
                "yet another unique document with enough words to pass the gate",
                "yet another unique document with enough words to pass the gate",
                "totally separate content discussing streaming execution at scale",
                "totally separate content discussing streaming execution at scale now",
            ],
        }
    )
    kw = dict(num_partitions=3, concurrency=2)
    bc = curate(rd.from_pandas(docs), **kw).to_pandas().sort_values("doc_id")
    bj = (
        curate(rd.from_pandas(docs), broadcast_limit=0, **kw)
        .to_pandas().sort_values("doc_id")
    )
    assert bc["doc_id"].tolist() == bj["doc_id"].tolist()
    assert bc["n_ws_tokens"].tolist() == bj["n_ws_tokens"].tolist()


def test_duplicate_clusters(ray_session):
    import pandas as pd
    import ray.data as rd

    from graphx_ray.pipelines.curation import duplicate_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [
        base, base + " x", base + " y",            # cluster of 3
        "completely different words entirely here now for sure",  # singleton
        "another unrelated document with its own words here",     # singleton
    ]
    df = pd.DataFrame({"doc_id": [10, 11, 12, 20, 30], "text": texts})
    got = (
        duplicate_clusters(rd.from_pandas(df), threshold=0.5, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.to_dict("list") == {"doc_id": [10, 11, 12], "cluster_id": [10, 10, 10]}


def test_curate_keep_best_survivor_rule(ray_session):
    """keep='best' keeps the argmax-n_words member per near-dup cluster
    (doc_id ASC tie), where the default keeps the min doc_id."""
    import pytest

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = pd.DataFrame(
        {
            # cluster A: 11 is a LONGER near-dup of 10 → best keeps 11,
            # min_id keeps 10. cluster B: equal lengths → tie falls back
            # to min doc_id (20) under BOTH rules. 30 is a singleton.
            "doc_id": [10, 11, 20, 21, 30],
            "text": [
                base,
                base + " with three extra words",
                "completely different text about graph engines and ray data here",
                "completely different text about graph engines and ray data also",
                "an unrelated singleton document with enough words to pass the gate",
            ],
        }
    )
    ds = rd.from_pandas(docs)
    kw = dict(num_partitions=3, concurrency=2, jaccard_threshold=0.5)
    got_min = curate(ds, **kw).to_pandas()["doc_id"].sort_values().tolist()
    got_best = curate(ds, keep="best", **kw).to_pandas()["doc_id"].sort_values().tolist()
    assert got_min == [10, 20, 30]
    assert got_best == [11, 20, 30]
    with pytest.raises(ValueError):
        curate(ds, keep="best", near_dup="exact", **kw)
    with pytest.raises(ValueError):
        curate(ds, keep="nope", **kw)
