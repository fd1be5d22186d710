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
