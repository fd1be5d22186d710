"""Substring-level exact dedup (Lee et al. 2022 ExactSubstr semantics,
pinned integer rule) vs a brute-force Python oracle."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphx_ray.functions.dedup import duplicated_substring_stats


def _oracle(texts: list[str], k: int) -> pd.DataFrame:
    """Brute force: k-word windows by STRING equality, min-(doc,pos)
    canonical, interval-union removal."""
    toks = [t.lower().split() for t in texts]
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, ws in enumerate(toks):
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p : p + k]), []).append((d, p))
    removed = {d: set() for d in range(len(texts))}
    for _, lst in occ.items():
        if len(lst) < 2:
            continue
        lst = sorted(lst)
        for d, p in lst[1:]:
            removed[d].update(range(p, p + k))
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "n_words": [len(ws) for ws in toks],
            "n_kept": [len(ws) - len(removed[d]) for d, ws in enumerate(toks)],
        }
    )


@pytest.mark.parametrize("nblocks", [1, 5])
def test_substring_dedup_matches_bruteforce(ray_session, nblocks):
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 14))
        texts.append(" ".join(rng.choice(vocab, n)))
    texts += ["", "one two", "alpha beta gamma delta eps alpha beta gamma delta eps"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        duplicated_substring_stats(
            rd.from_pandas(df).repartition(nblocks), k=3, num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(texts, 3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_substring_dedup_within_doc_repeat(ray_session):
    # the repeated run lives INSIDE one doc: second occurrence removed
    df = pd.DataFrame(
        {"doc_id": [7], "text": ["a b c x a b c"]}
    )
    got = duplicated_substring_stats(rd.from_pandas(df), k=3, num_partitions=2).to_pandas()
    # windows: (a b c)@0, (b c x)@1, (c x a)@2, (x a b)@3, (a b c)@4 —
    # only (a b c) duplicated; occurrence @4 removed → covers words 4,5,6
    assert got.to_dict("list") == {"doc_id": [7], "n_words": [7], "n_kept": [4]}
