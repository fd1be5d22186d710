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


def test_remove_duplicated_substrings(ray_session):
    from graphx_ray.functions.dedup import (
        duplicated_substring_stats,
        remove_duplicated_substrings,
    )

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "SOMETHING the quick brown fox jumps over then different tail here",
        "totally unrelated words only once",
        "",
        "a b c x a b c",  # within-doc repeat, k=3 -> second run removed
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(2)
    got = (
        remove_duplicated_substrings(ds, k=3, num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    stats = (
        duplicated_substring_stats(ds, k=3, num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # counts agree with the stats op on every doc
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_words", "n_kept"]], stats, check_dtype=False
    )
    # reconstruction: kept-token joins, case preserved, first occurrence kept
    assert got.loc[0, "text_clean"] == texts[0]  # doc 0 is canonical
    assert "quick" not in got.loc[1, "text_clean"].lower()
    assert got.loc[1, "text_clean"].startswith("SOMETHING")
    assert got.loc[2, "text_clean"] == texts[2]
    assert got.loc[3, "text_clean"] == ""
    assert got.loc[4, "text_clean"] == "a b c x"
    # n_kept == len(split of text_clean)
    for r in got.itertuples():
        assert len(r.text_clean.split()) == r.n_kept
