"""Corpus-level line dedup (CCNet/C4 boilerplate removal) vs a pandas oracle,
on both the broadcast path and the bucketed two-large-sides fallback."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.dedup import duplicated_lines, remove_duplicated_lines


def _docs():
    return pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "keep me\ncookie banner\nunique tail",
            "cookie banner\nanother keeper",
            "cookie banner\ncookie banner",   # fully boilerplate after dedup
            "",                                # single empty line
            "no newline here",
            "keep me too\n\nkeep me three",    # blank middle line
        ],
    })


def _oracle(df, sep="\n", min_count=2):
    lines = df.assign(parts=df["text"].str.split(sep)).explode("parts")
    counts = lines["parts"].value_counts()
    hot = set(counts[counts >= min_count].index)
    out = []
    for did, text in zip(df["doc_id"], df["text"]):
        parts = text.split(sep)
        kept = [p for p in parts if p not in hot]
        out.append((did, sep.join(kept), len(parts), len(kept)))
    return pd.DataFrame(out, columns=["doc_id", "text_clean", "n_lines", "n_kept"])


def _norm(df):
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "text_clean", "n_lines", "n_kept"]
    ]


def test_duplicated_lines_counts(ray_session):
    ds = rd.from_pandas(_docs())
    got = duplicated_lines(ds, min_count=2).to_pandas()
    want = {"cookie banner": 4}
    # "" appears twice: once as doc 3's only line, once as doc 5's middle
    want[""] = 2
    assert dict(zip(got["line"], got["n"])) == want


@pytest.mark.parametrize("broadcast_limit", [20_000_000, 1])
def test_remove_duplicated_lines_both_paths(ray_session, broadcast_limit):
    ds = rd.from_pandas(_docs())
    got = _norm(
        remove_duplicated_lines(
            ds, min_count=2, broadcast_limit=broadcast_limit, num_partitions=3
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, _norm(_oracle(_docs())))
    # the fully-boilerplate doc survives with an empty cleaned text
    row = got[got.doc_id == 2].iloc[0]
    assert row.text_clean == "" and row.n_kept == 0 and row.n_lines == 2


def test_remove_duplicated_lines_word_sep(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c a", "b d e", "f g b a"],
    })
    got = _norm(
        remove_duplicated_lines(ds := rd.from_pandas(df), sep=" ", min_count=2).to_pandas()
    )
    pd.testing.assert_frame_equal(got, _norm(_oracle(df, sep=" ")))
