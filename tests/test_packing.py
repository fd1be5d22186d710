"""Sequence packing (stream chunking): frame-equal vs a single-process
pandas replay, stream-reconstruction / budget properties, partition
invariance, empty docs, and the budget guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graphx_ray.functions.packing import pack_sequences


def _corpus():
    rng = np.random.default_rng(3)
    rows = []
    for i in range(120):
        n = int(rng.integers(0, 40))  # includes zero-token docs
        if i % 17 == 0:
            n = int(rng.integers(150, 300))  # multi-sequence spanners
        rows.append((1000 + i * 7, " ".join(f"w{j}" for j in range(n))))
    rows.append((5000, ""))  # empty text
    rows.append((5001, "   "))  # whitespace-only
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def brute_pack(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    df = df.sort_values("doc_id")
    out = []
    g = 0
    for _, row in df.iterrows():
        nt = len(row["text"].split())
        if nt == 0:
            continue
        off = 0
        while off < nt:
            seq = (g + off) // budget
            take = min((seq + 1) * budget - (g + off), nt - off)
            out.append((row["doc_id"], seq, (g + off) - seq * budget, off, take))
            off += take
        g += nt
    return pd.DataFrame(
        out, columns=["doc_id", "seq_id", "seq_off", "doc_off", "n_tok"]
    )


def _norm(df):
    return df.sort_values(["doc_id", "seq_id"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus():
    df = _corpus()
    return df, rd.from_pandas(df)


@pytest.mark.parametrize("budget,parts", [(64, 7), (100, 1), (31, 4)])
def test_pack_matches_brute(corpus, budget, parts):
    df, ds = corpus
    got = _norm(pack_sequences(ds, budget=budget, num_partitions=parts).to_pandas())
    want = _norm(brute_pack(df, budget))
    pd.testing.assert_frame_equal(got, want)


def test_pack_properties(corpus):
    df, ds = corpus
    budget = 50
    got = pack_sequences(ds, budget=budget, num_partitions=5).to_pandas()
    # per-document coverage: spans tile [0, ntok) exactly
    ntok = {r.doc_id: len(r.text.split()) for r in df.itertuples()}
    per_doc = got.groupby("doc_id")["n_tok"].sum().to_dict()
    for d, n in ntok.items():
        assert per_doc.get(d, 0) == n
    # per-sequence fill: every sequence except the last is exactly full
    per_seq = got.groupby("seq_id")["n_tok"].sum()
    assert (per_seq.iloc[:-1] == budget).all() if len(per_seq) > 1 else True
    assert per_seq.iloc[-1] <= budget
    # spans within a sequence don't overlap and are contiguous
    for _, grp in got.groupby("seq_id"):
        grp = grp.sort_values("seq_off")
        ends = (grp["seq_off"] + grp["n_tok"]).to_numpy()
        assert (grp["seq_off"].to_numpy()[1:] == ends[:-1]).all()
        assert grp["seq_off"].iloc[0] == 0
    # stream order: reading sequences in order reproduces doc_id order
    stream = got.sort_values(["seq_id", "seq_off"])["doc_id"].to_numpy()
    changes = stream[np.concatenate([[True], stream[1:] != stream[:-1]])]
    nonempty = sorted(d for d, n in ntok.items() if n > 0)
    assert list(pd.unique(changes)) == nonempty


def test_pack_empty_corpus_and_bad_budget(corpus):
    _, ds = corpus
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert pack_sequences(empty, budget=10).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(ds, budget=0)
