"""Distributed BPE trainer vs a pure-python Sennrich replay."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphx_ray.functions.bpe import bpe_round1_pairs, bpe_train


def sennrich_oracle(texts, merges):
    wc: collections.Counter = collections.Counter()
    for t in texts:
        wc.update(("" if t is None else t).lower().split())
    syms = {w: list(w) for w in wc}
    out = []
    for rank in range(merges):
        pc: collections.Counter = collections.Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # pinned tie-break: max count, then lexicographically smallest pair
        mx = max(pc.values())
        best = min(p for p, c in pc.items() if c == mx)
        out.append((rank, best[0], best[1], pc[best]))
        l, r = best
        for w, s in syms.items():
            i, ns = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return pd.DataFrame(out, columns=["rank", "left", "right", "count"])


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(3)
    vocab = ["banana", "bandana", "ananas", "cabana", "abba", "na", "low", "lowest", "newer"]
    return [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20)))
        for _ in range(50)
    ] + ["", "aaaa aaaa aaaaaa"]  # overlap stress: runs of identical pairs


def test_bpe_matches_sennrich(texts, ray_session):
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = bpe_train(
        rd.from_pandas(docs).repartition(5), merges=8, num_partitions=3
    ).to_pandas()
    want = sennrich_oracle(texts, 8)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_overlap_rule(ray_session):
    """'aaaa' with merge (a,a): greedy left-to-right gives aa+aa, count
    3 occurrences per word-instance of the pair before merging."""
    docs = pd.DataFrame({"doc_id": [0], "text": ["aaaa"]})
    got = bpe_train(rd.from_pandas(docs), merges=2, num_partitions=2).to_pandas()
    want = sennrich_oracle(["aaaa"], 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.iloc[0][["left", "right"]].tolist() == ["a", "a"]
    assert got.iloc[1][["left", "right"]].tolist() == ["aa", "aa"]


def test_bpe_round1_pairs(texts, ray_session):
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = (
        bpe_round1_pairs(rd.from_pandas(docs).repartition(4), num_partitions=3)
        .to_pandas()
        .sort_values(["l", "r"])
        .reset_index(drop=True)
    )
    wc: collections.Counter = collections.Counter()
    for t in texts:
        wc.update(t.lower().split())
    pc: collections.Counter = collections.Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += n
    want = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(pc.items())], columns=["l", "r", "n"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def minrank_encode(word, ranks):
    """Classic min-rank-first BPE apply (independent of the engine's
    rank-order-pass implementation): repeatedly merge the lowest-rank
    pair present, leftmost-first within equal pairs."""
    syms = list(word)
    while len(syms) >= 2:
        best = None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, i, p)
        if best is None:
            break
        _, i, (l, r) = best
        # merge ALL occurrences of this pair greedy left-to-right (the
        # Sennrich apply semantics the trainer also uses)
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def test_bpe_encode_matches_minrank_reference(texts, ray_session):
    from graphx_ray.functions.bpe import bpe_encode

    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    merges = bpe_train(
        rd.from_pandas(docs).repartition(5), merges=8, num_partitions=3
    )
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges["left"].to_pylist(), merges["right"].to_pylist())
        )
    }
    got = (
        bpe_encode(rd.from_pandas(docs).repartition(4), merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_tok": [
                sum(len(minrank_encode(w, ranks)) for w in t.lower().split())
                for t in docs["text"]
            ],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.loc[got["doc_id"] == 50, "n_tok"] == 0).all()  # empty doc


def test_bpe_encode_tokens_roundtrip(texts, ray_session):
    """emit_tokens: concatenated symbols reproduce the lowercased words
    byte-for-byte and n_tok == len(tokens)."""
    from graphx_ray.functions.bpe import bpe_encode

    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    merges = bpe_train(rd.from_pandas(docs), merges=6, num_partitions=2)
    got = bpe_encode(
        rd.from_pandas(docs).repartition(3), merges,
        emit_tokens=True, concurrency=2,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for _, row in got.iterrows():
        text = docs.loc[docs["doc_id"] == row["doc_id"], "text"].iloc[0]
        assert "".join(row["tokens"]) == "".join(text.lower().split())
        assert row["n_tok"] == len(row["tokens"])


def test_pack_sequences_with_bpe_counts(texts, ray_session):
    """pack_sequences(counts=bpe_encode(...)) packs by real tokenizer
    counts: per-doc manifest totals equal the encode counts."""
    from graphx_ray.functions.bpe import bpe_encode
    from graphx_ray.functions.packing import pack_sequences

    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    merges = bpe_train(rd.from_pandas(docs), merges=4, num_partitions=2)
    enc = bpe_encode(rd.from_pandas(docs).repartition(3), merges, concurrency=2)
    man = pack_sequences(None, budget=16, counts=enc, num_partitions=4).to_pandas()
    enc_df = enc.to_pandas()
    per_doc = man.groupby("doc_id")["n_tok"].sum()
    for _, row in enc_df.iterrows():
        if row["n_tok"] > 0:
            assert per_doc[row["doc_id"]] == row["n_tok"]
        else:
            assert row["doc_id"] not in per_doc.index
    # stream is gapless: sequence offsets tile [0, total)
    total = enc_df["n_tok"].sum()
    cov = man.groupby("seq_id")["n_tok"].sum()
    assert cov.iloc[:-1].eq(16).all() and cov.sum() == total
