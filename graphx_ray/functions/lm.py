"""Bigram language-model surprisal scoring — the CCNet-shape quality
signal, integer-exact.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model; RefinedWeb and friends kept the recipe. This engine
implements the distributed two-pass core of that signal — train n-gram
counts over the corpus, then score every document by its mean token
surprisal — with one deliberate, documented twist that makes the score
EXACT integer state instead of a float log-sum:

    P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)
                        (add-one smoothing, V = exact distinct-unigram count)
    surprisal_bits_i = bitlength(c(w_{i-1}) + V) − bitlength(c(w_{i-1} w_i) + 1)

``bitlength`` is the integer ⌊log₂⌋ + 1, so surprisal_bits approximates
−log₂ P within ±1 bit — and the per-document total is a sum of INTEGERS,
which is associative and order-free, so any partitioning, any batch
boundary, and the DuckDB oracle (``length(bin(n))``) all produce the
same bits. A float log-sum would be summation-order-dependent and
libm-ULP-fragile across engines; the 1-bit quantization is the price of
bit-reproducibility and is irrelevant to the filtering use (CCNet
buckets documents into thirds).

Scale shape: tokenize/explode is per-batch vectorized (same lowercased
whitespace rule and FNV-1a-64 word hash as the dedup family); unigram
and bigram counts are two keyed storage reduces; scoring joins each
bigram occurrence to its two counts with bucketed storage joins (both
sides corpus-sized — no broadcast); the per-doc fold is one keyed
reduce. The only driver scalar is V.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from graphx_ray.ids import fnv1a64_words

RESULT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
     ("total_bits", pa.int64())]
)
_BIGRAM_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("hp", pa.uint64()), ("hc", pa.uint64())]
)
_TOKEN_SCHEMA = pa.schema([("h", pa.uint64())])


def _bitlength(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length of positive int64 values (< 2^53 —
    corpus counts; frexp exponents are exact there)."""
    return np.frexp(v.astype(np.float64))[1].astype(np.int64)


def _explode_hashes(batch: pa.Table, text_col: str):
    s = batch[text_col].to_pandas().fillna("").str.lower().str.split()
    ex = s.explode()
    live = ex.notna().to_numpy()
    if not live.any():
        return None, None
    words = np.asarray(ex.to_numpy()[live], dtype="U")
    docidx = ex.index.to_numpy()[live]
    return fnv1a64_words(words), docidx


def bigram_surprisal(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> Dataset:
    """(doc_id, n_bigrams, total_bits) per document. Mean surprisal =
    total_bits / n_bigrams (caller divides; docs with < 2 tokens report
    (0, 0))."""
    from graphx_ray.stages.derive import grouped_reduce
    from graphx_ray.stages.motif import bucket_join

    def tokens(batch: pa.Table) -> pa.Table:
        h, _ = _explode_hashes(batch, text_col)
        if h is None:
            return _TOKEN_SCHEMA.empty_table()
        return pa.table({"h": pa.array(h)}, schema=_TOKEN_SCHEMA)

    def bigrams(batch: pa.Table) -> pa.Table:
        h, docidx = _explode_hashes(batch, text_col)
        if h is None or len(h) < 2:
            return _BIGRAM_SCHEMA.empty_table()
        same = docidx[1:] == docidx[:-1]
        ids = batch[id_col].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids[docidx[1:][same]], type=pa.int64()),
             "hp": pa.array(h[:-1][same]),
             "hc": pa.array(h[1:][same])},
            schema=_BIGRAM_SCHEMA,
        )

    tok = docs.map_batches(tokens, batch_format="pyarrow", zero_copy_batch=True)

    def ones(b: pa.Table) -> pa.Table:
        uq, cnt = np.unique(b["h"].to_numpy(), return_counts=True)
        return pa.table({"h": pa.array(uq), "c": pa.array(cnt.astype(np.int64))})

    uni = grouped_reduce(
        tok.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        ["h"], sum_col="c", num_partitions=num_partitions,
        empty_schema=pa.schema([("h", pa.uint64()), ("c", pa.int64())]),
    )
    vocab_v = uni.count()  # the only driver scalar

    big = docs.map_batches(bigrams, batch_format="pyarrow", zero_copy_batch=True)

    def bones(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"hp": pa.array([], pa.uint64()), "hc": pa.array([], pa.uint64()),
                 "cb": pa.array([], pa.int64())}
            )
        hp = b["hp"].to_numpy()
        hc = b["hc"].to_numpy()
        order = np.lexsort((hc, hp))
        hp, hc = hp[order], hc[order]
        new = np.ones(len(hp), bool)
        new[1:] = (hp[1:] != hp[:-1]) | (hc[1:] != hc[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(hp)))
        return pa.table(
            {"hp": pa.array(hp[starts]), "hc": pa.array(hc[starts]),
             "cb": pa.array(lens.astype(np.int64))}
        )

    bcnt = grouped_reduce(
        big.map_batches(bones, batch_format="pyarrow", zero_copy_batch=True),
        ["hp", "hc"], sum_col="cb", num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("hp", pa.uint64()), ("hc", pa.uint64()), ("cb", pa.int64())]
        ),
    )

    j1 = bucket_join(big, bcnt, on=["hp", "hc"], num_partitions=num_partitions)
    j2 = bucket_join(j1, uni, on="hp", right_on="h", num_partitions=num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64()),
                 "total_bits": pa.array([], pa.int64())}
            )
        cb = batch["cb"].to_numpy()
        cp = batch["c"].to_numpy()
        bits = _bitlength(cp + vocab_v) - _bitlength(cb + 1)
        doc = batch["doc_id"].to_numpy()
        uq, inv = np.unique(doc, return_inverse=True)
        return pa.table(
            {"doc_id": pa.array(uq, type=pa.int64()),
             "n_bigrams": pa.array(np.bincount(inv).astype(np.int64)),
             "total_bits": pa.array(
                 np.bincount(inv, weights=bits).astype(np.int64))}
        )

    agg = grouped_reduce(
        j2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"], agg_cols={"n_bigrams": "sum", "total_bits": "sum"},
        num_partitions=num_partitions,
        empty_schema=RESULT_SCHEMA,
    )
    universe = docs.select_columns([id_col])
    out = bucket_join(
        universe, agg, on=id_col, right_on="doc_id", how="left",
        num_partitions=num_partitions,
    )

    def fin(batch: pa.Table) -> pa.Table:
        # fill nulls in Arrow: a pandas fillna chain coerces the nullable
        # int64 column through float64 and silently rounds sums > 2^53
        import pyarrow.compute as pc

        nb = pc.fill_null(batch["n_bigrams"], 0).combine_chunks().to_numpy()
        tb = pc.fill_null(batch["total_bits"], 0).combine_chunks().to_numpy()
        return pa.table(
            {"doc_id": batch[id_col], "n_bigrams": pa.array(nb),
             "total_bits": pa.array(tb)},
            schema=RESULT_SCHEMA,
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def kn_surprisal(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> Dataset:
    """Interpolated Kneser–Ney bigram surprisal (Kneser & Ney, ICASSP
    1995; the KenLM default that CCNet's perplexity filter actually
    runs) — same (doc_id, n_bigrams, total_bits) shape and ±1-bit
    integer contract as ``bigram_surprisal``, but with the KN
    probability. With discount d = 3/4 the KN mass folds into one exact
    rational (multiply through by 4·c(v)·B):

        P_KN(w|v) = max(c(vw) − 3/4, 0)/c(v)
                    + (3/4)·N1+(v·)/c(v) · N1+(·w)/B
                  = (max(4·c(vw) − 3, 0)·B + 3·N1+(v·)·N1+(·w))
                    / (4·c(v)·B)
        bits      = bitlen(4·c(v)·B) − bitlen(numerator)

    where c(v) = Σ_w c(vw) (the true KN context total, NOT the unigram
    count), N1+(v·)/N1+(·w) are distinct right/left continuation counts
    and B = distinct bigram types — all integers, so the sum is
    order-free and the DuckDB oracle replays it bit-exactly. Numerator
    ≥ B + 3 > 0 whenever the bigram occurs; bitlen arguments are exact
    below 2^53 (guarded: 4·c(v)·B).

    Scale shape: the bigram-type table is built once (block-local
    combine + one keyed reduce); context totals, right-continuations
    (one reduce over types keyed by hp) and left-continuations (one
    keyed by hc) are vocabulary-sized; scoring joins each occurrence to
    its three count rows with bucketed storage joins. Driver scalar: B."""
    from graphx_ray.stages.derive import grouped_reduce
    from graphx_ray.stages.motif import bucket_join

    def bigrams(batch: pa.Table) -> pa.Table:
        h, docidx = _explode_hashes(batch, text_col)
        if h is None or len(h) < 2:
            return _BIGRAM_SCHEMA.empty_table()
        same = docidx[1:] == docidx[:-1]
        ids = batch[id_col].to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids[docidx[1:][same]], type=pa.int64()),
             "hp": pa.array(h[:-1][same]),
             "hc": pa.array(h[1:][same])},
            schema=_BIGRAM_SCHEMA,
        )

    big = docs.map_batches(bigrams, batch_format="pyarrow", zero_copy_batch=True)

    def bones(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"hp": pa.array([], pa.uint64()), "hc": pa.array([], pa.uint64()),
                 "cb": pa.array([], pa.int64())}
            )
        hp = b["hp"].to_numpy()
        hc = b["hc"].to_numpy()
        order = np.lexsort((hc, hp))
        hp, hc = hp[order], hc[order]
        new = np.ones(len(hp), bool)
        new[1:] = (hp[1:] != hp[:-1]) | (hc[1:] != hc[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(hp)))
        return pa.table(
            {"hp": pa.array(hp[starts]), "hc": pa.array(hc[starts]),
             "cb": pa.array(lens.astype(np.int64))}
        )

    bcnt = grouped_reduce(
        big.map_batches(bones, batch_format="pyarrow", zero_copy_batch=True),
        ["hp", "hc"], sum_col="cb", num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("hp", pa.uint64()), ("hc", pa.uint64()), ("cb", pa.int64())]
        ),
    )
    n_types = int(bcnt.count())  # B — the only driver scalar
    if n_types == 0:
        import ray.data as rd

        universe = docs.select_columns([id_col])
        return universe.map_batches(
            lambda b: pa.table(
                {"doc_id": b[id_col],
                 "n_bigrams": pa.array(np.zeros(b.num_rows, np.int64)),
                 "total_bits": pa.array(np.zeros(b.num_rows, np.int64))},
                schema=RESULT_SCHEMA,
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def ctx(b: pa.Table) -> pa.Table:
        return pa.table(
            {"hp": b["hp"], "c": b["cb"],
             "n1p": pa.array(np.ones(b.num_rows, np.int64))}
        )

    cv = grouped_reduce(
        bcnt.map_batches(ctx, batch_format="pyarrow", zero_copy_batch=True),
        ["hp"], agg_cols={"c": "sum", "n1p": "sum"},
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("hp", pa.uint64()), ("c", pa.int64()), ("n1p", pa.int64())]
        ),
    )

    def left(b: pa.Table) -> pa.Table:
        return pa.table(
            {"hc": b["hc"], "nl": pa.array(np.ones(b.num_rows, np.int64))}
        )

    nl = grouped_reduce(
        bcnt.map_batches(left, batch_format="pyarrow", zero_copy_batch=True),
        ["hc"], sum_col="nl", num_partitions=num_partitions,
        empty_schema=pa.schema([("hc", pa.uint64()), ("nl", pa.int64())]),
    )

    j1 = bucket_join(big, bcnt, on=["hp", "hc"], num_partitions=num_partitions)
    j2 = bucket_join(j1, cv, on="hp", num_partitions=num_partitions)
    j3 = bucket_join(j2, nl, on="hc", num_partitions=num_partitions)
    B = n_types

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64()),
                 "total_bits": pa.array([], pa.int64())}
            )
        cb = batch["cb"].to_numpy()
        c = batch["c"].to_numpy()
        n1p = batch["n1p"].to_numpy()
        nlv = batch["nl"].to_numpy()
        den = 4 * c * B
        if den.max(initial=0) >= 1 << 53:
            raise OverflowError(
                "kn_surprisal: 4·c(v)·B exceeds the exact bitlen range"
            )
        num = np.maximum(4 * cb - 3, 0) * B + 3 * n1p * nlv
        bits = _bitlength(den) - _bitlength(num)
        doc = batch["doc_id"].to_numpy()
        uq, inv = np.unique(doc, return_inverse=True)
        return pa.table(
            {"doc_id": pa.array(uq, type=pa.int64()),
             "n_bigrams": pa.array(np.bincount(inv).astype(np.int64)),
             "total_bits": pa.array(
                 np.bincount(inv, weights=bits).astype(np.int64))}
        )

    agg = grouped_reduce(
        j3.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"], agg_cols={"n_bigrams": "sum", "total_bits": "sum"},
        num_partitions=num_partitions,
        empty_schema=RESULT_SCHEMA,
    )
    universe = docs.select_columns([id_col])
    out = bucket_join(
        universe, agg, on=id_col, right_on="doc_id", how="left",
        num_partitions=num_partitions,
    )

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nb = pc.fill_null(batch["n_bigrams"], 0).combine_chunks().to_numpy()
        tb = pc.fill_null(batch["total_bits"], 0).combine_chunks().to_numpy()
        return pa.table(
            {"doc_id": batch[id_col], "n_bigrams": pa.array(nb),
             "total_bits": pa.array(tb)},
            schema=RESULT_SCHEMA,
        )

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
