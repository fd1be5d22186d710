"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All follow the partial/combiner discipline: per-batch vectorized sketching
inside ``map_batches``, then ONE small groupby over sketch keys — never an
all-pairs comparison over raw text. Candidate verification and the final
keep/drop decision stay distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from graphx_ray.context import ensure_hash_shuffle
from graphx_ray.functions.text import fingerprint_batch

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------- exact


def exact_dedup(docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Keep the smallest id per distinct (normalized) text.

    hash-partition by 64-bit fingerprint + groupby-min — the scalable exact
    dedup (collision probability is the 64-bit birthday bound; SURVEY.md
    §7.4 records the audit/fallback)."""
    ensure_hash_shuffle(docs)
    fp = docs.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col).select(["fingerprint", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    keep = fp.groupby("fingerprint").aggregate(Min(id_col, alias_name=id_col))
    return keep.select_columns([id_col])


# ----------------------------------------------------------------- shingles


def _shingle_hashes(texts: pd.Series, k: int = 3) -> list[np.ndarray]:
    """Per-doc uint64 hashes of k-word shingles (vectorized per batch)."""
    toks = texts.fillna("").str.lower().str.split()
    out = []
    for words in toks:
        n = len(words)
        if n < k:
            sh = [" ".join(words)] if words else []
        else:
            sh = [" ".join(words[i : i + k]) for i in range(n - k + 1)]
        if sh:
            h = pd.util.hash_array(np.asarray(sh, dtype=object), categorize=False)
            out.append(np.unique(h))
        else:
            out.append(np.empty(0, np.uint64))
    return out


def _minhash_sig(shingles: list[np.ndarray], num_perm: int, seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures via universal hashing
    a·x+b mod p — one matrix op per document."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    sig = np.full((len(shingles), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, sh in enumerate(shingles):
        if len(sh) == 0:
            continue
        # (num_perm, n_shingles) — vectorized; python-int modmul avoids overflow
        vals = (a[:, None].astype(object) * sh[None, :].astype(object) + b[:, None]) % _MERSENNE
        sig[i] = np.min(vals.astype(np.uint64), axis=1)
    return sig


class MinHasher:
    """Actor-pool stage: doc → (band_id, band_hash) rows for LSH bucketing."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas()
        ids = batch[self.id_col].to_numpy()
        sig = _minhash_sig(_shingle_hashes(texts, self.k), self.num_perm)
        n = len(ids)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int64), n)
        doc_ids = np.repeat(ids, self.bands)
        bh = np.empty(n * self.bands, dtype=np.uint64)
        for bidx in range(self.bands):
            seg = sig[:, bidx * self.rows : (bidx + 1) * self.rows]
            bh[bidx::self.bands] = pd.util.hash_array(
                np.ascontiguousarray(seg).view([("", np.uint64)] * self.rows).ravel()
            )
        return pa.table(
            {
                "band": pa.array(band_ids),
                "bucket": pa.array(bh.view(np.int64)),
                self.id_col: pa.array(doc_ids),
            }
        )


def minhash_lsh_pairs(
    docs: Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
) -> Dataset:
    """Candidate near-duplicate pairs (a < b) via MinHash banding.

    shingle → minhash → band → bucket groupby → within-bucket pairs;
    dedup across bands by a final groupby."""
    ensure_hash_shuffle(docs)
    bucketed = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "k": k,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=2048,
        num_cpus=0.5,  # fractional: a full-CPU pool can starve the upstream read tasks (deadlock on small nodes)
    )

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        # one block may hold many (band, bucket) groups after the shuffle
        band = batch["band"].to_numpy()
        bucket = batch["bucket"].to_numpy()
        order = np.lexsort((batch[id_col].to_numpy(), bucket, band))
        band, bucket = band[order], bucket[order]
        ids = batch[id_col].to_numpy()[order]
        n = len(ids)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        new = np.empty(n, bool)
        new[0] = True
        np.not_equal(band[1:], band[:-1], out=new[1:])
        nb = np.empty(n, bool)
        nb[0] = True
        np.not_equal(bucket[1:], bucket[:-1], out=nb[1:])
        seg = new | nb
        starts = np.flatnonzero(seg)
        lens = np.diff(np.append(starts, n))
        run_end = np.repeat(starts + lens, lens)
        idx = np.arange(n)
        per = run_end - idx - 1
        total = int(per.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ii = np.repeat(idx, per)
        offs = np.cumsum(per) - per
        jj = ii + 1 + (np.arange(total) - offs[ii])
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        keep = a != b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    cand = (
        bucketed.repartition(max(2, concurrency), keys=["band", "bucket"])
        .map_batches(pairs_of_group, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    return cand


def verify_jaccard(
    pairs: Dataset, docs: Dataset, *, threshold: float = 0.7, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> Dataset:
    """Exact shingle-Jaccard verification of candidate pairs.

    The doc → shingle-set map is broadcast via ``ray.put`` (small side);
    candidates stream through map_batches."""
    import ray

    df = docs.select_columns([id_col, text_col]).to_pandas()
    sh = dict(zip(df[id_col].to_numpy(), _shingle_hashes(df[text_col], k)))
    ref = ray.put(sh)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        jac = np.empty(len(a))
        for i in range(len(a)):
            sa, sb = table.get(a[i]), table.get(b[i])
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                jac[i] = 0.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        out = batch.append_column("jaccard", pa.array(jac))
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(
    docs: Dataset,
    *,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """EXACT all-pairs k-word-shingle Jaccard ≥ threshold (SQL-oracle
    comparable): docs with ≥ k words; shingles distinct; normalization =
    trim + lower + whitespace split.

    Distributed: explode (shingle-hash, doc) rows → hash-partition by
    shingle → within-shingle pairs → one groupby counts intersections;
    set sizes are broadcast (one int per doc). A shingle shared by s docs
    costs s²/2 pair rows — hot-shingle cost is the documented bound."""
    import ray

    ensure_hash_shuffle(docs)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().fillna("")
        ids = batch[id_col].to_numpy()
        toks = s.str.strip().str.lower().str.split()
        out_id, out_h = [], []
        for i, words in enumerate(toks):
            if words is None or len(words) < k:
                continue
            sh = {" ".join(words[j : j + k]) for j in range(len(words) - k + 1)}
            h = pd.util.hash_array(np.asarray(sorted(sh), dtype=object), categorize=False)
            out_id.append(np.full(len(h), ids[i], np.int64))
            out_h.append(h.view(np.int64))
        if not out_id:
            return pa.table({"h": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())})
        return pa.table(
            {"h": pa.array(np.concatenate(out_h)), id_col: pa.array(np.concatenate(out_id))}
        )

    sh = docs.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    sizes = sh.groupby(id_col).aggregate(Count(alias_name="n")).to_pandas()
    size_ids = np.sort(sizes[id_col].to_numpy())
    size_vals = sizes.set_index(id_col)["n"].loc[size_ids].to_numpy(dtype=np.int64)
    sid_ref = ray.put(size_ids)
    sval_ref = ray.put(size_vals)

    def pairs(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy()
        d = batch[id_col].to_numpy()
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        n = len(h)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        new = np.empty(n, bool)
        new[0] = True
        np.not_equal(h[1:], h[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        run_end = np.repeat(starts + lens, lens)
        idx = np.arange(n)
        per = run_end - idx - 1
        total = int(per.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ii = np.repeat(idx, per)
        offs = np.cumsum(per) - per
        jj = ii + 1 + (np.arange(total) - offs[ii])
        return pa.table({"a": pa.array(d[ii]), "b": pa.array(d[jj])})

    inter = (
        sh.repartition(num_partitions, keys=["h"])
        .map_batches(pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="i"))
    )

    def jfilter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids = _ray.get(sid_ref)
        vals = _ray.get(sval_ref)
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        i = batch["i"].to_numpy().astype(np.float64)
        na = vals[np.searchsorted(ids, a)]
        nb = vals[np.searchsorted(ids, b)]
        jac = i / (na + nb - i)
        keep = jac >= threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return inter.map_batches(jfilter, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ simhash


class SimHasher:
    """64-bit SimHash over word-unigram hashes; near-dups = small Hamming
    distance. Emits (doc_id, simhash, band keys) for banded blocking."""

    def __init__(self, bands: int = 4, id_col: str = "doc_id", text_col: str = "text"):
        self.bands = bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas().fillna("").str.lower().str.split()
        ids = batch[self.id_col].to_numpy()
        sims = np.zeros(len(ids), np.uint64)
        for i, words in enumerate(texts):
            if not words:
                continue
            h = pd.util.hash_array(np.asarray(words, dtype=object), categorize=False)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            vote = bits.sum(axis=0) * 2 - len(h)
            powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
            sims[i] = np.sum(np.where(vote > 0, powers, np.uint64(0)), dtype=np.uint64)
        out = {self.id_col: pa.array(ids), "simhash": pa.array(sims.view(np.int64))}
        width = 64 // self.bands
        for bidx in range(self.bands):
            seg = (sims >> np.uint64(bidx * width)) & np.uint64((1 << width) - 1)
            out[f"band{bidx}"] = pa.array(seg.view(np.int64))
        return pa.table(out)


def simhash_signatures(docs: Dataset, *, bands: int = 4, concurrency: int = 4,
                       id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    return docs.map_batches(
        SimHasher,
        fn_constructor_kwargs={"bands": bands, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=2048,
        num_cpus=0.5,  # fractional: a full-CPU pool can starve the upstream read tasks (deadlock on small nodes)
    )


def simhash_pairs(docs: Dataset, *, max_hamming: int = 3, bands: int = 4,
                  concurrency: int = 4, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via band blocking
    (a pair within distance d < bands shares ≥1 exact band — pigeonhole)."""
    sigs = simhash_signatures(
        docs, bands=bands, concurrency=concurrency, id_col=id_col, text_col=text_col
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sim = batch["simhash"].to_numpy()
        bcols = [batch[f"band{i}"].to_numpy() for i in range(bands)]
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
                "bucket": pa.array(np.concatenate(bcols)),
                id_col: pa.array(np.tile(ids, bands)),
                "simhash": pa.array(np.tile(sim, bands)),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy()
        bucket = batch["bucket"].to_numpy()
        ids = batch[id_col].to_numpy()
        sim = batch["simhash"].to_numpy().view(np.uint64)
        order = np.lexsort((ids, bucket, band))
        band, bucket, ids, sim = band[order], bucket[order], ids[order], sim[order]
        n = len(ids)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        seg = np.empty(n, bool)
        seg[0] = True
        seg[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(seg)
        lens = np.diff(np.append(starts, n))
        run_end = np.repeat(starts + lens, lens)
        idx = np.arange(n)
        per = run_end - idx - 1
        total = int(per.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ii = np.repeat(idx, per)
        offs = np.cumsum(per) - per
        jj = ii + 1 + (np.arange(total) - offs[ii])
        x = sim[ii] ^ sim[jj]
        ham = np.zeros(total, np.int64)
        while x.any():
            ham += (x & 1).astype(np.int64)
            x >>= np.uint64(1)
        keep = (ham <= max_hamming) & (ids[ii] != ids[jj])
        a = np.minimum(ids[ii][keep], ids[jj][keep])
        b = np.maximum(ids[ii][keep], ids[jj][keep])
        return pa.table({"a": pa.array(a), "b": pa.array(b), "hamming": pa.array(ham[keep])})

    from ray.data.aggregate import Min as MinAgg

    return (
        rows.repartition(max(2, concurrency), keys=["band", "bucket"])
        .map_batches(pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(MinAgg("hamming", alias_name="hamming"))
    )
