"""Sequence packing (GPT-style stream chunking) for training-data prep.

Concatenate every document — in ascending ``doc_id`` order — into one
virtual token stream and cut it every ``budget`` tokens. The output is
the PACKING MANIFEST a training loader consumes: one row per
(document, sequence) overlap,

    (doc_id, seq_id, seq_off, doc_off, n_tok)

meaning tokens ``[doc_off, doc_off + n_tok)`` of the document land at
positions ``[seq_off, seq_off + n_tok)`` of sequence ``seq_id``. Long
documents span several sequences; short ones share a sequence. Every
value is an exact integer, so the whole manifest is SQL-replayable
(one window cumsum + a ``generate_series`` span expansion).

Scale shape (the distributed prefix sum): one vectorized pass over the
text computes the 16-byte/doc ``(doc_id, ntok)`` table, which is
materialized (the ONLY thing held beyond the streaming pass — 16 GB per
10⁹ docs, object-store-spillable). Monotone equal-width ranges over the
doc_id domain make range totals independent, so the only global
coordination is ``num_partitions`` per-range token totals reduced to
the driver (tiny) and re-broadcast as base offsets; each range then
sorts, prefix-sums and span-expands locally inside ``partitioned_map``
(storage-backed, one task per partition — group never splits).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graphx_ray.functions.text import token_count_batch
from graphx_ray.stages.derive import grouped_reduce, partitioned_map

PACK_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("seq_id", pa.int64()),
        pa.field("seq_off", pa.int64()),
        pa.field("doc_off", pa.int64()),
        pa.field("n_tok", pa.int64()),
    ]
)


def pack_sequences(
    docs: Dataset | None,
    *,
    budget: int,
    text_col: str = "text",
    num_partitions: int = 32,
    counts: Dataset | None = None,
) -> Dataset:
    """Pack documents into fixed-``budget`` token sequences; returns the
    manifest Dataset described in the module docstring. Tokens default to
    whitespace tokens (``token_count_batch``'s ``n_ws_tokens`` — the
    same kernel the token-count / quality queries pin in SQL); pass
    ``counts`` (a (doc_id, n_tok|ntok) Dataset, e.g. ``bpe.bpe_encode``'s
    output) to pack by REAL tokenizer counts instead — the round-5 wiring
    a trained-tokenizer pipeline needs. Zero-token documents occupy no
    stream positions and emit no rows. Deterministic in the input: the
    stream order is ascending doc_id."""
    budget = int(budget)
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be a positive token count")

    if counts is not None:
        def norm(b: pa.Table) -> pa.Table:
            col = "ntok" if "ntok" in b.column_names else "n_tok"
            return pa.table({"doc_id": b["doc_id"], "ntok": b[col]})

        counts = counts.map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        if docs is None:
            raise ValueError("pack_sequences: pass docs or counts")

        def cnt(b: pa.Table) -> pa.Table:
            t = token_count_batch(b, text_col=text_col)
            return pa.table({"doc_id": t["doc_id"], "ntok": t["n_ws_tokens"]})

        counts = docs.map_batches(
            cnt, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()  # 2 ints/doc — the prefix-sum working set
    if counts.count() == 0:
        import ray.data as rd

        return rd.from_arrow(PACK_SCHEMA.empty_table())
    mn = int(counts.min("doc_id"))
    mx = int(counts.max("doc_id"))
    r_parts = int(num_partitions)
    span = max(mx - mn + 1, 1)

    def tag(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        # equal-width ⇒ rid is monotone in doc_id, so ranges are ordered
        rid = np.minimum((d - mn) * r_parts // span, r_parts - 1)
        return b.append_column("rid", pa.array(rid.astype(np.int64)))

    tagged = counts.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tot = grouped_reduce(
        tagged, ["rid"], sum_col="ntok", num_partitions=min(r_parts, 8)
    ).to_pandas()  # ≤ num_partitions rows — the one driver touch
    totals = np.zeros(r_parts, np.int64)
    totals[tot["rid"].to_numpy()] = tot["ntok"].to_numpy()
    base = np.concatenate([np.zeros(1, np.int64), np.cumsum(totals)[:-1]])

    def expand(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return PACK_SCHEMA.empty_table()
        d = tbl["doc_id"].to_numpy()
        nt = tbl["ntok"].to_numpy()
        r = tbl["rid"].to_numpy()
        order = np.lexsort((d, r))
        d, nt, r = d[order], nt[order], r[order]
        cs = np.cumsum(nt)
        ex = cs - nt
        # local prefix within each rid run (a task may hold several rids)
        first = np.flatnonzero(np.concatenate([[True], r[1:] != r[:-1]]))
        grp_base = np.repeat(ex[first], np.diff(np.append(first, len(r))))
        g = base[r] + (ex - grp_base)  # global exclusive start offset
        keep = nt > 0
        d, nt, g = d[keep], nt[keep], g[keep]
        if not len(d):
            return PACK_SCHEMA.empty_table()
        s0 = g // budget
        s1 = (g + nt - 1) // budget
        reps = s1 - s0 + 1
        total = int(reps.sum())
        doc = np.repeat(d, reps)
        gg = np.repeat(g, reps)
        nn = np.repeat(nt, reps)
        cs2 = np.cumsum(reps)
        seq = np.repeat(s0, reps) + (
            np.arange(total, dtype=np.int64) - np.repeat(cs2 - reps, reps)
        )
        sb = seq * budget
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "seq_id": pa.array(seq),
                "seq_off": pa.array(np.maximum(gg - sb, 0)),
                "doc_off": pa.array(np.maximum(sb - gg, 0)),
                "n_tok": pa.array(
                    np.minimum(sb + budget, gg + nn) - np.maximum(sb, gg)
                ),
            }
        )

    return partitioned_map(
        tagged, ["rid"], expand,
        num_partitions=r_parts, empty_schema=PACK_SCHEMA,
    )
