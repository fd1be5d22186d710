"""Deterministic synthetic transcript generator (SURVEY.md S4, FIXTURES.md §1).

The reference generated its own synthetic catalog (N sources, zones) to test
at scale; the graft payload is multi-turn conversation transcripts with the
BASELINE.json:15 schema. Generation is sharded and seeded per shard with
``default_rng([seed, shard_id])`` so the output is bit-identical regardless
of parallelism, and scales by adding shards (each shard is one Ray task).

Zone occupancy (hour buckets of conversation start) is Zipf-skewed to
exercise the hub/skew paths (salted splitting, zone-join bounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from graphx_ray import schemas

EPOCH_2026_US = 1_767_225_600 * 1_000_000  # 2026-01-01T00:00:00Z in µs

ROLES_BASE = ("user", "assistant")
ROLE_INSERTS = ("system", "tool")
TOOLS = ("search", "python", "browser", "sql", "shell", "calc", "files", "mail")

_VOCAB = np.array(
    "the quick brown fox jumps over lazy dog while agent tools run "
    "query graph zone link rank label component triangle stream batch "
    "shuffle arrow block actor ray data parquet checkpoint resume".split(),
    dtype=object,
)
_EMOJI = np.array(["", " 🙂", " 🚀", "\nmore detail follows.", " — ok.", ""], dtype=object)


def gen_transcript_shard(
    shard_id: int,
    n_convs: int,
    conv_id_start: int,
    *,
    seed: int = 42,
    n_hours: int = 168,
    p_tool: float = 0.25,
) -> pa.Table:
    """One shard of transcripts as an Arrow table (schemas.TRANSCRIPTS)."""
    rng = np.random.default_rng([seed, shard_id])
    n_turns = np.clip(2 + rng.poisson(6, n_convs), 2, 40)
    total = int(n_turns.sum())

    conv_nums = np.arange(conv_id_start, conv_id_start + n_convs, dtype=np.int64)
    conv_ids = pd.Series(conv_nums).map("c{:08d}".format).to_numpy(dtype=object)

    starts = np.cumsum(n_turns) - n_turns  # first row index of each conv
    conv_rep = np.repeat(np.arange(n_convs), n_turns)
    turn_idx = (np.arange(total) - np.repeat(starts, n_turns)).astype(np.int32)

    # Roles: alternate user/assistant, 10 % replaced by system/tool inserts.
    roles = np.where(turn_idx % 2 == 0, ROLES_BASE[0], ROLES_BASE[1]).astype(object)
    ins_mask = rng.random(total) < 0.10
    roles[ins_mask] = np.array(ROLE_INSERTS, dtype=object)[
        rng.integers(0, len(ROLE_INSERTS), int(ins_mask.sum()))
    ]

    # Tool column: non-null with p_tool ⇒ a conv→tool edge downstream.
    tool_mask = rng.random(total) < p_tool
    tools = np.full(total, None, dtype=object)
    tools[tool_mask] = np.array(TOOLS, dtype=object)[
        rng.integers(0, len(TOOLS), int(tool_mask.sum()))
    ]

    # Conversation start hour: Zipf-skewed bucket occupancy (hub zones).
    hour = (rng.zipf(1.5, n_convs) - 1) % n_hours
    start_us = (
        EPOCH_2026_US
        + hour.astype(np.int64) * 3_600_000_000
        + rng.integers(0, 3_600_000_000, n_convs)
    )
    gaps_us = rng.integers(1_000_000, 60_000_000, total)  # 1..60 s per turn
    cs = np.cumsum(gaps_us)
    within = cs - np.repeat(cs[starts] - gaps_us[starts], n_turns)
    ts_us = start_us[conv_rep] + within  # strictly increasing within conv

    # Text: pure function of (conv_id, turn_idx); includes newlines/emoji so
    # the byte-equality-through-shuffles invariant is non-trivial.
    mix = conv_nums[conv_rep] * 31 + turn_idx
    w1 = _VOCAB[mix % len(_VOCAB)]
    w2 = _VOCAB[(mix // 7 + 3) % len(_VOCAB)]
    w3 = _VOCAB[(mix // 13 + 11) % len(_VOCAB)]
    tail = _EMOJI[mix % len(_EMOJI)]
    text = (
        "turn " + pd.Series(turn_idx).astype(str) + " of " + pd.Series(conv_ids[conv_rep])
        + ": " + pd.Series(w1) + " " + pd.Series(w2) + " " + pd.Series(w3)
        + pd.Series(tail)
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_rep], type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(text.to_numpy(dtype=object), type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        },
        schema=schemas.TRANSCRIPTS,
    )


def gen_transcripts_local(n_convs: int, *, seed: int = 42, n_hours: int = 168) -> pa.Table:
    """Single-process generation (tests / tiny scales)."""
    return gen_transcript_shard(0, n_convs, 0, seed=seed, n_hours=n_hours)


def transcripts_dataset(
    n_convs: int,
    *,
    seed: int = 42,
    n_hours: int = 168,
    shard_convs: int = 50_000,
):
    """Distributed generation as a lazy ray.data.Dataset (one task per shard)."""
    import ray.data as rd

    shards = []
    start = 0
    sid = 0
    while start < n_convs:
        n = min(shard_convs, n_convs - start)
        shards.append({"shard_id": sid, "n_convs": n, "conv_id_start": start})
        start += n
        sid += 1

    def _gen(batch: pa.Table) -> pa.Table:
        out = [
            gen_transcript_shard(
                int(batch["shard_id"][i].as_py()),
                int(batch["n_convs"][i].as_py()),
                int(batch["conv_id_start"][i].as_py()),
                seed=seed,
                n_hours=n_hours,
            )
            for i in range(batch.num_rows)
        ]
        return pa.concat_tables(out)

    return rd.from_items(shards).map_batches(_gen, batch_size=1, batch_format="pyarrow")


def write_transcripts(path: str, n_convs: int, **kw) -> None:
    transcripts_dataset(n_convs, **kw).write_parquet(path)
