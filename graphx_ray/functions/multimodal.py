"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The decode libraries (Pillow/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are stubbed behind ``DecodeUnavailable`` /
deterministic fakes — but the Ray-side plumbing is real and tested: schema,
actor-pool signature, small-batch sizing for wide binary rows, and output
layout are exactly what a production decode stage needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real-decode paths: codec libraries absent in this environment."""


def synth_media(n: int, *, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic fake media table (for tests/benches of the plumbing)."""
    rng = np.random.default_rng([seed, hash(kind) & 0x7FFFFFFF])
    sizes = rng.integers(512, 4096, n)
    payloads = [rng.bytes(int(s)) for s in sizes]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([f"{kind}/fake"] * n),
            "width": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
            "height": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
            "duration_ms": pa.array(np.full(n, -1, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageFeatureExtractor:
    """Actor-pool stage shape for decode → feature-extract.

    ``fake=True`` computes a deterministic digest-based feature vector from
    the bytes (real plumbing, fake math). ``fake=False`` raises
    DecodeUnavailable where Pillow would be called."""

    def __init__(self, dim: int = 8, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise DecodeUnavailable("image decode requires Pillow; not in this container")
        # zero-copy over the Arrow binary buffers: per-row array_split
        # boundaries computed by broadcasting, chunk sums via one cumsum —
        # no per-payload Python loop
        arr = batch["payload"].combine_chunks()
        n = len(arr)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=n + 1).astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
        L = offs[1:] - offs[:-1]  # payload length per row
        k = np.arange(self.dim)
        # np.array_split boundaries: chunk k starts at k·(L//dim) + min(k, L%dim)
        starts = offs[:-1, None] + k[None, :] * (L[:, None] // self.dim) + np.minimum(
            k[None, :], L[:, None] % self.dim
        )
        bounds = np.concatenate([starts, offs[1:, None]], axis=1)  # (n, dim+1)
        cs = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
        sums = cs[bounds[:, 1:]] - cs[bounds[:, :-1]]
        sizes = bounds[:, 1:] - bounds[:, :-1]
        feats = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0).astype(np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.array(list(feats), type=pa.list_(pa.float32())),
            }
        )


def extract_features(
    media: Dataset, *, dim: int = 8, concurrency: int = 2, batch_size: int = 64
) -> Dataset:
    """Feature extraction over binary rows. NOTE the small batch_size:
    batch bytes × concurrency must fit worker heaps for wide binary
    payloads — this is the knob, not block size."""
    return media.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": dim, "fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,  # fractional: a full-CPU pool can starve the upstream read tasks (deadlock on small nodes)
    )


def frame_sample_plan(media: Dataset, *, every_ms: int = 1000) -> Dataset:
    """Video frame-sampling plan (timestamps only — decode stubbed):
    one output row per planned frame, demonstrating flat-map expansion
    of media rows without materializing frames."""

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy()
        dur = batch["duration_ms"].to_numpy()
        n_frames = np.maximum(dur, 0) // every_ms
        rep = np.repeat(np.arange(len(ids)), n_frames)
        offs = np.arange(int(n_frames.sum())) - np.repeat(
            np.cumsum(n_frames) - n_frames, n_frames
        )
        return pa.table(
            {
                "media_id": pa.array(ids[rep], type=pa.int64()),
                "frame_ms": pa.array((offs * every_ms).astype(np.int64)),
            }
        )

    return media.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)
