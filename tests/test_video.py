"""GXV1 video container round trip + frame-sampled decode stage."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data as rd

from graphx_ray.functions.multimodal import (
    DecodeUnavailable,
    decode_video,
    decode_video_features,
    encode_video,
)


def test_video_roundtrip():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (12, 9, 3)).astype(np.uint8) for _ in range(5)]
    payload = encode_video(frames, fps=24)
    back, fps = decode_video(payload)
    assert fps == 24 and len(back) == 5
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(DecodeUnavailable):
        decode_video(b"\x00\x01\x02\x03rubbish")


def test_frame_sampling_stage(ray_session):
    rng = np.random.default_rng(4)
    rows = []
    want = {}
    for mid in range(6):
        frames = [rng.integers(0, 256, (8, 8, 3)).astype(np.uint8) for _ in range(4)]
        rows.append({"media_id": mid, "payload": encode_video(frames)})
        for k in (0, 3):  # every_n=3 -> frames 0, 3
            luma = (frames[k].astype(np.int64) @ np.array([299, 587, 114])).sum()
            want[(mid, k)] = (luma / 64) / 1000.0
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([r["media_id"] for r in rows], type=pa.int64()),
                "payload": pa.array([r["payload"] for r in rows], type=pa.binary()),
            }
        )
    )
    got = decode_video_features(ds, every_n=3, concurrency=2).to_pandas()
    assert len(got) == 12
    for r in got.itertuples():
        assert want[(r.media_id, r.frame_idx)] == r.luma_mean
