"""O3 random_sample: deterministic, parallelism-invariant Bernoulli sample."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from graphx_ray.stages.derive import random_sample


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_random_sample_deterministic_and_parallelism_invariant():
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(2000), type=pa.int64()),
            "text": pa.array([f"d{i}" for i in range(2000)]),
        }
    )
    ds1 = rd.from_arrow(tbl)
    ds4 = rd.from_arrow(tbl).repartition(7)  # different block structure

    s1 = _ids(random_sample(ds1, 0.25, on="doc_id", seed=3))
    s2 = _ids(random_sample(ds1, 0.25, on="doc_id", seed=3))
    s3 = _ids(random_sample(ds4, 0.25, on="doc_id", seed=3))
    assert s1 == s2 == s3  # same seed → same rows, at any parallelism
    assert 0.15 < len(s1) / 2000 < 0.35  # Bernoulli rate in the right range

    other = _ids(random_sample(ds1, 0.25, on="doc_id", seed=4))
    assert other != s1  # different seed → different sample

    # string key column works too and is deterministic
    t1 = _ids(random_sample(ds1, 0.5, on="text", seed=0))
    t2 = _ids(random_sample(ds4, 0.5, on="text", seed=0))
    assert t1 == t2

    assert _ids(random_sample(ds1, 0.0, on="doc_id")) == []
    assert len(_ids(random_sample(ds1, 1.0, on="doc_id"))) == 2000
